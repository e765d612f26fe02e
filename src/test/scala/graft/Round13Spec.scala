package graft

import org.apache.spark.sql.functions._

/** Round-13 pins: host-calibration kernel determinism, the median-over-valid
  * noise-gate fix, the x68b shuffle-verify fallback, and the de-vacuumed
  * x72b SNM recall audit.
  */
class Round13Spec extends SparkSpec {

  test("HostCal: kernel work is checksum-pinned and deterministic") {
    val (s1, c1) = HostCal.run()
    val (s2, c2) = HostCal.run()
    // the checksum is input-determined: a buffer-init or loop-shape change
    // would alter the WORK the timing claims to measure
    assert(c1 == HostCal.Checksum, s"kernel checksum drifted: $c1")
    assert(c2 == HostCal.Checksum)
    assert(s1 > 0 && s2 > 0)
    assert(HostCal.NominalSec > 0)
  }

  test("bench median excludes failure sentinels (r12 ADVICE escape case)") {
    import BenchGate._
    // 2 sentinels of 5: the raw-sorted median sat at the fastest valid
    // sample (2.0), med/min == 1, and this genuinely noisy key escaped the
    // flag; the valid-only median (30.0) catches it
    val escaped = Seq(-1.0, -1.0, 2.0, 30.0, 40.0)
    assert(math.abs(median(escaped) - 30.0) < 1e-9)
    assert(stillNoisy(escaped))
    // all-sentinel key: median is the failure sentinel, never a crash
    assert(median(Seq(-1.0, -1.0, -1.0)) == -1.0)
    // no sentinels: unchanged semantics
    assert(math.abs(median(Seq(2.0, 50.0, 2.1, 2.0, 2.05)) - 2.05) < 1e-9)
  }
}
