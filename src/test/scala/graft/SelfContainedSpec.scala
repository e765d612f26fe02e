package graft

import org.scalatest.funsuite.AnyFunSuite

/** Every declared key must be SELF-CONTAINED: buildable and analyzable on
  * a fresh session whose temp-function registry contains nothing any
  * OTHER key registered. The bug class this pins: a builder that uses a
  * `graft_*` SQL function without registering it works in Verify (all
  * keys share one session, an earlier key registered it) but breaks under
  * `SPARK_GRAFT_ONLY` bench subsets, isolated specs, and any library user
  * who calls one query — exactly how r15's winnow-pairs streaming spec
  * exposed shingleVerifyPairs relying on registration order. Analysis
  * (not execution) is the right depth: UNRESOLVED_ROUTINE is an analysis
  * error, and analyzing all keys stays cheap.
  */
class SelfContainedSpec extends AnyFunSuite {
  test("every declared key analyzes on a fresh session (no registration-order deps)") {
    val d = TestSpark.sf0001
    val bad = scala.collection.mutable.ArrayBuffer[String]()
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      // newSession(): isolated SQLConf, temp views, and function registry;
      // shared SparkContext — the cheapest honest "fresh caller"
      val s2 = TestSpark.spark.newSession()
      try {
        fn(s2, d).queryExecution.analyzed
        ()
      } catch {
        case e: Throwable =>
          bad += s"$name: ${e.getClass.getSimpleName} " +
            Option(e.getMessage).getOrElse("").linesIterator.take(1).mkString
      }
    }
    assert(bad.isEmpty, s"${bad.size} keys not self-contained:\n${bad.mkString("\n")}")
  }
}
