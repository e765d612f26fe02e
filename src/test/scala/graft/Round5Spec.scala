package graft

import graft.TestSpark._
import org.apache.spark.sql.functions._

/** Round-5 additions: conf-driven checkpoint relocation (cluster
  * portability for the x15 loop family), spill-probe fingerprint parity
  * (memory-pressure runs must be bit-identical to unpressured ones), and
  * the q2g group-cardinality invariant.
  */
class Round5Spec extends SparkSpec {

  test("spark.graft.checkpointDir is honored by the connected-components loop") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_ckpt_spec").toFile
    try {
      spark.conf.set("spark.graft.checkpointDir", tmp.getPath)
      val relocated = SparkEntry.queries("x15_dedup_clusters")(spark, sf0001)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      val hops = Option(tmp.listFiles()).toSeq.flatten.map(_.getName)
      assert(hops.exists(_.startsWith("graft_x15_")),
        s"no checkpoint landed under the configured dir; saw: $hops")
      spark.conf.unset("spark.graft.checkpointDir")
      val default = SparkEntry.queries("x15_dedup_clusters")(spark, sf0001)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      assert(relocated === default,
        "checkpoint relocation changed the cluster labels")
    } finally {
      spark.conf.unset("spark.graft.checkpointDir")
      def rm(f: java.io.File): Unit = if (f.exists()) {
        if (f.isDirectory) Option(f.listFiles()).toSeq.flatten.foreach(rm)
        f.delete()
      }
      rm(tmp)
    }
  }

  test("spill probe: pressured-run fingerprints match an unpressured session; spill was real") {
    // docs/spill_probe.json is written by `ScaleProbe spill` under a
    // starved memory pool — the authoritative heap / memory-fraction for
    // that run are the json's own `heap` and `memory_fraction` fields;
    // this spec recomputes each key's order-independent result
    // fingerprint on the NORMAL test session and asserts bit-equality —
    // spilling must never change results — plus that the probe really
    // did spill (the graceful-degradation axis a 100 TB run lives on).
    val f = new java.io.File("docs/spill_probe.json")
    assume(f.exists(), "docs/spill_probe.json missing — run ScaleProbe spill")
    val json = new String(java.nio.file.Files.readAllBytes(f.toPath))
    val stampRe = """"lineitem_stamp":"([^"]+)"""".r
    val stamp = stampRe.findFirstMatchIn(json).map(_.group(1)).getOrElse("?")
    val current = ScaleProbe.contentStamp(new java.io.File(s"$sf01/lineitem.parquet"))
    assume(stamp == current,
      "testdata regenerated since the spill probe ran — re-run ScaleProbe spill")
    val entryRe =
      """"([a-z0-9_]+)":\{"mem_spill_mb":([\d.]+),"disk_spill_mb":([\d.]+),"secs":[\d.]+,"fingerprint":(-?\d+)\}""".r
    val entries = entryRe.findAllMatchIn(json)
      .map(m => (m.group(1), m.group(2).toDouble, m.group(3).toDouble, m.group(4).toLong))
      .toSeq
    assert(entries.size >= 4, s"expected >=4 probe entries, parsed ${entries.size}")
    assert(entries.forall(_._2 > 0), s"a probed key recorded zero memory spill: $entries")
    assert(entries.forall(_._3 > 0), s"a probed key recorded zero disk spill: $entries")
    for ((key, _, _, probeFp) <- entries) {
      val df = SparkEntry.queries(key)(spark, sf01)
      val h = df.withColumn("__fp", xxhash64(struct(df.columns.toIndexedSeq.map(col): _*)))
        .agg(expr("bit_xor(__fp)")).first()
      val fp = if (h.isNullAt(0)) 0L else h.getLong(0)
      assert(fp === probeFp,
        s"$key: pressured fingerprint $probeFp != unpressured $fp — spill changed the result")
    }
  }

  test("w5: the RANGE frame equals the explicit trailing-hour self-join") {
    val w5 = SparkEntry.queries("w5_range_frame")(spark, sf0001).cache()
    val ev = Tables.events(spark, sf0001)
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("us"))
      .cache()
    // frame semantics spelled out the long way: for each event, every
    // same-user event with us in [us - 1h, us] — including peers at the
    // same timestamp, which RANGE (unlike ROWS) must include
    val joined = ev.as("a").join(ev.as("b"),
        col("a.user_id") === col("b.user_id") &&
          col("b.us") >= col("a.us") - lit(3600000000L) &&
          col("b.us") <= col("a.us"))
      .groupBy(col("a.event_id").as("event_id"))
      .agg(count(lit(1)).as("cnt"))
    val bad = w5.join(joined, "event_id")
      .filter(col("hour_cnt") =!= col("cnt"))
    assert(bad.count() === 0L, "RANGE frame count disagrees with the self-join")
    assert(w5.filter(col("hour_cnt") < 1).count() === 0L) // frame includes self
    ev.unpersist(); w5.unpersist()
  }

  test("a8: multi-distinct counts match independently computed distincts") {
    val a8 = SparkEntry.queries("a8_multi_distinct")(spark, sf0001).collect()
    val orders = Tables.orders(spark, sf0001).cache()
    for (r <- a8) {
      val status = r.getString(0)
      val slice = orders.filter(col("o_orderstatus") === status)
      assert(r.getLong(1) === slice.select("o_custkey").distinct().count(),
        s"$status n_custs")
      assert(r.getLong(2) === slice.select("o_orderpriority").distinct().count(),
        s"$status n_prios")
      assert(r.getLong(3) === slice.count(), s"$status n_orders")
    }
    orders.unpersist()
  }

  test("m7: resize geometry is consistent with m3's full decode") {
    val full = SparkEntry.queries("m3_image_decode")(spark, sf0001)
      .select(col("doc_id"), col("img_h"), col("channel_sum"), col("channel_max"))
    val resized = SparkEntry.queries("m7_image_resize")(spark, sf0001)
    val joined = full.join(resized, "doc_id").cache()
    // halved dims; a subset of pixels can never out-sum or out-max the whole
    val bad = joined.filter(
      col("out_w") =!= 8 ||
        col("out_h") =!= expr("(img_h + 1) div 2") ||
        col("resized_sum") > col("channel_sum") ||
        col("resized_max") > col("channel_max"))
    assert(bad.count() === 0L)
    // the downsample keeps real content, not just padding
    assert(joined.filter(col("resized_sum") > 0).count() > 0)
    joined.unpersist()
  }

  test("q2g: bucket group counts account for exactly 32x the distinct line keys") {
    val df = SparkEntry.queries("q2g_substr_agg")(spark, sf0001).cache()
    val distinctKeys = Tables.lineitem(spark, sf0001)
      .select(concat(col("l_orderkey").cast("string"), lit("-"),
        col("l_linenumber").cast("string"))).distinct().count()
    val totalGroups = df.agg(sum(col("n_groups"))).first().getLong(0)
    assert(totalGroups === distinctKeys * 32,
      "amplified group count does not match 32x the natural key count")
    // every input line lands in some group exactly 32 times
    val totalLines = df.agg(sum(col("n_lines_total"))).first().getLong(0)
    assert(totalLines === Tables.lineitem(spark, sf0001).count() * 32)
    df.unpersist()
  }
}
