package graft

import graft.queries.EventAnalytics
import org.apache.spark.sql.functions._

/** Round-10 pins: the event-analytics family (e1–e5) — funnel ordering,
  * cohort-retention triangle shape, rolling-distinct window math,
  * rank-based winsorization invariants, and the transition-matrix row
  * sums — plus plan hygiene (one user-keyed exchange serving all of e5's
  * windows, broadcast boundary join in e4).
  */
class Round10Spec extends SparkSpec {

  private val d = TestSpark.sf0001

  test("e1 funnel stages are monotonically non-increasing") {
    val rows = EventAnalytics.e1Funnel(spark, d)
      .orderBy(col("stage")).collect()
    assert(rows.length === 3)
    val counts = rows.map(_.getAs[Long]("n_users"))
    assert(counts(0) >= counts(1) && counts(1) >= counts(2),
      s"funnel widened downstream: ${counts.toSeq}")
    assert(counts(0) > 0, "no user ever viewed — fixture assumption broke")
  }

  test("e2 retention: offset-0 cell covers the whole cohort") {
    val ret = EventAnalytics.e2Retention(spark, d)
    // every user is active in their own cohort week by construction, so
    // the offset-0 diagonal must dominate every later offset of its row
    val byCohort = ret.collect()
      .groupBy(_.getAs[String]("cohort_week"))
    byCohort.foreach { case (wk, rows) =>
      val at = rows.map(r =>
        r.getAs[Long]("week_offset") -> r.getAs[Long]("n_active")).toMap
      assert(at.contains(0L), s"cohort $wk missing its own week")
      assert(at.forall { case (_, n) => n <= at(0L) },
        s"cohort $wk has a later week larger than its own: $at")
    }
  }

  test("e3 rolling distinct: 7-day count bounded by day count and total") {
    val roll = EventAnalytics.e3RollingDistinct(spark, d).collect()
    val total = Tables.events(spark, d)
      .select(countDistinct(col("user_id"))).head().getLong(0)
    roll.foreach { r =>
      val n1 = r.getAs[Long]("n_day")
      val n7 = r.getAs[Long]("n_7day")
      assert(n7 >= n1, s"${r.getString(0)}: rolling $n7 < same-day $n1")
      assert(n7 <= total, s"${r.getString(0)}: rolling $n7 > population $total")
    }
    // trailing-window identity: days with no same-day activity only occur
    // past the data's end (the explode's +6 tail), never inside the range
    val inRange = roll.filter(_.getAs[Long]("n_day") > 0).map(_.getString(0))
    assert(inRange.nonEmpty)
  }

  test("e4 winsorize: boundaries clip exactly the declared tails") {
    val w = EventAnalytics.e4Winsorize(spark, d).collect()
    assert(w.length > 0)
    w.foreach { r =>
      val n = r.getAs[Long]("n")
      val k = math.floor(0.05 * n).toLong
      assert(r.getAs[Long]("lo_vm") <= r.getAs[Long]("hi_vm"))
      // rank-selection semantics: strictly-below-lo rows number at most k
      // (ties at the boundary value stay unclipped), same above hi
      assert(r.getAs[Long]("n_clip_lo") <= k,
        s"${r.getString(0)}: clipped ${r.getAs[Long]("n_clip_lo")} > k=$k")
      assert(r.getAs[Long]("n_clip_hi") <= k)
    }
  }

  test("e5 transition matrix: from-state totals sum the matrix rows") {
    val m = EventAnalytics.e5Transitions(spark, d).collect()
    val byFrom = m.groupBy(_.getAs[String]("from_type"))
    byFrom.foreach { case (f, rows) =>
      val sum = rows.map(_.getAs[Long]("n_trans")).sum
      rows.foreach { r =>
        assert(r.getAs[Long]("n_from_total") === sum,
          s"$f: declared total ${r.getAs[Long]("n_from_total")} != row sum $sum")
      }
    }
  }

  test("e5 plan: one user-keyed exchange serves session and lead windows") {
    val plan = EventAnalytics.e5Transitions(spark, d)
      .queryExecution.executedPlan.toString
    // the (user_id, sid) window must reuse the user_id partitioning, not
    // add a second pre-aggregation exchange over the raw events
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(exchanges <= 3,
      s"e5 plan repartitions $exchanges times — windows not sharing the " +
        s"user_id exchange:\n${plan.take(3000)}")
  }

  test("e4 plan: boundary join broadcasts the per-group bounds") {
    val plan = EventAnalytics.e4Winsorize(spark, d)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"e4 bounds join is not broadcast:\n${plan.take(3000)}")
  }
}
