package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Scalable interval (range) join.
  *
  * A naive `l.ts BETWEEN r.lo AND r.hi` join has no equi-key, so Spark
  * plans BroadcastNestedLoopJoin — O(|L|·|R|) and a broadcast of a whole
  * side. This utility applies the standard bucketization trick: pick a
  * band width, explode each interval into the buckets it overlaps, tag
  * each point with its bucket, equi-join on the bucket, and re-apply the
  * exact range predicate as a residual. The shuffle keys on the bucket, so
  * cost is O(|L| + Σ interval_width/band) — linear at 100 TB as long as
  * band width is chosen near the median interval length.
  */
object RangeJoin {

  /** Join points (`pointCol`) to intervals ([loCol, hiCol], inclusive).
    * All three columns must be numeric (epoch µs, ids, ...). Returns
    * left×right matched rows; the helper bucket columns never escape.
    */
  def pointInInterval(points: DataFrame, intervals: DataFrame,
                      pointCol: String, loCol: String, hiCol: String,
                      band: Long): DataFrame = {
    require(band > 0)
    val p = points.withColumn("__bucket", (col(pointCol) / band).cast("long"))
    val iv = intervals.withColumn("__bucket",
      explode(sequence((col(loCol) / band).cast("long"),
                       (col(hiCol) / band).cast("long"))))
    p.join(iv, p("__bucket") === iv("__bucket") &&
        col(pointCol) >= col(loCol) && col(pointCol) <= col(hiCol))
      .drop("__bucket")
  }
}
