package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Point-query an `org.apache.spark.util.sketch.CountMinSketch` built by
  * Spark's own `count_min_sketch` aggregate: `graft_cms_query(sketch,
  * item)` → the sketch's estimated count for `item` (a string).
  *
  * Spark ships the builder aggregate in SQL but no reader — the sketch
  * bytes are only consumable from driver-side Scala (`df.stat`). This
  * expression closes that gap so a heavy-hitters pipeline can stay fully
  * in-plan: build the sketch with one map-side-combined aggregate, probe
  * it on a HANDFUL of candidate rows. Probing hashes the item's UTF-8
  * bytes exactly as `CountMinSketchAgg.update` does for StringType, so
  * estimates match what the aggregate inserted.
  *
  * CodegenFallback, deserialize-per-eval — deliberately: the probe side of
  * a heavy-hitters query is top-k rows (constant), never the corpus. The
  * corpus-sized pass is the sketch AGGREGATE, which is Spark's own
  * codegen'd implementation.
  */
case class CmsQuery(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  override def dataType: DataType = LongType

  override def nullSafeEval(sk: Any, item: Any): Any = {
    val cms = org.apache.spark.util.sketch.CountMinSketch.readFrom(
      new java.io.ByteArrayInputStream(sk.asInstanceOf[Array[Byte]]))
    cms.estimateCount(item.asInstanceOf[UTF8String].getBytes)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CmsQuery =
    copy(left = newLeft, right = newRight)
}

object CmsQuery {
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_cms_query", exprs => CmsQuery(exprs.head, exprs(1)), "built-in")
}
