package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.dsl.expressions._
import org.apache.spark.sql.catalyst.expressions.{AttributeReference, Expression, If, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.DeclarativeAggregate
import org.apache.spark.sql.types._

/** Weighted sum Σ(x·w) as a DeclarativeAggregate — the pure-expression
  * aggregate API: update/merge/evaluate are Catalyst expression trees, so
  * the whole aggregate participates in codegen (unlike Aggregator/
  * TypedImperativeAggregate, whose buffers are opaque objects).
  *
  * Buffer is DECIMAL(38,8): exact and associative, following the engine's
  * money-cast discipline, so partial aggregation order can't change the
  * result. Completes the custom-aggregate surface: typed Aggregator (u2),
  * TypedImperativeAggregate sketch (u4), DeclarativeAggregate (u5).
  */
case class WeightedSum(x: Expression, w: Expression)
    extends DeclarativeAggregate {

  // precision 30, not 38: Add(dec(p,s), dec(p,s)) yields dec(p+1,s), and
  // p+1 must stay <= 38 or Catalyst silently adjusts the scale down —
  // which would desync the expression's result type from the buffer slot
  private val bufType = DecimalType(30, 8)

  override def children: Seq[Expression] = Seq(x, w)
  override def nullable: Boolean = false
  override def dataType: DataType = bufType

  private lazy val acc = AttributeReference("wsum_acc", bufType, nullable = false)()

  override lazy val aggBufferAttributes: Seq[AttributeReference] = Seq(acc)

  override lazy val initialValues: Seq[Expression] =
    Seq(Literal.create(Decimal(0, 30, 8), bufType))

  override lazy val updateExpressions: Seq[Expression] = {
    val product =
      (x.cast(DecimalType(18, 2)) * w.cast(DecimalType(18, 6))).cast(bufType)
    // null input must not nullify the accumulator (SUM-like semantics)
    Seq(If(product.isNull, acc, (acc + product).cast(bufType)))
  }

  override lazy val mergeExpressions: Seq[Expression] = Seq(
    (acc.left + acc.right).cast(bufType))

  override lazy val evaluateExpression: Expression = acc

  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): WeightedSum =
    copy(x = c(0), w = c(1))
}

object WeightedSum {
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_weighted_sum",
      exprs => WeightedSum(exprs.head, exprs(1)).toAggregateExpression(),
      "built-in")
}
