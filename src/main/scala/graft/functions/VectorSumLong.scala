package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{
  Add, AttributeReference, Expression, ExpectsInputTypes, If, IsNull,
  LambdaFunction, Literal, NamedLambdaVariable, ZipWith}
import org.apache.spark.sql.catalyst.expressions.aggregate.DeclarativeAggregate
import org.apache.spark.sql.types._

/** Element-wise SUM over `array<long>` columns as a DeclarativeAggregate —
  * the vector sibling of SUM, built for embedding centroids.
  *
  * Why an aggregate instead of explode→groupBy(key, dim): exploding a
  * d-dimensional embedding multiplies the pre-shuffle row count by d and,
  * worse, makes the shuffle key (key, dim) — d times the groups. With the
  * aggregate the map side combines whole vectors locally and the shuffle
  * moves ONE row per (partition, key): at 100 TB and d=64 that is 64× fewer
  * shuffle rows for the same bytes, and the reduce side merges arrays
  * pairwise. Long buffers keep the sum exact and associative (merge order
  * cannot change the result), which is what makes the centroid
  * cross-engine deterministic — callers scale floats to integral units
  * first (e.g. round(v·10⁶)).
  *
  * The buffer is an array, so Spark plans this as SortAggregate /
  * ObjectHashAggregate rather than the UnsafeRow hash path — same as the
  * built-in collect_list; acceptable because rows-per-group, not
  * group-count, is the load here.
  *
  * update/merge are pure Catalyst `ZipWith` trees over pre-bound
  * `NamedLambdaVariable`s: no Scala closures, no opaque buffers.
  */
case class VectorSumLong(child: Expression)
    extends DeclarativeAggregate with ExpectsInputTypes {

  private val elemType = LongType
  private val bufType = ArrayType(elemType, containsNull = true)

  override def children: Seq[Expression] = Seq(child)
  // AbstractDataType is private[sql]; Seq covariance lets the override
  // narrow to the accessible Seq[DataType] (same workaround as
  // SortedIntersectCount)
  override def inputTypes: Seq[DataType] = Seq(ArrayType(elemType))
  override def nullable: Boolean = true
  override def dataType: DataType = bufType

  private lazy val acc = AttributeReference("vecsum_acc", bufType, nullable = true)()

  override lazy val aggBufferAttributes: Seq[AttributeReference] = Seq(acc)

  override lazy val initialValues: Seq[Expression] =
    Seq(Literal.create(null, bufType))

  private def vecAdd(a: Expression, b: Expression): Expression = {
    val x = NamedLambdaVariable("x", elemType, nullable = true)
    val y = NamedLambdaVariable("y", elemType, nullable = true)
    ZipWith(a, b, LambdaFunction(Add(x, y), Seq(x, y)))
  }

  // first non-null input seeds the buffer; after that, element-wise add
  override lazy val updateExpressions: Seq[Expression] =
    Seq(If(IsNull(child), acc, If(IsNull(acc), child, vecAdd(acc, child))))

  override lazy val mergeExpressions: Seq[Expression] =
    Seq(If(IsNull(acc.right), acc.left,
      If(IsNull(acc.left), acc.right, vecAdd(acc.left, acc.right))))

  override lazy val evaluateExpression: Expression = acc

  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): VectorSumLong =
    copy(child = c(0))
}

object VectorSumLong {
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_vecsum_long",
      exprs => VectorSumLong(exprs.head).toAggregateExpression(),
      "built-in")
}
