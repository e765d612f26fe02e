package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** Morton (Z-order) interleave of two non-negative 21-bit dimensions, as a
  * native codegen'd Catalyst expression — the multi-dimensional CLUSTERING
  * key for data layout (the OPTIMIZE ZORDER idea): sort-and-write by this
  * key and any aligned 2^k × 2^k rectangle of the two dimensions lands in
  * at most a handful of contiguous row runs, so a 2-D range predicate
  * prunes row groups by min/max stats instead of scanning one full
  * dimension. Pure integer bit arithmetic — the DuckDB oracle replays it
  * with shift/mask exactly.
  *
  * Inputs outside [0, 2^21) raise: silent masking would interleave garbage
  * and quietly destroy the locality property the caller is buying.
  */
case class ZOrderCode(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {

  // eval casts to Long while codegen emits raw long ops: int inputs would
  // throw interpreted but "work" under codegen (eval/codegen divergence).
  // Declared types close that hole — ints coerce to bigint at analysis.
  // AbstractDataType is private[sql]; Seq is covariant so the override can
  // narrow to the accessible Seq[DataType]
  override def inputTypes: Seq[DataType] = Seq(LongType, LongType)

  override def dataType: DataType = LongType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[Long]; val y = b.asInstanceOf[Long]
    if (x < 0 || x >= (1L << 21) || y < 0 || y >= (1L << 21))
      throw new IllegalArgumentException(
        s"graft_zorder inputs must be in [0, 2^21), got ($x, $y)")
    var z = 0L; var i = 0
    while (i < 21) {
      z |= ((x >> i) & 1L) << (2 * i)
      z |= ((y >> i) & 1L) << (2 * i + 1)
      i += 1
    }
    z
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val z = ctx.freshName("z")
      val i = ctx.freshName("i")
      s"""
         |if ($a < 0L || $a >= (1L << 21) || $b < 0L || $b >= (1L << 21)) {
         |  throw new IllegalArgumentException(
         |    "graft_zorder inputs must be in [0, 2^21), got (" + $a + ", " + $b + ")");
         |}
         |long $z = 0L;
         |for (int $i = 0; $i < 21; $i++) {
         |  $z |= (($a >> $i) & 1L) << (2 * $i);
         |  $z |= (($b >> $i) & 1L) << (2 * $i + 1);
         |}
         |${ev.value} = $z;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): ZOrderCode =
    copy(left = newLeft, right = newRight)
}

object ZOrderCode {
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_zorder", exprs => ZOrderCode(exprs.head, exprs(1)), "built-in")
}
