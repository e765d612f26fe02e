package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Random-hyperplane LSH bucket for an embedding, single pass, codegen'd.
  *
  * Plane j's i-th coordinate is the deterministic pseudo-projection
  *   r(i,j) = ((i*1103515245 + j*12345 + 42) mod 2000001) / 1e6 - 1.0
  * (exact integer arithmetic + one double division — reproducible in any
  * engine; the DuckDB oracle rebuilds the same planes with list_transform).
  * Bucket = Σ_j [dot(v, r_j) >= 0] << j.
  *
  * Each of the 8 accumulators is folded in ascending i — the same addition
  * order as DuckDB's list_dot_product over the same plane — so the sign
  * decisions (and hence buckets) are bit-deterministic across engines.
  *
  * Replaces 8 `aggregate(zip_with(...))` SQL-lambda HOFs per row: those
  * fence off codegen and allocate per element; this is one fused loop.
  */
case class VectorLshBucket(child: Expression, numPlanes: Int)
    extends UnaryExpression {

  require(numPlanes >= 1 && numPlanes <= 30)

  override def dataType: DataType = IntegerType

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val dots = new Array[Double](numPlanes)
    var i = 0
    while (i < n) {
      val x = arr.getFloat(i).toDouble
      var j = 0
      while (j < numPlanes) {
        val r = ((i.toLong * 1103515245L + j.toLong * 12345L + 42L) % 2000001L) / 1000000.0 - 1.0
        dots(j) += x * r
        j += 1
      }
      i += 1
    }
    var bucket = 0
    var j = 0
    while (j < numPlanes) {
      if (dots(j) >= 0.0) bucket |= (1 << j)
      j += 1
    }
    bucket
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val x = ctx.freshName("x")
      val r = ctx.freshName("r")
      val dots = ctx.freshName("dots")
      val bucket = ctx.freshName("bucket")
      s"""
         |int $n = $c.numElements();
         |double[] $dots = new double[$numPlanes];
         |for (int $i = 0; $i < $n; $i++) {
         |  double $x = (double) $c.getFloat($i);
         |  for (int $j = 0; $j < $numPlanes; $j++) {
         |    double $r = (((long) $i * 1103515245L + (long) $j * 12345L + 42L) % 2000001L) / 1000000.0 - 1.0;
         |    $dots[$j] += $x * $r;
         |  }
         |}
         |int $bucket = 0;
         |for (int $j = 0; $j < $numPlanes; $j++) {
         |  if ($dots[$j] >= 0.0) $bucket |= (1 << $j);
         |}
         |${ev.value} = $bucket;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): VectorLshBucket =
    copy(child = newChild)
}

object VectorLshBucket {

  /** Default plane count for small/benchmark inputs. The bucket count must
    * scale with N: with p planes there are 2^p buckets, and in-bucket
    * verification is quadratic in bucket occupancy, so choose
    * p ≈ log2(N / target_bucket_size) — e.g. N = 10⁹ vectors and ~1k-vector
    * buckets needs p ≈ 20, not 8. `graft_lsh_bucket(emb, p)` takes the
    * count as a literal second argument end-to-end; multi-probe or
    * multi-table LSH layers on top by unioning bucketings over different
    * plane seeds (here: plane index offsets).
    */
  val DefaultPlanes = 8

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_lsh_bucket", exprs => {
        val planes = exprs match {
          case Seq(_) => DefaultPlanes
          case Seq(_, p) if p.foldable => p.eval(null) match {
            case i: Int if i >= 1 && i <= 30 => i
            // validate BEFORE toInt — silent truncation of an out-of-range
            // Long (e.g. 2^32+8 -> 8) must not produce a valid-looking count
            case l: Long if l >= 1 && l <= 30 => l.toInt
            case other => throw new IllegalArgumentException(
              s"graft_lsh_bucket plane count must be an integer literal in [1, 30], got $other")
          }
          case Seq(_, _) => throw new IllegalArgumentException(
            "graft_lsh_bucket plane count must be a foldable literal, not a column")
          case _ => throw new IllegalArgumentException(
            "graft_lsh_bucket takes (embedding[, numPlanes])")
        }
        VectorLshBucket(exprs.head, planes)
      }, "built-in")
}
