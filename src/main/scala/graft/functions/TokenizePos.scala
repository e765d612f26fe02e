package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst generator: one input string → (pos, token) rows.
  *
  * This is the honest Spark mapping of the reference's Q4 `TRANSFORM (line)
  * USING "python url_count.py"` UDTF (amplab/benchmark `runner/url_count.py`):
  * a row-to-many-rows expansion that runs *inside* the engine instead of
  * piping every partition through an external process. Unlike the external
  * script, this stays in the JVM (no per-task process fork, no stdin/stdout
  * serialization) — at 100 TB that removes a process boundary per task.
  *
  * Evaluated via CodegenFallback (generators are not fused into
  * WholeStageCodegen anyway — built-in explode behaves the same); the
  * downstream aggregation still codegens.
  */
case class TokenizePos(child: Expression, delimiter: String = " ")
    extends UnaryExpression with Generator with CodegenFallback {

  override def elementSchema: StructType = StructType(Seq(
    StructField("pos", IntegerType, nullable = false),
    StructField("token", StringType, nullable = false)))

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val v = child.eval(input)
    if (v == null) Iterator.empty
    else {
      val toks = v.asInstanceOf[UTF8String].toString.split(delimiter)
      toks.iterator.zipWithIndex.collect {
        case (t, i) if t.nonEmpty => InternalRow(i, UTF8String.fromString(t))
      }
    }
  }

  override protected def withNewChildInternal(newChild: Expression): TokenizePos =
    copy(child = newChild)
}

object TokenizePos {
  /** Register as a temp SQL function so `selectExpr`/`spark.sql` can plant
    * it as a real Generate node: `SELECT tokenize_pos(text) AS (pos, token)`.
    */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "tokenize_pos", exprs => TokenizePos(exprs.head), "built-in")
}
