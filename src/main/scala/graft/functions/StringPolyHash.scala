package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Deterministic cross-engine string hash: polynomial rolling hash over the
  * UTF-8 bytes, mod-reduced at every step.
  *
  *   h = b0; h = (h * 31 + b_i) % mod   for i >= 1
  *
  * This is the hash the minhash/simhash/fingerprint operators build on.
  * Engine-native hashes (Spark murmur3 vs DuckDB's) don't agree across
  * engines, so the DuckDB oracle replays the identical arithmetic with
  * `list_reduce(list_transform(regexp_split_to_array(s,''), c -> ascii(c)),
  * (a,b) -> (a*31+b) % mod)` — byte==codepoint holds on this ASCII corpus.
  *
  * Implemented as a native Catalyst expression with `doGenCode` so it stays
  * inside WholeStageCodegen (a Scala UDF here would fence off the whole
  * dedup pipeline from codegen).
  */
case class StringPolyHash(child: Expression, mod: Long)
    extends UnaryExpression {

  override def dataType: DataType = LongType

  override def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[UTF8String].getBytes
    if (bytes.isEmpty) 0L
    else {
      var h = (bytes(0) & 0xffL)
      var i = 1
      while (i < bytes.length) {
        h = (h * 31 + (bytes(i) & 0xffL)) % mod
        i += 1
      }
      h
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val bytes = ctx.freshName("bytes")
      val i = ctx.freshName("i")
      val h = ctx.freshName("h")
      s"""
         |byte[] $bytes = $c.getBytes();
         |long $h = 0L;
         |if ($bytes.length > 0) {
         |  $h = (long)($bytes[0] & 0xff);
         |  for (int $i = 1; $i < $bytes.length; $i++) {
         |    $h = ($h * 31L + (long)($bytes[$i] & 0xff)) % ${mod}L;
         |  }
         |}
         |${ev.value} = $h;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): StringPolyHash =
    copy(child = newChild)
}

object StringPolyHash {
  val DefaultMod: Long = 1000003L

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_polyhash", exprs => StringPolyHash(exprs.head, DefaultMod), "built-in")
}
