package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Static NFC kernel shared by interpreted eval and generated code. */
object NfcKernel {
  /** Unicode NFC canonical composition of a UTF8String.
    *
    * Fast path: `Normalizer.isNormalized` is a cheap scan that answers
    * "already NFC?" without allocating — and on a mostly-ASCII corpus it
    * answers yes for nearly every row, so the common case is zero-copy
    * (returns the input UTF8String unchanged). Only rows that actually
    * carry decomposed sequences pay the String round-trip.
    */
  def nfc(s: UTF8String): UTF8String = {
    val j = s.toString
    if (java.text.Normalizer.isNormalized(j, java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(j, java.text.Normalizer.Form.NFC))
  }
}

/** `graft_nfc(text)` → the Unicode NFC (canonical composition)
  * normalization of `text` — the standard first step of a training-data
  * text-cleaning pipeline (HTML extractors and OCR emit decomposed
  * `e + U+0301` sequences; every downstream exact-hash dedup, n-gram, and
  * tokenizer op treats `é` and `e+◌́` as DIFFERENT strings unless the
  * corpus is normalized first, silently splitting duplicate groups).
  *
  * Native Catalyst expression with `doGenCode` (one static call into
  * [[NfcKernel]]) so normalization fuses into the same WholeStageCodegen
  * span as the dedup hashing that consumes it — the [[StringPolyHash]]
  * discipline. Cross-engine contract: `java.text.Normalizer` (ICU-derived
  * NFC tables) agrees with DuckDB's utf8proc `nfc_normalize` on canonical
  * composition, which the x54 oracle exercises end-to-end.
  *
  * 100 TB shape: pure map-side, zero shuffle, zero allocation on
  * already-normalized rows (the overwhelming majority of a real corpus) —
  * the cost is one linear `isNormalized` scan per row.
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType

  override def nullSafeEval(input: Any): Any =
    NfcKernel.nfc(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.NfcKernel.nfc($c);")

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}

object NfcNormalize {
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_nfc", exprs => NfcNormalize(exprs.head), "built-in")
}
