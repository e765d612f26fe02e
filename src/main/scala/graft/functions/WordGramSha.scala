package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** SHA-256 word-k-gram digests of a token array as ONE codegen'd Catalyst
  * expression — the sha2 sibling of [[ShingleHashes]], replacing the
  * interpreted nested-HOF form
  * `transform(sequence(...), i -> sha2(concat_ws(' ', slice(toks, i, k)), 256))`
  * used by the decontamination/boilerplate/passage/substring family
  * (x20/x46/x60/x16/x50 and their streaming twins).
  *
  * Digest identity: each window's digest is SHA-256 over the UTF-8 bytes of
  * `tok_i ⧺ ' ' ⧺ tok_{i+1} ⧺ … ⧺ tok_{i+len-1}` — exactly the bytes
  * `concat_ws(' ', slice(...))` produces (token arrays from `split` carry
  * no NULLs, so concat_ws's null-skipping never fires) — hex-encoded
  * lowercase like Spark's `sha2(…, 256)` and DuckDB's `sha256`. The bytes
  * stream straight into the MessageDigest: no per-window joined string, no
  * intermediate slice arrays, no interpreted lambda frames.
  *
  * Two window layouts:
  *  - `stride = 1` (overlapping shingles): windows at 0 … n-k, each exactly
  *    k tokens; empty result if n < k — the x20/x46/x60/x50 shape.
  *  - `stride = k` with partial tail (non-overlapping passages): windows at
  *    0, k, 2k, … while the offset is < n, the last window truncated — the
  *    x16 shape (`slice` past the end truncates).
  */
case class WordGramSha(child: Expression, k: Int, overlapping: Boolean)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    WordGramSha.digests(input.asInstanceOf[ArrayData], k, overlapping)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.WordGramSha.digests($c, $k, $overlapping);")

  override protected def withNewChildInternal(newChild: Expression): WordGramSha =
    copy(child = newChild)
}

object WordGramSha {

  private val HexDigits = "0123456789abcdef".toCharArray

  /** Static kernel shared by interpreted eval and generated code. */
  def digests(toks: ArrayData, k: Int, overlapping: Boolean): ArrayData = {
    val n = toks.numElements()
    val stride = if (overlapping) 1 else k
    val m =
      if (overlapping) { if (n < k) 0 else n - k + 1 }
      else { if (n == 0) 0 else (n - 1) / k + 1 }
    if (m == 0) return new GenericArrayData(Array.empty[Any])
    val bytes = new Array[Array[Byte]](n)
    var i = 0
    while (i < n) { bytes(i) = toks.getUTF8String(i).getBytes; i += 1 }
    val md = java.security.MessageDigest.getInstance("SHA-256")
    val out = new Array[Any](m)
    var w = 0
    while (w < m) {
      val start = w * stride
      val end = math.min(start + k, n) // partial tail in passage mode
      md.reset()
      var t = start
      while (t < end) {
        if (t > start) md.update(32.toByte)
        md.update(bytes(t))
        t += 1
      }
      val dg = md.digest()
      val hex = new Array[Byte](64)
      var j = 0
      while (j < 32) {
        hex(2 * j) = HexDigits((dg(j) >> 4) & 0xf).toByte
        hex(2 * j + 1) = HexDigits(dg(j) & 0xf).toByte
        j += 1
      }
      out(w) = UTF8String.fromBytes(hex)
      w += 1
    }
    new GenericArrayData(out)
  }

  private def literalK(e: Expression): Int = e.eval() match {
    case i: Int  => i
    case l: Long => l.toInt
    case other => throw new IllegalArgumentException(
      s"wordgram width must be an integer literal, got $other")
  }

  /** `graft_wordgram_sha(toks, k)` → overlapping k-gram digests (positional;
    * index in the array == 0-based window start, so `posexplode` recovers
    * the position column x50 needs). `graft_wordgram_passage_sha(toks, k)`
    * → non-overlapping stride-k windows with a truncated tail.
    */
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_wordgram_sha",
      exprs => WordGramSha(exprs.head, literalK(exprs(1)), overlapping = true),
      "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_wordgram_passage_sha",
      exprs => WordGramSha(exprs.head, literalK(exprs(1)), overlapping = false),
      "built-in")
  }
}
