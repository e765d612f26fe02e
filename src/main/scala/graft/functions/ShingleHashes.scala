package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Word-k-gram shingle hashes of a token array, as ONE codegen'd Catalyst
  * expression instead of the nested SQL higher-order-function pipeline
  * (`transform(sequence(...), i -> graft_polyhash(concat(...)))`) the dedup
  * family used before round 11.
  *
  * Why: Spark evaluates HOF lambdas interpreted — never inside
  * WholeStageCodegen — and the shingle hash runs on the hottest text volume
  * in the engine (x9 PPJoin, x3/x58 minhash, x63 recall audit, x27/x39
  * simhash). The r10 measurements put the interpreted form at 2-3× the
  * codegen'd equivalent. This expression fuses sequence + concat + polyhash
  * (+ distinct + sort) into a single generated call with zero intermediate
  * arrays or concatenated strings.
  *
  * Fingerprint identity: the hash of shingle (t_i .. t_{i+k-1}) is the
  * [[StringPolyHash]] polynomial rolling hash over the UTF-8 bytes of
  * `concat(t_i, ' ', t_{i+1}, ..., ' ', t_{i+k-1})` — computed by streaming
  * the token bytes and the separator byte (0x20) through the identical
  * `h = (h * 31 + b) % mod` recurrence without materializing the concat.
  * DuckDB oracles replaying the old arithmetic keep matching bit-for-bit.
  *
  * Two modes:
  *  - `distinctSorted = true` → the sorted distinct shingle SET (what
  *    `sort_array(array_distinct(transform(...)))` produced) — minhash /
  *    PPJoin / Jaccard consumers.
  *  - `distinctSorted = false` → every shingle hash in positional order
  *    (the MULTISET) — simhash consumers, whose bit sums weight by
  *    occurrence count.
  */
case class ShingleHashes(child: Expression, k: Int, mod: Long,
    distinctSorted: Boolean) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    ShingleHashes.hash(input.asInstanceOf[ArrayData], k, mod, distinctSorted)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.ShingleHashes.hash($c, $k, ${mod}L, $distinctSorted);")

  override protected def withNewChildInternal(newChild: Expression): ShingleHashes =
    copy(child = newChild)
}

object ShingleHashes {

  /** Static kernel shared by interpreted eval and generated code. */
  def hash(toks: ArrayData, k: Int, mod: Long, distinctSorted: Boolean): ArrayData = {
    val n = toks.numElements()
    if (n < k) return new GenericArrayData(Array.empty[Any])
    // token bytes fetched once each (every token participates in up to k
    // shingles; re-fetching per shingle would triple the UTF8String traffic)
    val bytes = new Array[Array[Byte]](n)
    var i = 0
    while (i < n) { bytes(i) = toks.getUTF8String(i).getBytes; i += 1 }
    val m = n - k + 1
    val hs = new Array[Long](m)
    i = 0
    while (i < m) {
      // StringPolyHash over bytes(t_i) ++ 0x20 ++ ... ++ bytes(t_{i+k-1}):
      // h = b0; h = (h * 31 + b) % mod thereafter. The byte stream is never
      // empty (k >= 2 separators exist; k = 1 tokens may be empty strings —
      // then h stays 0, matching graft_polyhash('') = 0).
      var h = 0L
      var first = true
      var t = 0
      while (t < k) {
        if (t > 0) {
          if (first) { h = 32L; first = false }
          else h = (h * 31 + 32L) % mod
        }
        val b = bytes(i + t)
        var j = 0
        while (j < b.length) {
          val v = b(j) & 0xffL
          if (first) { h = v; first = false }
          else h = (h * 31 + v) % mod
          j += 1
        }
        t += 1
      }
      hs(i) = h
      i += 1
    }
    var len = m
    if (distinctSorted) {
      java.util.Arrays.sort(hs)
      var out = 0
      var p = 0
      while (p < m) {
        if (out == 0 || hs(out - 1) != hs(p)) { hs(out) = hs(p); out += 1 }
        p += 1
      }
      len = out
    }
    val arr = new Array[Any](len)
    var q = 0
    while (q < len) { arr(q) = hs(q); q += 1 }
    new GenericArrayData(arr)
  }

  /** The registered gram width. ONE definition (mirroring
    * WinnowHashes.DefaultK): the x39/x39b published-layout tags read this,
    * so a width change renames (invalidates) at-rest indexes instead of
    * silently reusing wrong-geometry content (r16 ADVICE).
    */
  val DefaultK = 3

  /** `graft_shingle_hashes(toks)` → sorted distinct word-k-gram polyhash
    * set; `graft_shingle_hashes_all(toks)` → positional multiset.
    */
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_shingle_hashes",
      exprs => ShingleHashes(exprs.head, DefaultK, StringPolyHash.DefaultMod, distinctSorted = true),
      "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_shingle_hashes_all",
      exprs => ShingleHashes(exprs.head, DefaultK, StringPolyHash.DefaultMod, distinctSorted = false),
      "built-in")
  }
}
