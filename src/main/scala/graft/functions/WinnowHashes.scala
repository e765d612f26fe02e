package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Winnowing fingerprint selection (Schleimer–Wilkerson–Aiken) of a token
  * array, as ONE codegen'd Catalyst expression: the distinct rightmost
  * minimal 3-gram hashes of every sliding window of `win` consecutive
  * grams, returned as encoded `h·2^posBits + pos` longs (sorted — the
  * iteration order of a per-row expression must be deterministic).
  *
  * Why an expression instead of the window-function form the oracle
  * replays: the selection is PER DOCUMENT, so computing it in the scan
  * needs no gram explode, no exchange, and no per-doc window sort — the
  * fingerprint table materializes map-side inside WholeStageCodegen
  * (the [[ShingleHashes]] rationale, one level up). The DuckDB oracle
  * keeps the explicit min-over-frame replay, which doubles as the
  * readable specification; the two forms select identical fingerprints
  * because the rule is the same — min over the window of the key
  * `h·2^B + (2^B−1−pos)` IS (min hash, rightmost position).
  *
  * Kernel: gram hashes via [[ShingleHashes.hash]] (the single hash
  * definition), then an O(m) monotonic-deque sliding minimum — the SQL
  * frame form is O(m·win). Windows are `[i, i+win-1]` for
  * `i ∈ [0, m−win]`; a document with fewer than `win` grams contributes
  * its single truncated window (the whole doc), matching the frame
  * semantics at `pos 0`. Position domain: m < 2^posBits, enforced.
  */
case class WinnowHashes(child: Expression, k: Int, mod: Long, win: Int,
    posBits: Int) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    WinnowHashes.winnow(input.asInstanceOf[ArrayData], k, mod, win, posBits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.WinnowHashes.winnow($c, $k, ${mod}L, $win, $posBits);")

  override protected def withNewChildInternal(newChild: Expression): WinnowHashes =
    copy(child = newChild)
}

object WinnowHashes {

  /** Engine defaults — referenced by the query layer (PipelineOps) so
    * the registered function and the oracle interpolation cannot drift.
    */
  val DefaultWin = 8
  val DefaultPosBits = 21
  /** Gram width of the shingle hashes the winnow selects over — surfaced
    * as a constant (r15 ADVICE) so published-layout names can embed the
    * FULL selection geometry (k, mod, win, posBits): an index built under
    * one geometry must never be silently reused under another.
    */
  val DefaultK = 3

  /** Static kernel shared by interpreted eval and generated code. */
  def winnow(toks: ArrayData, k: Int, mod: Long, win: Int,
      posBits: Int): ArrayData = {
    val hsData = ShingleHashes.hash(toks, k, mod, distinctSorted = false)
    val m = hsData.numElements()
    if (m == 0) return new GenericArrayData(Array.empty[Any])
    require(m < (1 << posBits),
      s"document has $m grams — exceeds the 2^$posBits winnow position domain")
    val hs = new Array[Long](m)
    var i = 0
    while (i < m) { hs(i) = hsData.getLong(i); i += 1 }
    val encMax = 1L << posBits
    // encoded comparison key: hash ascending, position descending — the
    // window minimum of this key is (min hash, rightmost position)
    def key(p: Int): Long = hs(p) * encMax + (encMax - 1 - p)
    // monotonic deque of positions with increasing key; the head is the
    // current window's rightmost-argmin
    val dq = new Array[Int](m)
    var head = 0
    var tail = 0
    val sel = new java.util.TreeSet[java.lang.Long]()
    var p = 0
    while (p < m) {
      while (tail > head && key(dq(tail - 1)) > key(p)) tail -= 1
      dq(tail) = p; tail += 1
      while (dq(head) < p - win + 1) head += 1
      // a window completes at every end p >= win-1; a sub-window doc's
      // single truncated window completes at its last gram
      if (p >= win - 1 || p == m - 1) {
        val q = dq(head)
        sel.add(hs(q) * encMax + q)
      }
      p += 1
    }
    val out = new Array[Any](sel.size)
    val it = sel.iterator()
    var o = 0
    while (it.hasNext) { out(o) = it.next().longValue(); o += 1 }
    new GenericArrayData(out)
  }

  /** `graft_winnow_hashes(toks)` → sorted distinct encoded fingerprints
    * (h·2²¹ + pos) under the engine defaults: 3-gram polyhash, window 8.
    */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_winnow_hashes",
      exprs => WinnowHashes(exprs.head, DefaultK, StringPolyHash.DefaultMod,
        DefaultWin, DefaultPosBits),
      "built-in")
}
