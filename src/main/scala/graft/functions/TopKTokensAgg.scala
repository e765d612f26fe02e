package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}
import scala.collection.mutable

/** Heavy-hitters aggregate (space-saving family) as a
  * TypedImperativeAggregate — the buffer-object aggregate API sketches
  * need (HLL/quantile/top-k), complementing the typed `Aggregator` (u2)
  * and the pure-expression paths.
  *
  * Space-saving semantics: when the buffer is at `capacity`, an unseen item
  * evicts the current minimum and inherits its count (+1) — the classic
  * over-estimate bound. When `capacity` exceeds the true distinct count
  * (the documents vocabulary here) no eviction ever happens and the result
  * is EXACT, which is what makes the u4 query oracle-checkable while still
  * exercising the sketch machinery.
  *
  * Returns the top-k as an array<struct<token,cnt>> ordered by
  * (cnt DESC, token ASC) — deterministic.
  */
case class TopKTokensAgg(
    child: Expression,
    k: Int,
    capacity: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.HashMap[String, Long]] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("token", StringType, nullable = false),
    StructField("cnt", LongType, nullable = false))))

  override def createAggregationBuffer(): mutable.HashMap[String, Long] =
    mutable.HashMap.empty

  override def update(buf: mutable.HashMap[String, Long], input: InternalRow): mutable.HashMap[String, Long] = {
    val v = child.eval(input)
    if (v != null) add(buf, v.asInstanceOf[UTF8String].toString, 1L)
    buf
  }

  private def add(buf: mutable.HashMap[String, Long], tok: String, n: Long): Unit = {
    buf.get(tok) match {
      case Some(c) => buf.update(tok, c + n)
      case None if buf.size < capacity => buf.update(tok, n)
      case None =>
        // space-saving eviction: replace the minimum, inherit its count
        val (minTok, minCnt) = buf.minBy { case (t, c) => (c, t) }
        buf.remove(minTok)
        buf.update(tok, minCnt + n)
    }
  }

  override def merge(a: mutable.HashMap[String, Long], b: mutable.HashMap[String, Long]): mutable.HashMap[String, Long] = {
    b.foreach { case (t, c) => add(a, t, c) }
    a
  }

  override def eval(buf: mutable.HashMap[String, Long]): Any = {
    val top = buf.toSeq.sortBy { case (t, c) => (-c, t) }.take(k)
    new GenericArrayData(top.map { case (t, c) =>
      InternalRow(UTF8String.fromString(t), c)
    })
  }

  override def serialize(buf: mutable.HashMap[String, Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (t, c) =>
      val bytes = t.getBytes("UTF-8")
      out.writeInt(bytes.length); out.write(bytes); out.writeLong(c)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[String, Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = mutable.HashMap.empty[String, Long]
    (0 until n).foreach { _ =>
      val len = in.readInt()
      val arr = new Array[Byte](len)
      in.readFully(arr)
      buf.update(new String(arr, "UTF-8"), in.readLong())
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKTokensAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKTokensAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): TopKTokensAgg =
    copy(child = newChildren.head)
}

object TopKTokensAgg {
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_topk_tokens",
      exprs => TopKTokensAgg(exprs.head, k = 3, capacity = 64)
        .toAggregateExpression(),
      "built-in")
}
