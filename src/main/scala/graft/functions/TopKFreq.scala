package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Space-saving heavy-hitters aggregate (Metwally/Agrawal/El Abbadi,
  * ICDT'05) as a Catalyst `TypedImperativeAggregate` — the top-k
  * frequent-items operator whose SHUFFLE cost is O(capacity) per
  * partition instead of O(distinct items): the full (item, count) table
  * never materializes and never shuffles, which is the difference
  * between "find the hot tokens in 100 TB" being one bounded-memory
  * pass and being a vocabulary-sized aggregation.
  *
  * Semantics: each partial buffer holds at most `capacity` counters.
  * A new item beyond capacity evicts the minimum counter m and starts
  * at (m.cnt + 1, err = m.cnt) — the classic overestimate bookkeeping.
  * Partials merge by union-sum (Agarwal et al., "Mergeable Summaries"),
  * then trim to capacity keeping the largest counters (count desc, item
  * asc — deterministic). The returned `err` bounds each item's
  * per-buffer overestimate; across P merged partials the total count
  * error is bounded by P·n_p/capacity ≈ n/capacity. With capacity ≥
  * distinct items nothing ever evicts and every count is EXACT with
  * err = 0 — the mode the oracle-gated query pins, while the
  * bounded-error sketch mode is spec-tested on skewed data.
  *
  * eval returns the top `k` counters as array<struct<item, cnt, err>>
  * sorted by (cnt desc, item asc). SQL surface: `topk_freq(item, k,
  * capacity)` via GraftExtensions / ensureRegistered. */
case class TopKFreq(child: Expression, k: Int, capacity: Int,
                    override val mutableAggBufferOffset: Int = 0,
                    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.HashMap[String, TopKFreq.Entry]] {

  require(k >= 1 && capacity >= k,
    "topk_freq requires 1 <= k <= capacity")

  override def children: Seq[Expression] = child :: Nil
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"topk_freq requires a string item column, got ${dt.catalogString}")
  }
  override def nullable: Boolean = false
  override def dataType: DataType = TopKFreq.OutType
  override def prettyName: String = "topk_freq"

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKFreq =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKFreq =
    copy(inputAggBufferOffset = newOffset)

  override def createAggregationBuffer(): mutable.HashMap[String, TopKFreq.Entry] =
    mutable.HashMap.empty

  override def update(buf: mutable.HashMap[String, TopKFreq.Entry],
                      input: InternalRow): mutable.HashMap[String, TopKFreq.Entry] = {
    val v = child.eval(input)
    if (v != null) {
      val s = v.asInstanceOf[UTF8String].toString
      buf.get(s) match {
        case Some(e) => e.cnt += 1
        case None if buf.size < capacity => buf(s) = TopKFreq.Entry(1L, 0L)
        case None =>
          // evict the deterministic minimum (count asc, item asc); the
          // newcomer inherits its count as the overestimate bound
          var minKey: String = null
          var minCnt = Long.MaxValue
          buf.foreach { case (key, e) =>
            if (e.cnt < minCnt || (e.cnt == minCnt && key < minKey)) {
              minKey = key; minCnt = e.cnt
            }
          }
          buf.remove(minKey)
          buf(s) = TopKFreq.Entry(minCnt + 1, minCnt)
      }
    }
    buf
  }

  override def merge(a: mutable.HashMap[String, TopKFreq.Entry],
                     b: mutable.HashMap[String, TopKFreq.Entry]): mutable.HashMap[String, TopKFreq.Entry] = {
    b.foreach { case (key, e) =>
      a.get(key) match {
        case Some(ae) => ae.cnt += e.cnt; ae.err += e.err
        case None => a(key) = TopKFreq.Entry(e.cnt, e.err)
      }
    }
    if (a.size > capacity) {
      val keep = a.toSeq.sortBy { case (key, e) => (-e.cnt, key) }.take(capacity)
      a.clear()
      keep.foreach { case (key, e) => a(key) = e }
    }
    a
  }

  override def eval(buf: mutable.HashMap[String, TopKFreq.Entry]): Any = {
    val top = buf.toSeq.sortBy { case (key, e) => (-e.cnt, key) }.take(k)
    new GenericArrayData(top.map { case (key, e) =>
      new GenericInternalRow(Array[Any](UTF8String.fromString(key), e.cnt, e.err))
    }.toArray[Any])
  }

  override def serialize(buf: mutable.HashMap[String, TopKFreq.Entry]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (key, e) =>
      val kb = key.getBytes("UTF-8")
      out.writeInt(kb.length); out.write(kb)
      out.writeLong(e.cnt); out.writeLong(e.err)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[String, TopKFreq.Entry] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = mutable.HashMap.empty[String, TopKFreq.Entry]
    var i = 0
    while (i < n) {
      val kb = new Array[Byte](in.readInt())
      in.readFully(kb)
      buf(new String(kb, "UTF-8")) = TopKFreq.Entry(in.readLong(), in.readLong())
      i += 1
    }
    buf
  }
}

object TopKFreq {
  /** Mutable counter cell: estimated count + overestimate bound. */
  final case class Entry(var cnt: Long, var err: Long)

  val OutType: DataType = ArrayType(StructType(Seq(
    StructField("item", StringType, nullable = false),
    StructField("cnt", LongType, nullable = false),
    StructField("err", LongType, nullable = false))), containsNull = false)
}
