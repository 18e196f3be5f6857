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
  * ICDT'05; merge rule after Agarwal et al., "Mergeable Summaries") as
  * a Catalyst `TypedImperativeAggregate` — the top-k frequent-items
  * operator whose SHUFFLE cost is O(capacity) per partition instead of
  * O(distinct items): the full (item, count) table never materializes
  * and never shuffles, which is the difference between "find the hot
  * tokens in 100 TB" being one bounded-memory pass and being a
  * vocabulary-sized aggregation.
  *
  * Implementation is the BATCH-EVICTION variant: a buffer grows to
  * 2·capacity counters, then one sort trims it back to the largest
  * `capacity` (count desc, item asc — deterministic), so eviction is
  * amortized O(log capacity) per row instead of the naive O(capacity)
  * scan per over-capacity insert — the difference matters exactly on
  * the high-cardinality streams the sketch exists for.
  *
  * Error accounting (all zero when capacity ≥ distinct items — the
  * oracle-gated exact mode):
  *  - `floor` = the largest count ever trimmed from this buffer. An
  *    unseen item inserts at (floor + 1, err = floor): its true count
  *    so far in this buffer is ≤ floor (anything larger would have
  *    survived every trim), so the estimate stays an overestimate
  *    within the buffer and `err` bounds the overcount — the classic
  *    space-saving invariant, batched.
  *  - `floorSum` = the sum over trims of that trim's largest evicted
  *    count. Cross-partial merges can lose an item's partial mass when
  *    an intermediate trim drops it; each such loss is ≤ that trim's
  *    largest evicted count, so the reported per-item
  *    `err = entry.err + floorSum` soundly bounds BOTH directions:
  *    true ∈ [cnt − floorSum, cnt + entry.err]. No count is ever
  *    reported as exact (err = 0) unless nothing was ever trimmed.
  *
  * eval returns the top `k` counters as array<struct<item, cnt, err>>
  * sorted by (cnt desc, item asc). SQL surface: `topk_freq(item, k,
  * capacity)` via GraftExtensions / ensureRegistered. */
case class TopKFreq(child: Expression, k: Int, capacity: Int,
                    override val mutableAggBufferOffset: Int = 0,
                    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKFreq.Buf] {

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

  override def createAggregationBuffer(): TopKFreq.Buf = new TopKFreq.Buf()

  /** Trim to `capacity` counters when the buffer exceeds 2·capacity
    * (or unconditionally when `force`), updating the error floors. */
  private def trim(buf: TopKFreq.Buf, force: Boolean): Unit =
    if (buf.m.size > (if (force) capacity else 2 * capacity)) {
      val keep = buf.m.toSeq.sortBy { case (key, e) => (-e.cnt, key) }
      var maxEvicted = 0L
      keep.drop(capacity).foreach { case (_, e) =>
        if (e.cnt > maxEvicted) maxEvicted = e.cnt
      }
      buf.m.clear()
      keep.take(capacity).foreach { case (key, e) => buf.m(key) = e }
      buf.floor = math.max(buf.floor, maxEvicted)
      buf.floorSum += maxEvicted
    }

  override def update(buf: TopKFreq.Buf, input: InternalRow): TopKFreq.Buf = {
    val v = child.eval(input)
    if (v != null) {
      val s = v.asInstanceOf[UTF8String].toString
      buf.m.get(s) match {
        case Some(e) => e.cnt += 1
        case None =>
          buf.m(s) = TopKFreq.Entry(buf.floor + 1, buf.floor)
          trim(buf, force = false)
      }
    }
    buf
  }

  override def merge(a: TopKFreq.Buf, b: TopKFreq.Buf): TopKFreq.Buf = {
    b.m.foreach { case (key, e) =>
      a.m.get(key) match {
        case Some(ae) => ae.cnt += e.cnt; ae.err += e.err
        case None => a.m(key) = TopKFreq.Entry(e.cnt, e.err)
      }
    }
    a.floor = math.max(a.floor, b.floor)
    a.floorSum += b.floorSum
    trim(a, force = true)
    a
  }

  override def eval(buf: TopKFreq.Buf): Any = {
    val top = buf.m.toSeq.sortBy { case (key, e) => (-e.cnt, key) }.take(k)
    new GenericArrayData(top.map { case (key, e) =>
      new GenericInternalRow(
        Array[Any](UTF8String.fromString(key), e.cnt, e.err + buf.floorSum))
    }.toArray[Any])
  }

  override def serialize(buf: TopKFreq.Buf): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeLong(buf.floor)
    out.writeLong(buf.floorSum)
    out.writeInt(buf.m.size)
    buf.m.foreach { case (key, e) =>
      val kb = key.getBytes("UTF-8")
      out.writeInt(kb.length); out.write(kb)
      out.writeLong(e.cnt); out.writeLong(e.err)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): TopKFreq.Buf = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val buf = new TopKFreq.Buf()
    buf.floor = in.readLong()
    buf.floorSum = in.readLong()
    val n = in.readInt()
    var i = 0
    while (i < n) {
      val kb = new Array[Byte](in.readInt())
      in.readFully(kb)
      buf.m(new String(kb, "UTF-8")) = TopKFreq.Entry(in.readLong(), in.readLong())
      i += 1
    }
    buf
  }
}

object TopKFreq {
  /** Mutable counter cell: estimated count + per-item overcount bound. */
  final case class Entry(var cnt: Long, var err: Long)

  /** Aggregation buffer: counters + the trim-error floors (see the
    * class doc). */
  final class Buf {
    val m: mutable.HashMap[String, Entry] = mutable.HashMap.empty
    var floor: Long = 0L
    var floorSum: Long = 0L
  }

  val OutType: DataType = ArrayType(StructType(Seq(
    StructField("item", StringType, nullable = false),
    StructField("cnt", LongType, nullable = false),
    StructField("err", LongType, nullable = false))), containsNull = false)
}
