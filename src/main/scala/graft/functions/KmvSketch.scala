package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** KMV ("k minimum values") distinct-value sketch (Bar-Yossef et al.,
  * RANDOM'02; the bottom-k/theta formulation popularized by Apache
  * DataSketches): keep the k smallest DISTINCT 63-bit hash values of
  * the items. What HLL (see [[graft.operators.Sketches]]) cannot do
  * and KMV can is SET OPERATIONS — two sketches support intersection
  * and union ESTIMATES, because each sketch is a uniform sample of its
  * set's hash values below a known threshold θ (the kth minimum):
  * |A∩B| ≈ |{v ∈ A.values ∩ B.values : v < θ}| / (θ / 2^63) with
  * θ = min(θ_A, θ_B). With fewer than k values seen the sketch IS the
  * full hash set and every estimate is exact — the sketch degrades
  * gracefully into exact mode on small groups.
  *
  * Scale shape: the aggregation buffer is a bounded size-k ordered set
  * (k·8 bytes, k ≈ 512 → 4 KB), partial aggregation is map-side (each
  * partition ships at most k longs per group), merges are
  * insert-into-bounded-set — associative, commutative, and
  * order-independent, so epoch folds are bit-identical to one-shot
  * builds no matter the merge tree. Estimates are therefore
  * deterministic for a given input SET: a bounded-relative-error gate
  * can pin within-tolerance flags against an exact oracle.
  *
  * Two variants share the buffer: [[KmvAgg]] ingests pre-hashed longs
  * (`kmv_agg(xxhash64(key), k)` — the top 1 bit is masked off so values
  * are uniform in [0, 2^63)), [[KmvUnionAgg]] ingests already-built
  * sketch arrays (`kmv_union_agg(kmv, k)` — the one-pass fold of a
  * table of persisted epochs). SQL surface via GraftExtensions /
  * ensureRegistered.
  */
abstract class KmvAggBase extends TypedImperativeAggregate[KmvAggBase.Buf] {

  def child: Expression
  def k: Int

  override def children: Seq[Expression] = child :: Nil
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def createAggregationBuffer(): KmvAggBase.Buf =
    new KmvAggBase.Buf(k)

  override def merge(a: KmvAggBase.Buf, b: KmvAggBase.Buf): KmvAggBase.Buf = {
    val it = b.set.iterator()
    while (it.hasNext) a.insert(it.next())
    a
  }

  override def eval(buf: KmvAggBase.Buf): Any = {
    val out = new Array[Any](buf.set.size)
    val it = buf.set.iterator()
    var i = 0
    while (it.hasNext) { out(i) = it.next().longValue(); i += 1 }
    new GenericArrayData(out) // TreeSet iterates ascending — sorted minima
  }

  override def serialize(buf: KmvAggBase.Buf): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.set.size)
    val it = buf.set.iterator()
    while (it.hasNext) out.writeLong(it.next().longValue())
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): KmvAggBase.Buf = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val buf = new KmvAggBase.Buf(k)
    val n = in.readInt()
    var i = 0
    while (i < n) { buf.insert(in.readLong()); i += 1 }
    buf
  }
}

object KmvAggBase {
  /** Bounded ordered set of the k smallest distinct values seen. */
  final class Buf(k: Int) {
    val set = new java.util.TreeSet[java.lang.Long]()
    def insert(v: Long): Unit =
      if (set.size < k) { set.add(v): Unit }
      else if (v < set.last()) { if (set.add(v)) { set.pollLast(): Unit } }
  }
}

/** `kmv_agg(hash, k)` — sketch a stream of pre-hashed bigints (mask to
  * 63 bits internally; feed `xxhash64(key)`). */
case class KmvAgg(child: Expression, k: Int,
                  override val mutableAggBufferOffset: Int = 0,
                  override val inputAggBufferOffset: Int = 0)
  extends KmvAggBase {

  require(k >= 2, "kmv_agg requires k >= 2")

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"kmv_agg requires a bigint hash column (use xxhash64), got ${dt.catalogString}")
  }
  override def prettyName: String = "kmv_agg"
  override def withNewMutableAggBufferOffset(newOffset: Int): KmvAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvAgg =
    copy(inputAggBufferOffset = newOffset)

  override def update(buf: KmvAggBase.Buf, input: InternalRow): KmvAggBase.Buf = {
    val v = child.eval(input)
    if (v != null) buf.insert(v.asInstanceOf[Long] & Long.MaxValue)
    buf
  }
}

/** `kmv_union_agg(kmv, k)` — fold already-built sketch arrays (values
  * are already 63-bit); the one-pass multi-epoch fold. Correct because
  * a set's k minima below θ are a superset of the union's minima
  * contributed by that set. */
case class KmvUnionAgg(child: Expression, k: Int,
                       override val mutableAggBufferOffset: Int = 0,
                       override val inputAggBufferOffset: Int = 0)
  extends KmvAggBase {

  require(k >= 2, "kmv_union_agg requires k >= 2")

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"kmv_union_agg requires array<bigint> sketches, got ${dt.catalogString}")
  }
  override def prettyName: String = "kmv_union_agg"
  override def withNewMutableAggBufferOffset(newOffset: Int): KmvUnionAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvUnionAgg =
    copy(inputAggBufferOffset = newOffset)

  override def update(buf: KmvAggBase.Buf, input: InternalRow): KmvAggBase.Buf = {
    val v = child.eval(input)
    if (v != null) {
      val arr = v.asInstanceOf[ArrayData]
      var i = 0
      val n = arr.numElements()
      while (i < n) { buf.insert(arr.getLong(i)); i += 1 }
    }
    buf
  }
}
