package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Exact per-group top-k rows by score as a Catalyst
  * `TypedImperativeAggregate` — the "top 5 docs per domain by quality"
  * operator whose cost at 100 TB is the difference between a bounded
  * aggregation and a full per-group sort: the `row_number().over(...)`
  * formulation shuffles and SORTS every row of every group, while this
  * aggregate keeps at most 2k (score, id) pairs per group per
  * partition, pre-aggregates map-side, and shuffles only those — top-k
  * is exactly mergeable (the global top-k is contained in the union of
  * partial top-ks), so unlike [[TopKFreq]] there is no error term.
  *
  * Buffer discipline is TopKFreq's batch eviction: grow to 2k, one
  * sort trims back to k — amortized O(log k) per row. Ordering is
  * (score desc, id asc) with NaN ranked GREATEST — matching Spark's
  * window sort and the SQL oracle's `ORDER BY score DESC` NaN
  * semantics; the id tie-break makes the result deterministic under
  * any partitioning and reproducible in ANSI SQL
  * (`ROW_NUMBER() OVER (ORDER BY score DESC, id)` — the oracle).
  *
  * eval returns array<struct<score double, id bigint>> sorted
  * (score desc, id asc), length ≤ k. NULL score or id rows are
  * skipped (SQL aggregate convention). SQL surface: `topk_by(score,
  * id, k)` via GraftExtensions / ensureRegistered. */
case class TopKBy(score: Expression, id: Expression, k: Int,
                  override val mutableAggBufferOffset: Int = 0,
                  override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKBy.Buf] {

  require(k >= 1, "topk_by requires k >= 1")

  override def children: Seq[Expression] = score :: id :: Nil
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(score = newChildren(0), id = newChildren(1))
  override def checkInputDataTypes(): TypeCheckResult =
    (score.dataType, id.dataType) match {
      case (DoubleType, LongType) => TypeCheckResult.TypeCheckSuccess
      case (s, i) => TypeCheckResult.TypeCheckFailure(
        s"topk_by requires (double score, bigint id), got " +
          s"(${s.catalogString}, ${i.catalogString})")
    }
  override def nullable: Boolean = false
  override def dataType: DataType = TopKBy.OutType
  override def prettyName: String = "topk_by"

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKBy =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKBy =
    copy(inputAggBufferOffset = newOffset)

  override def createAggregationBuffer(): TopKBy.Buf = new TopKBy.Buf()

  /** (score desc, id asc) — the one ordering, used by trim and eval.
    * Descending compares via java.lang.Double.compare on the RAW score
    * (not a negation): Spark's window sort and the SQL oracle rank NaN
    * greatest, and negating flips NaN to NaN, which Scala's total
    * ordering on `-s` ascending would rank LAST — the opposite end. */
  private def sortInPlace(buf: TopKBy.Buf): Unit =
    buf.rows.sortInPlace()(new Ordering[(Double, Long)] {
      def compare(a: (Double, Long), b: (Double, Long)): Int = {
        val c = java.lang.Double.compare(b._1, a._1) // desc, NaN greatest
        if (c != 0) c else java.lang.Long.compare(a._2, b._2)
      }
    })

  private def trim(buf: TopKBy.Buf, force: Boolean): Unit =
    if (buf.rows.length > (if (force) k else 2 * k)) {
      sortInPlace(buf)
      buf.rows.takeInPlace(k)
    }

  override def update(buf: TopKBy.Buf, input: InternalRow): TopKBy.Buf = {
    val s = score.eval(input)
    val i = id.eval(input)
    if (s != null && i != null) {
      // normalize -0.0 → 0.0 so the boundary tie-break can't diverge
      // from engines that normalize floats before sorting
      val d = s.asInstanceOf[Double]
      buf.rows += ((if (d == 0.0d) 0.0d else d, i.asInstanceOf[Long]))
      trim(buf, force = false)
    }
    buf
  }

  override def merge(a: TopKBy.Buf, b: TopKBy.Buf): TopKBy.Buf = {
    a.rows ++= b.rows
    trim(a, force = true)
    a
  }

  override def eval(buf: TopKBy.Buf): Any = {
    trim(buf, force = true)
    sortInPlace(buf)
    new GenericArrayData(buf.rows.map { case (s, i) =>
      new GenericInternalRow(Array[Any](s, i))
    }.toArray[Any])
  }

  override def serialize(buf: TopKBy.Buf): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.rows.length)
    buf.rows.foreach { case (s, i) =>
      out.writeDouble(s); out.writeLong(i)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): TopKBy.Buf = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val buf = new TopKBy.Buf()
    val n = in.readInt()
    var j = 0
    while (j < n) {
      buf.rows += ((in.readDouble(), in.readLong()))
      j += 1
    }
    buf
  }
}

object TopKBy {
  /** Aggregation buffer: unsorted (score, id) pairs, ≤ 2k between
    * trims. */
  final class Buf {
    val rows: ArrayBuffer[(Double, Long)] = ArrayBuffer.empty
  }

  val OutType: DataType = ArrayType(StructType(Seq(
    StructField("score", DoubleType, nullable = false),
    StructField("id", LongType, nullable = false))), containsNull = false)
}
