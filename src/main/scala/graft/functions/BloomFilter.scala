package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** Bloom-filter kernel shared by the aggregate (build) and scalar
  * (probe) expressions — one definition of the bit layout and the hash
  * family, so a filter built anywhere probes identically everywhere.
  *
  * Layout (BinaryType value): 4-byte big-endian `numHashes` header,
  * then the bit words as big-endian longs — self-describing, so
  * `bloom_might_contain` needs no parameters beyond the blob and can
  * probe filters persisted by an earlier job (the bloom is an index
  * artifact exactly like the MinHash index's signature table).
  *
  * Hash family: double hashing h_i = h1 + i·h2 over splitmix64
  * finalizer mixes of the (already xxhash64'd) item — the standard
  * Kirsch-Mitzenmacher construction, deterministic across partitions,
  * sessions, and epochs. Bit count is fixed at build time; OR-merge of
  * partial filters is exact, which is what makes the aggregate one
  * map-side pass + an O(bits) reduce instead of a distinct-shuffle. */
object BloomKernel {
  /** splitmix64 finalizer — avalanche mix for the double-hash bases. */
  def mix(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  def words(numBits: Int): Int = (numBits + 63) / 64

  /** Set item's bits in an unserialized word buffer. */
  def add(w: Array[Long], numBits: Int, numHashes: Int, item: Long): Unit = {
    val h1 = mix(item)
    val h2 = mix(h1) | 1L
    var i = 0
    while (i < numHashes) {
      val bit = java.lang.Long.remainderUnsigned(h1 + i * h2, numBits).toInt
      w(bit >>> 6) |= 1L << (bit & 63)
      i += 1
    }
  }

  def serialize(w: Array[Long], numHashes: Int): Array[Byte] = {
    val out = new Array[Byte](4 + 8 * w.length)
    out(0) = (numHashes >>> 24).toByte; out(1) = (numHashes >>> 16).toByte
    out(2) = (numHashes >>> 8).toByte; out(3) = numHashes.toByte
    var i = 0
    while (i < w.length) {
      val v = w(i); val o = 4 + 8 * i
      var j = 0
      while (j < 8) { out(o + j) = (v >>> (56 - 8 * j)).toByte; j += 1 }
      i += 1
    }
    out
  }

  def deserializeWords(b: Array[Byte]): Array[Long] = {
    val w = new Array[Long]((b.length - 4) / 8)
    var i = 0
    while (i < w.length) {
      val o = 4 + 8 * i
      var v = 0L
      var j = 0
      while (j < 8) { v = (v << 8) | (b(o + j) & 0xffL); j += 1 }
      w(i) = v
      i += 1
    }
    w
  }

  /** Probe a serialized filter. Zero-allocation (direct byte indexing);
    * called per row from both interpreted eval and generated code. */
  def mightContain(bloom: Array[Byte], item: Long): Boolean = {
    val numHashes = ((bloom(0) & 0xff) << 24) | ((bloom(1) & 0xff) << 16) |
      ((bloom(2) & 0xff) << 8) | (bloom(3) & 0xff)
    val numBits = (bloom.length - 4) * 8
    val h1 = mix(item)
    val h2 = mix(h1) | 1L
    var i = 0
    while (i < numHashes) {
      val bit = java.lang.Long.remainderUnsigned(h1 + i * h2, numBits).toInt
      // mirror add()'s word/bit indexing through the big-endian word
      // serialization: bit k of word w lives in byte (7 - k/8) of that
      // word's 8 serialized bytes, at in-byte position (k & 7) from LSB
      val k = bit & 63
      val o = 4 + 8 * (bit >>> 6) + (7 - (k >>> 3))
      if ((bloom(o) & (1 << (k & 7))) == 0) return false
      i += 1
    }
    true
  }
}

/** `bloom_build(itemHash, numBits, numHashes)` — build a Bloom filter
  * over a pre-hashed (bigint) item column as a Catalyst
  * TypedImperativeAggregate: each partition ORs bits into a local word
  * buffer, partials OR-merge, eval emits the self-describing blob
  * ([[BloomKernel]] layout).
  *
  * This is the engine's runtime-filter primitive: at 100 TB the
  * membership question "is this fingerprint in the stored corpus?"
  * must not shuffle the batch against the corpus — build the filter
  * once over corpus fingerprints (numBits/8 bytes of state, e.g.
  * 2^30 bits = 128 MB for ~10^8 docs at ~1% fpp), broadcast it, and
  * let the probe prune the batch BEFORE any join. False positives are
  * removed by an exact post-join ([[graft.operators.Dedup
  * .exactCrossDups]]); false negatives cannot occur, so the pruned
  * result is exact. */
case class BloomBuildAgg(child: Expression, numBits: Int, numHashes: Int,
                         override val mutableAggBufferOffset: Int = 0,
                         override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  require(numBits >= 64 && numBits % 64 == 0,
    "bloom_build numBits must be a positive multiple of 64")
  require(numHashes >= 1 && numHashes <= 16,
    "bloom_build numHashes must be in [1, 16]")

  override def children: Seq[Expression] = child :: Nil
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"bloom_build requires a bigint item column (pre-hash with " +
        s"xxhash64(...)), got ${dt.catalogString}")
  }
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType
  override def prettyName: String = "bloom_build"

  override def withNewMutableAggBufferOffset(newOffset: Int): BloomBuildAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BloomBuildAgg =
    copy(inputAggBufferOffset = newOffset)

  override def createAggregationBuffer(): Array[Long] =
    new Array[Long](BloomKernel.words(numBits))

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null)
      BloomKernel.add(buf, numBits, numHashes, v.asInstanceOf[Long])
    buf
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < buf.length) { buf(i) |= other(i); i += 1 }
    buf
  }

  override def eval(buf: Array[Long]): Any =
    BloomKernel.serialize(buf, numHashes)

  override def serialize(buf: Array[Long]): Array[Byte] =
    BloomKernel.serialize(buf, numHashes)
  override def deserialize(bytes: Array[Byte]): Array[Long] =
    BloomKernel.deserializeWords(bytes)
}

/** `bloom_might_contain(bloom, itemHash)` — probe a [[BloomBuildAgg]]
  * blob. Codegen'd to a static kernel call so the probe lives inside
  * whole-stage codegen on the scan side of the plan (the whole point:
  * the filter runs at full scan throughput, before any exchange). */
case class BloomMightContain(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, LongType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"bloom_might_contain requires (binary bloom, bigint itemHash), " +
          s"got (${l.catalogString}, ${r.catalogString})")
    }
  override def dataType: DataType = BooleanType
  override def prettyName: String = "bloom_might_contain"

  override def nullSafeEval(bloom: Any, item: Any): Any =
    BloomKernel.mightContain(bloom.asInstanceOf[Array[Byte]],
      item.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (b, i) =>
      s"graft.functions.BloomKernel.mightContain($b, $i)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
