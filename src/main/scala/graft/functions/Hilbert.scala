package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block.BlockHelper
import org.apache.spark.sql.types.{DataType, LongType}

/** N-dimensional Hilbert-curve index — the clustering key for
  * [[graft.sinks.ParquetSink.writeZOrdered]]'s multi-column layouts.
  *
  * Why Hilbert and not Morton for the LAYOUT key: a layout writer cuts
  * the curve into `numFiles` contiguous equal-mass segments, and a
  * file's skipping envelope is the bounding box of its segment. The
  * Morton curve takes a long-range jump at every high-bit transition,
  * so the O(log numFiles) segments that straddle those transitions get
  * near-full-domain envelopes and defeat skipping for ANY predicate —
  * measured directly in SinksSpec, they tripled the candidate count of
  * the ideal tiling. The Hilbert curve's defining property is that
  * consecutive cells are always axis-neighbors (adjacency is spec-
  * asserted exhaustively), so every contiguous segment is a compact
  * blob and every file's envelope is ~a tile regardless of where the
  * equal-mass cuts land. Morton stays available as the cheaper
  * [[graft.sinks.ParquetSink.zValueN]] column formula; Hilbert is a
  * codegen'd Catalyst expression because the coordinate transform is
  * an inherently sequential bit walk, not a mask cascade.
  *
  * Encoding is Skilling's transpose algorithm ("Programming the
  * Hilbert curve", AIP Conf. Proc. 707, 2004 — public domain): undo
  * the per-level rotations/reflections in place, Gray-encode across
  * dimensions, then interleave the transposed bits into one long.
  */
object Hilbert {

  /** Map `n` coordinates (each in `[0, 2^bits)`; masked to that range)
    * to their Hilbert index in `[0, 2^(n*bits))`. Pure long
    * arithmetic; called from both interpreted eval and generated code. */
  def encode(x: Array[Long], bits: Int): Long = {
    val n = x.length
    val mask = (1L << bits) - 1
    var i = 0
    while (i < n) { x(i) &= mask; i += 1 }
    // inverse-undo the rotations level by level, high bit downward
    var q = 1L << (bits - 1)
    while (q > 1) {
      val p = q - 1
      i = 0
      while (i < n) {
        if ((x(i) & q) != 0) x(0) ^= p
        else { val t = (x(0) ^ x(i)) & p; x(0) ^= t; x(i) ^= t }
        i += 1
      }
      q >>= 1
    }
    // Gray-encode across dimensions
    i = 1
    while (i < n) { x(i) ^= x(i - 1); i += 1 }
    var t = 0L
    q = 1L << (bits - 1)
    while (q > 1) {
      if ((x(n - 1) & q) != 0) t ^= q - 1
      q >>= 1
    }
    i = 0
    while (i < n) { x(i) ^= t; i += 1 }
    // interleave the transpose: bit j of x(i) lands at j*n + (n-1-i),
    // so dimension 0 owns the most-significant bit of each level
    var out = 0L
    var j = 0
    while (j < bits) {
      i = 0
      while (i < n) {
        out |= ((x(i) >>> j) & 1L) << (j * n + (n - 1 - i))
        i += 1
      }
      j += 1
    }
    out
  }

  /** Register `hilbert_index(bits, c0, c1, …)` in the session registry
    * (idempotent) — Spark 4 Columns are plan-node based, so custom
    * Expressions enter plans through the registry + call_function. */
  def ensureRegistered(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "hilbert_index", exprs => {
        val bits = exprs.head.eval(null) match {
          case i: Int => i
          case other => throw new IllegalArgumentException(
            s"hilbert_index bits must be an integer literal, got $other")
        }
        HilbertIndex(exprs.tail, bits)
      }, "built-in")
}

/** `hilbert_index(bits, c0 … cn-1)`: Hilbert index of n long bucket
  * coordinates at `bits` bits per dimension. NULL if any coordinate
  * is NULL. */
case class HilbertIndex(coords: Seq[Expression], bits: Int)
    extends Expression {

  override def children: Seq[Expression] = coords
  override def nullable: Boolean = coords.exists(_.nullable)
  override def dataType: DataType = LongType
  override def prettyName: String = "hilbert_index"

  override def checkInputDataTypes(): TypeCheckResult = {
    if (coords.size < 2)
      TypeCheckResult.TypeCheckFailure("hilbert_index needs >= 2 coordinates")
    else if (bits < 1 || coords.size * bits > 62)
      TypeCheckResult.TypeCheckFailure(
        s"hilbert_index requires 1 <= n*bits <= 62 (n=${coords.size}, bits=$bits)")
    else if (!coords.forall(_.dataType == LongType))
      TypeCheckResult.TypeCheckFailure(
        s"hilbert_index coordinates must be BIGINT, got " +
          coords.map(_.dataType.simpleString).mkString(", "))
    else TypeCheckResult.TypeCheckSuccess
  }

  override def eval(input: InternalRow): Any = {
    val xs = new Array[Long](coords.size)
    var i = 0
    while (i < coords.size) {
      val v = coords(i).eval(input)
      if (v == null) return null
      xs(i) = v.asInstanceOf[Long]
      i += 1
    }
    Hilbert.encode(xs, bits)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val evals = coords.map(_.genCode(ctx))
    val xs = ctx.freshName("xs")
    val anyNull =
      if (nullable) evals.map(_.isNull.toString).mkString(" || ") else "false"
    val fills = evals.zipWithIndex
      .map { case (e, i) => s"$xs[$i] = ${e.value};" }.mkString("\n")
    ev.copy(code =
      code"""
        |${evals.map(_.code).reduce(_ + _)}
        |boolean ${ev.isNull} = $anyNull;
        |long ${ev.value} = 0L;
        |if (!${ev.isNull}) {
        |  long[] $xs = new long[${coords.size}];
        |  $fills
        |  ${ev.value} = graft.functions.Hilbert.encode($xs, $bits);
        |}
      """.stripMargin)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(coords = newChildren)
}
