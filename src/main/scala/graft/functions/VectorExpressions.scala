package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, BooleanType, DataType, Decimal, DecimalType, DoubleType, FloatType, LongType}

/** Custom Catalyst expression for the embedding hot path (SURVEY §2.9
  * policy: native Expression with doGenCode beats a Scala UDF).
  *
  * `DotProductF32(a, b)` — order-stable left-fold dot product of two
  * float32 arrays in double precision: exactly `Σ (double)a[i] * b[i]`,
  * bit-identical to the `aggregate(zip_with(...))` formulation it
  * replaces (and to the DuckDB oracle's list_reduce), but ~10× faster:
  * whole-stage codegen emits a tight primitive loop with no per-element
  * lambda invocation or boxing.
  */
case class DotProductF32(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(dt: DataType): Boolean = dt match {
      case ArrayType(FloatType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"dot_f32 requires array<float> inputs, got ${left.dataType} / ${right.dataType}")
  }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "dot_f32"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += x.getFloat(i).toDouble * y.getFloat(i).toDouble
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += (double) $a.getFloat($i) * (double) $b.getFloat($i);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** `SrpSigsF32(v, nBands, bandBits, dim)` — per-row signed-random-
  * projection LSH signatures for a float32 embedding: quantize to
  * ⌊1000·x⌋ integers, sign nBands·bandBits deterministic hyperplane
  * dots (see [[VectorExpressions.srpHyperplanes]]), pack bits LSB-first
  * into one long per band. Integer arithmetic end to end, so values are
  * bit-identical to the higher-order-function formulation AND the
  * ANSI-SQL oracle — but codegen emits tight primitive loops (~10×
  * faster than the interpreted nested-lambda stack it replaces).
  */
case class SrpSigsF32(child: Expression, nBands: Int, bandBits: Int, dim: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"srp_sigs_f32 requires array<float> input, got $dt")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "srp_sigs_f32"

  @transient private lazy val hp: Array[Long] =
    VectorExpressions.srpHyperplanes(nBands * bandBits, dim).flatten.toArray

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val n = math.min(v.numElements(), dim)
    val q = new Array[Long](dim)
    var d = 0
    while (d < n) {
      q(d) = math.floor(v.getFloat(d).toDouble * 1000.0).toLong
      d += 1
    }
    val nBits = nBands * bandBits
    val sigs = new Array[Long](nBands)
    var j = 0
    while (j < nBits) {
      var s = 0L
      val off = j * dim
      var dd = 0
      while (dd < dim) { s += q(dd) * hp(off + dd); dd += 1 }
      if (s >= 0) sigs(j / bandBits) |= 1L << (j % bandBits)
      j += 1
    }
    new GenericArrayData(sigs)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val hpRef = ctx.addReferenceObj("srpHp", hp, "long[]")
    nullSafeCodeGen(ctx, ev, v => {
      val q = ctx.freshName("q")
      val sigs = ctx.freshName("sigs")
      val n = ctx.freshName("n")
      val d = ctx.freshName("d")
      val j = ctx.freshName("j")
      val s = ctx.freshName("s")
      val dd = ctx.freshName("dd")
      val off = ctx.freshName("off")
      s"""
         |int $n = java.lang.Math.min($v.numElements(), $dim);
         |long[] $q = new long[$dim];
         |for (int $d = 0; $d < $n; $d++) {
         |  $q[$d] = (long) java.lang.Math.floor((double) $v.getFloat($d) * 1000.0);
         |}
         |long[] $sigs = new long[$nBands];
         |for (int $j = 0; $j < ${nBands * bandBits}; $j++) {
         |  long $s = 0L;
         |  int $off = $j * $dim;
         |  for (int $dd = 0; $dd < $dim; $dd++) {
         |    $s += $q[$dd] * $hpRef[$off + $dd];
         |  }
         |  if ($s >= 0) $sigs[$j / $bandBits] |= 1L << ($j % $bandBits);
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($sigs);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `SortedIntersectCount(a, b)` — number of DISTINCT common values of
  * two ascending-sorted `array<bigint>` columns: a primitive merge walk,
  * O(|a|+|b|) with zero allocation. Replaces
  * `size(array_intersect(a, b))` on the dedup verify hot path, where the
  * hash-set build per row (millions of candidate pairs × hundreds of
  * boxed longs) dominates; set semantics are preserved by skipping equal
  * runs, so results match array_intersect exactly on any sorted input.
  * Callers sort once at the per-doc aggregate (`sort_array`), amortized
  * over every candidate pair the doc participates in.
  *
  * INPUT CONTRACT (enforced where possible): the function is also
  * registered for SQL callers via GraftExtensions, so the analysis-time
  * check rejects arrays that may contain null elements — `getLong` on a
  * null slot would silently read garbage (`sort_array(collect_list(x))`,
  * the internal call shape, always satisfies this: collect_list drops
  * nulls). ASCENDING SORT of both inputs cannot be checked at analysis
  * time and is the caller's obligation; an unsorted input miscounts. */
case class SortedIntersectCount(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(dt: DataType): Boolean = dt match {
      case ArrayType(LongType, containsNull) => !containsNull
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"sorted_intersect_count requires array<bigint> inputs with " +
        s"non-nullable elements (got ${left.dataType} / " +
        s"${right.dataType}); wrap nullable-element arrays in " +
        s"array_compact(...) and pre-sort with sort_array(...)")
  }
  override def dataType: DataType = org.apache.spark.sql.types.IntegerType
  override def prettyName: String = "sorted_intersect_count"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val (na, nb) = (x.numElements(), y.numElements())
    var ia = 0; var ib = 0; var c = 0
    while (ia < na && ib < nb) {
      val va = x.getLong(ia); val vb = y.getLong(ib)
      if (va < vb) ia += 1
      else if (va > vb) ib += 1
      else {
        c += 1
        while (ia < na && x.getLong(ia) == va) ia += 1
        while (ib < nb && y.getLong(ib) == va) ib += 1
      }
    }
    c
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val na = ctx.freshName("na"); val nb = ctx.freshName("nb")
      val ia = ctx.freshName("ia"); val ib = ctx.freshName("ib")
      val va = ctx.freshName("va"); val vb = ctx.freshName("vb")
      val c = ctx.freshName("c")
      s"""
         |int $na = $a.numElements();
         |int $nb = $b.numElements();
         |int $ia = 0, $ib = 0, $c = 0;
         |while ($ia < $na && $ib < $nb) {
         |  long $va = $a.getLong($ia);
         |  long $vb = $b.getLong($ib);
         |  if ($va < $vb) { $ia++; }
         |  else if ($va > $vb) { $ib++; }
         |  else {
         |    $c++;
         |    while ($ia < $na && $a.getLong($ia) == $va) $ia++;
         |    while ($ib < $nb && $b.getLong($ib) == $va) $ib++;
         |  }
         |}
         |${ev.value} = $c;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** `QuantizeI8(v)` — symmetric max-abs int8 quantization of an
  * `array<float>` in ONE pass: maxAbs loop, then per-element
  * `round(x / (maxAbs/127))` with Spark's own HALF_UP double rounding
  * (BigDecimal semantics, byte-identical to
  * `transform(v, x -> round(x / scale, 0).cast("tinyint"))`).
  *
  * Exists because the declarative formulation is quadratic in
  * disguise: `withColumn(scale, …array_max…)` followed by
  * `transform(v, x -> x / col(scale))` lets CollapseProject inline the
  * scale's array_max subtree INSIDE the element lambda — O(dim²) per
  * row — and predicate pushdown then duplicates the whole tree again
  * into any filter over the quantized vector. The expression is
  * opaque to both rewrites and costs exactly 2·dim element reads. */
case class QuantizeI8(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"quantize_i8 requires array<float>, got ${dt.catalogString}")
  }
  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.ByteType,
      containsNull = child.dataType.asInstanceOf[ArrayType].containsNull)
  override def prettyName: String = "quantize_i8"

  override def nullSafeEval(v: Any): Any =
    VectorExpressions.quantizeI8Kernel(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.VectorExpressions.quantizeI8Kernel($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `PqEncode(vec, books)` — product-quantization encoding as one
  * codegen kernel call: per subspace j, the index of the L2-nearest
  * centroid (strict-< argmin — first index on ties, matching
  * `array_position(dists, array_min(dists))`). `books` must be a
  * FOLDABLE nested literal (m × k × dsub); it is evaluated once and
  * shipped to generated code as a reference object, so the per-row
  * cost is exactly the m·k·dsub distance arithmetic — no nested
  * lambda frames, no per-row literal traversal, and (the real point)
  * no CollapseProject inlining of the encode tree into downstream
  * consumers. Distance sums run in element order: bit-identical to
  * the `aggregate(zip_with(...))` left fold it replaces. Contract:
  * `vec.length ≥ m·dsub` (the trainer's own layout). */
case class PqEncode(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      // the codebook's SHAPE is validated too: foldability alone lets a
      // wrong-typed literal (scalar, or wrong nesting depth) through
      // analysis only to ClassCastException inside parsedBooks at runtime
      case (ArrayType(FloatType, _),
            ArrayType(ArrayType(ArrayType(DoubleType, _), _), _))
          if right.foldable =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"pq_encode requires (array<float> vec, foldable " +
          s"array<array<array<double>>> codebook literal), got " +
          s"(${l.catalogString}, ${r.catalogString}" +
          (if (!right.foldable) ", non-foldable)" else ")"))
    }
  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.IntegerType, containsNull = false)
  override def prettyName: String = "pq_encode"

  @transient private lazy val parsedBooks: Array[Array[Array[Double]]] = {
    val m = right.eval(null).asInstanceOf[ArrayData]
    Array.tabulate(m.numElements()) { j =>
      val book = m.getArray(j)
      Array.tabulate(book.numElements()) { c =>
        book.getArray(c).toDoubleArray()
      }
    }
  }

  override def nullSafeEval(v: Any, unused: Any): Any =
    VectorExpressions.pqEncodeKernel(parsedBooks, v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pqBooks", parsedBooks, "double[][][]")
    nullSafeCodeGen(ctx, ev, (v, _) =>
      s"${ev.value} = graft.functions.VectorExpressions.pqEncodeKernel($ref, $v);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** `AdcSum(codes, table)` — asymmetric-distance lookup sum:
  * `Σ_j table[j][codes(j)]`, the per-candidate scoring step of an ADC
  * scan (and, with a constant norm² table, the reconstruction norm).
  * One codegen loop of m array reads per row — replaces
  * `aggregate(zip_with(codes, table, element_at))`, bit-identical
  * (same left-fold order over doubles). */
case class AdcSum(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(org.apache.spark.sql.types.IntegerType, _),
            ArrayType(ArrayType(DoubleType, _), _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"adc_sum requires (array<int> codes, array<array<double>> table), " +
          s"got (${l.catalogString}, ${r.catalogString})")
    }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "adc_sum"

  override def nullSafeEval(c: Any, t: Any): Any =
    VectorExpressions.adcSumKernel(c.asInstanceOf[ArrayData],
      t.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (c, t) =>
      s"graft.functions.VectorExpressions.adcSumKernel($c, $t)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** `DotProductI8(a, b)` — integer dot product of two `array<tinyint>`
  * (int8-quantized) vectors as one primitive codegen loop returning
  * `Σ (long)a_i·b_i` — exact integer arithmetic, so it is bit-identical
  * to the `aggregate(zip_with(...))` formulation it replaces (integer
  * addition is associative; no summation-order hazard) and to any
  * ANSI-SQL oracle. Exists because the HOF form allocates a lambda
  * frame per element: on a brute-force scoring pass (|queries|·|corpus|
  * pairs × dim elements) that overhead dominates the actual multiplies. */
case class DotProductI8(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(dt: DataType): Boolean = dt match {
      case ArrayType(org.apache.spark.sql.types.ByteType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"dot_i8 requires array<tinyint> inputs, got " +
        s"${left.dataType.catalogString} / ${right.dataType.catalogString}")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "dot_i8"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var i = 0; var acc = 0L
    while (i < n) { acc += x.getByte(i).toLong * y.getByte(i).toLong; i += 1 }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n"); val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |long $acc = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += (long) $a.getByte($i) * (long) $b.getByte($i);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** `SortedPairsDot(a, b)` — sparse integer dot product of two
  * key-ascending `array<struct<k: bigint, w: bigint>>` vectors: a
  * primitive merge walk summing `w_a · w_b` over matching keys,
  * O(|a|+|b|) per pair with zero allocation — the sparse-vector analog
  * of [[SortedIntersectCount]], built for the TF-IDF verify hot path
  * where millions of candidate pairs × hundreds of terms would make a
  * posting-list re-join or a per-row hash map the bottleneck.
  *
  * Integer weights are the point: the dot (and the norms the caller
  * compares against) stay in exact integer arithmetic, so a similarity
  * threshold decides identically in Spark and any ANSI-SQL oracle — no
  * float summation-order ulps near the boundary. Keys must be unique
  * and ascending per vector (the caller's `array_sort(collect_list)`
  * over per-doc-distinct terms guarantees it); equal-key runs are not
  * skipped, so duplicate keys would double-count.
  *
  * Returns Decimal(38,0), accumulated overflow-safe: per-term products
  * stay in the primitive long fast path while both weights are below
  * √Long.MaxValue (the realistic tf·idf_q range), and the running sum
  * spills to BigInteger exactly when a long add would wrap — so a
  * production-scale corpus (where Σ w_a·w_b can pass 2⁶³) gets the
  * exact dot instead of a silently wrapped one. */
case class SortedPairsDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(dt: DataType): Boolean = dt match {
      case ArrayType(s: org.apache.spark.sql.types.StructType, _) =>
        s.fields.length == 2 && s.fields.forall(_.dataType == LongType)
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"sorted_pairs_dot requires array<struct<bigint, bigint>> inputs, " +
        s"got ${left.dataType.catalogString} / ${right.dataType.catalogString}")
  }
  override def dataType: DataType = DecimalType(38, 0)
  override def prettyName: String = "sorted_pairs_dot"

  override def nullSafeEval(a: Any, b: Any): Any =
    VectorExpressions.sortedPairsDotKernel(
      a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.VectorExpressions.sortedPairsDotKernel($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** `cosine_gate(dot, ssa, ssb, pct)` — the exact integer cosine
  * threshold decision `10000·dot² ≥ pct²·ssa·ssb`, evaluated in
  * arbitrary-precision integers. Exists because the Decimal(38,0)
  * formulation has a hard 38-digit ceiling: at production weight
  * scales `10000·dot²` can exceed it, and in non-ANSI mode the
  * overflowed product is NULL — the filter then silently DROPS
  * qualifying pairs. BigInteger has no ceiling, so the gate decides
  * identically at any scale (DuckDB's HUGEINT oracle overflows loudly,
  * never silently, so divergence would otherwise appear exactly at the
  * large-corpus scale the operator targets). Cost: three BigInteger
  * multiplies per CANDIDATE pair — bounded by the df cap, not the
  * corpus. */
case class CosineGateQ(dot: Expression, ssa: Expression, ssb: Expression,
                       pct: Int)
    extends org.apache.spark.sql.catalyst.expressions.TernaryExpression {

  override def first: Expression = dot
  override def second: Expression = ssa
  override def third: Expression = ssb

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(dt: DataType): Boolean = dt match {
      case _: DecimalType | LongType => true
      case _ => false
    }
    if (Seq(dot, ssa, ssb).forall(e => ok(e.dataType)) &&
        pct >= 1 && pct <= 99)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"cosine_gate requires decimal/bigint (dot, ssa, ssb) and pct in " +
        s"[1,99], got (${dot.dataType.catalogString}, " +
        s"${ssa.dataType.catalogString}, ${ssb.dataType.catalogString}, $pct)")
  }
  override def dataType: DataType = BooleanType
  override def prettyName: String = "cosine_gate"

  private def toBig(v: Any): java.math.BigInteger = v match {
    case d: Decimal => d.toJavaBigDecimal.toBigIntegerExact
    case l: java.lang.Long => java.math.BigInteger.valueOf(l)
    case l: Long => java.math.BigInteger.valueOf(l)
  }

  override def nullSafeEval(d: Any, a: Any, b: Any): Any =
    VectorExpressions.cosineGateKernel(toBig(d), toBig(a), toBig(b), pct)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    def conv(e: Expression, v: String): String = e.dataType match {
      case _: DecimalType => s"$v.toJavaBigDecimal().toBigIntegerExact()"
      case _ => s"java.math.BigInteger.valueOf($v)"
    }
    nullSafeCodeGen(ctx, ev, (d, a, b) =>
      s"""${ev.value} = graft.functions.VectorExpressions.cosineGateKernel(
         |  ${conv(dot, d)}, ${conv(ssa, a)}, ${conv(ssb, b)}, $pct);
       """.stripMargin)
  }

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression,
      newThird: Expression): Expression =
    copy(dot = newFirst, ssa = newSecond, ssb = newThird)
}

object VectorExpressions {
  import org.apache.spark.sql.SparkSession
  import org.apache.spark.sql.functions.call_function

  /** Deterministic SRP hyperplanes: component (j, d) =
    * hash32("j_d") % 2001 − 1000 ∈ [−1000, 1000], hash32 = first 8 md5
    * hex digits as an integer — generated arithmetically so the DuckDB
    * oracle re-derives the exact same planes from SQL. */
  def srpHyperplanes(nBits: Int, dim: Int): Seq[Seq[Long]] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    (0 until nBits).map { j =>
      (0 until dim).map { d =>
        val hex = md.digest(s"${j}_${d}".getBytes("UTF-8"))
          .take(4).map("%02x".format(_)).mkString
        java.lang.Long.parseLong(hex, 16) % 2001 - 1000
      }
    }
  }

  private def intArg(fn: String, e: Expression, name: String): Int =
    e.eval(null) match {
      case i: Int => i
      case other => throw new IllegalArgumentException(
        s"$fn $name must be an integer literal, got $other")
    }

  /** Register dot_f32 / srp_sigs_f32 in the session's function registry
    * (idempotent). Spark 4 Columns are plan-node based, so custom
    * Expressions enter plans through the registry + call_function — the
    * public path. */
  def ensureRegistered(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "dot_f32", exprs => DotProductF32(exprs(0), exprs(1)), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "srp_sigs_f32", exprs => SrpSigsF32(exprs(0),
        intArg("srp_sigs_f32", exprs(1), "nBands"),
        intArg("srp_sigs_f32", exprs(2), "bandBits"),
        intArg("srp_sigs_f32", exprs(3), "dim")), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "sorted_intersect_count",
      exprs => SortedIntersectCount(exprs(0), exprs(1)), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "jaro_winkler", exprs => JaroWinkler(exprs(0), exprs(1)), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "unicode_normalize", exprs => UnicodeNormalize(exprs(0),
        exprs(1).eval(null) match {
          case s: org.apache.spark.unsafe.types.UTF8String => s.toString
          case other => throw new IllegalArgumentException(
            s"unicode_normalize form must be a string literal, got $other")
        }), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "topk_freq", exprs => TopKFreq(exprs(0),
        intArg("topk_freq", exprs(1), "k"),
        intArg("topk_freq", exprs(2), "capacity")), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "topk_by", exprs => TopKBy(exprs(0), exprs(1),
        intArg("topk_by", exprs(2), "k")), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "bloom_build", exprs => BloomBuildAgg(exprs(0),
        intArg("bloom_build", exprs(1), "numBits"),
        intArg("bloom_build", exprs(2), "numHashes")), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "bloom_might_contain",
      exprs => BloomMightContain(exprs(0), exprs(1)), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "sorted_pairs_dot",
      exprs => SortedPairsDot(exprs(0), exprs(1)), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "cosine_gate", exprs => CosineGateQ(exprs(0), exprs(1), exprs(2),
        intArg("cosine_gate", exprs(3), "pct")), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "dot_i8", exprs => DotProductI8(exprs(0), exprs(1)), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "quantize_i8", exprs => QuantizeI8(exprs(0)), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "pq_encode", exprs => PqEncode(exprs(0), exprs(1)), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "adc_sum", exprs => AdcSum(exprs(0), exprs(1)), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "kmv_agg", exprs => KmvAgg(exprs(0),
        intArg("kmv_agg", exprs(1), "k")), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "kmv_union_agg", exprs => KmvUnionAgg(exprs(0),
        intArg("kmv_union_agg", exprs(1), "k")), "built-in")
  }

  /** Column wrapper for PqEncode (books must be a foldable literal). */
  def pqEncode(vec: Column, books: Column): Column =
    call_function("pq_encode", vec, books)

  /** Column wrapper for AdcSum. */
  def adcSum(codes: Column, table: Column): Column =
    call_function("adc_sum", codes, table)

  /** Column wrapper for DotProductI8 (array<tinyint> inputs). */
  def dotI8(a: Column, b: Column): Column = call_function("dot_i8", a, b)

  /** Column wrapper for QuantizeI8 (array<float> input). */
  def quantizeI8(v: Column): Column = call_function("quantize_i8", v)

  /** [[PqEncode]] kernel: nearest-centroid index per subspace, strict-<
    * argmin (first on ties), element-order distance sums. */
  def pqEncodeKernel(books: Array[Array[Array[Double]]],
                     vec: ArrayData): ArrayData = {
    val m = books.length
    val out = new Array[Any](m)
    var j = 0
    while (j < m) {
      val book = books(j)
      val dsub = if (book.isEmpty) 0 else book(0).length
      val off = j * dsub
      var best = 0
      var bestD = Double.PositiveInfinity
      var c = 0
      while (c < book.length) {
        val cent = book(c)
        var d = 0.0
        var i = 0
        while (i < dsub) {
          val x = vec.getFloat(off + i).toDouble - cent(i)
          d += x * x
          i += 1
        }
        if (d < bestD) { bestD = d; best = c }
        c += 1
      }
      out(j) = best
      j += 1
    }
    new GenericArrayData(out)
  }

  /** [[AdcSum]] kernel: Σ_j table[j][codes(j)], left-fold order. */
  def adcSumKernel(codes: ArrayData, table: ArrayData): Double = {
    val m = codes.numElements()
    var acc = 0.0
    var j = 0
    while (j < m) {
      acc += table.getArray(j).getDouble(codes.getInt(j))
      j += 1
    }
    acc
  }

  /** [[QuantizeI8]] kernel, shared by interpreted eval and generated
    * code. Mirrors the declarative semantics element for element:
    * maxAbs over FLOAT abs/max (then widened), scale = maxAbs/127 (1.0
    * when zero/absent), HALF_UP BigDecimal rounding (Spark's `round`),
    * null elements pass through, non-finite elements → null. */
  def quantizeI8Kernel(v: ArrayData): ArrayData = {
    val n = v.numElements()
    var maxAbs = 0.0f
    var i = 0
    while (i < n) {
      if (!v.isNullAt(i)) {
        val a = math.abs(v.getFloat(i))
        if (a > maxAbs) maxAbs = a
      }
      i += 1
    }
    val scale = if (maxAbs == 0.0f) 1.0 else maxAbs.toDouble / 127.0
    val out = new Array[Any](n)
    i = 0
    while (i < n) {
      out(i) =
        if (v.isNullAt(i)) null
        else {
          val d = v.getFloat(i).toDouble / scale
          if (java.lang.Double.isFinite(d))
            java.math.BigDecimal.valueOf(d)
              .setScale(0, java.math.RoundingMode.HALF_UP)
              .doubleValue().toByte
          else null
        }
      i += 1
    }
    new GenericArrayData(out)
  }

  /** [[SortedPairsDot]] kernel: merge walk over two key-ascending
    * sparse vectors. Per-term products take the primitive-long fast
    * path while both |w| < √Long.MaxValue; the running sum detects a
    * would-be long wrap with the sign trick and spills the accumulated
    * prefix to BigInteger — allocation happens only past 2⁶², i.e.
    * never on small corpora and rarely per pair on large ones. */
  def sortedPairsDotKernel(x: ArrayData, y: ArrayData): Decimal = {
    val na = x.numElements(); val nb = y.numElements()
    var ia = 0; var ib = 0
    var acc = 0L
    var big: java.math.BigInteger = null
    val safe = 3037000499L // floor(sqrt(Long.MaxValue))
    while (ia < na && ib < nb) {
      val ra = x.getStruct(ia, 2); val rb = y.getStruct(ib, 2)
      val ka = ra.getLong(0); val kb = rb.getLong(0)
      if (ka < kb) ia += 1
      else if (ka > kb) ib += 1
      else {
        val wa = ra.getLong(1); val wb = rb.getLong(1)
        if (math.abs(wa) <= safe && math.abs(wb) <= safe) {
          val p = wa * wb
          val sum = acc + p
          if (((acc ^ sum) & (p ^ sum)) < 0L) { // long add would wrap
            big = (if (big == null) java.math.BigInteger.ZERO else big)
              .add(java.math.BigInteger.valueOf(acc))
            acc = p
          } else acc = sum
        } else { // product itself exceeds long range
          big = (if (big == null) java.math.BigInteger.ZERO else big)
            .add(java.math.BigInteger.valueOf(wa)
              .multiply(java.math.BigInteger.valueOf(wb)))
        }
        ia += 1; ib += 1
      }
    }
    val total =
      if (big == null) java.math.BigInteger.valueOf(acc)
      else big.add(java.math.BigInteger.valueOf(acc))
    Decimal(scala.math.BigDecimal(new java.math.BigDecimal(total)), 38, 0)
  }

  /** [[CosineGateQ]] kernel: `10000·dot² ≥ pct²·ssa·ssb` in unbounded
    * integer arithmetic. */
  def cosineGateKernel(dot: java.math.BigInteger, ssa: java.math.BigInteger,
                       ssb: java.math.BigInteger, pct: Int): Boolean = {
    val lhs = dot.multiply(dot).multiply(java.math.BigInteger.valueOf(10000L))
    val rhs = ssa.multiply(ssb)
      .multiply(java.math.BigInteger.valueOf(pct.toLong * pct))
    lhs.compareTo(rhs) >= 0
  }

  /** Column wrapper for SortedPairsDot (key-ascending
    * array<struct<k, w>> sparse vectors). */
  def sortedPairsDot(a: Column, b: Column): Column =
    call_function("sorted_pairs_dot", a, b)

  /** Column wrapper for CosineGateQ. */
  def cosineGate(dot: Column, ssa: Column, ssb: Column, pct: Int): Column = {
    import org.apache.spark.sql.functions.lit
    call_function("cosine_gate", dot, ssa, ssb, lit(pct))
  }

  /** Column wrapper for the BloomBuildAgg runtime-filter aggregate
    * (item must be a pre-hashed bigint, e.g. `xxhash64(fp)`). */
  def bloomBuild(itemHash: Column, numBits: Int, numHashes: Int): Column = {
    import org.apache.spark.sql.functions.lit
    call_function("bloom_build", itemHash, lit(numBits), lit(numHashes))
  }

  /** Column wrapper for BloomMightContain. */
  def bloomMightContain(bloom: Column, itemHash: Column): Column =
    call_function("bloom_might_contain", bloom, itemHash)

  /** Column wrapper for the TopKFreq space-saving aggregate. */
  def topkFreq(item: Column, k: Int, capacity: Int): Column = {
    import org.apache.spark.sql.functions.lit
    call_function("topk_freq", item, lit(k), lit(capacity))
  }

  /** Column wrapper for the TopKBy exact per-group top-k aggregate. */
  def topkBy(score: Column, id: Column, k: Int): Column = {
    import org.apache.spark.sql.functions.lit
    call_function("topk_by", score, id, lit(k))
  }

  /** Column wrapper for SortedIntersectCount (ascending-sorted
    * array<bigint> inputs). */
  def sortedIntersectCount(a: Column, b: Column): Column =
    call_function("sorted_intersect_count", a, b)

  /** Column wrapper for DotProductF32. The analyzing session must have
    * called [[ensureRegistered]] (operator entry points do). */
  def dotF32(a: Column, b: Column): Column = call_function("dot_f32", a, b)

  /** Column wrapper for SrpSigsF32. */
  def srpSigsF32(v: Column, nBands: Int, bandBits: Int, dim: Int): Column = {
    import org.apache.spark.sql.functions.lit
    call_function("srp_sigs_f32", v, lit(nBands), lit(bandBits), lit(dim))
  }
}
