package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, Literal, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native codegen'd wrappers over [[NativeKernels]].
  *
  * Each replaces an interpreted HOF pipeline that dominated the round-1
  * bench (Spark's `transform`/`aggregate`/`zip_with` are CodegenFallback:
  * per-row interpreted-lambda trees plus intermediate arrays). The
  * generated code is a single static call, so the whole projection stays
  * inside one WholeStageCodegen span and the per-row cost is the kernel
  * loop itself.
  */
private[expressions] trait KernelCall { self: UnaryExpression =>
  /** Emit `ev.value = <static kernel call>(childValue)`. */
  protected def kernelCall(c: String): String

  protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    self.defineCodeGen(ctx, ev, c => kernelCall(c))
}

/** MinHash signature (`array<long>` of length `numHashes`) of a
  * shingle-set column — see [[NativeKernels.minhashSig]].
  *
  * An empty shingle array yields NULL, matching the documented
  * HOF equivalent (`array_min` over an empty `transform` is NULL per
  * element) — reachable only from user-supplied arrays; the shingle
  * kernels always emit at least one element.
  */
case class MinHashSig(child: Expression, numHashes: Int)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) if numHashes > 0 => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_minhash_sig expects (array<string>, positive int literal), got $t")
  }

  override protected def nullSafeEval(arr: Any): Any = {
    val a = arr.asInstanceOf[ArrayData]
    if (a.numElements() == 0) null else NativeKernels.minhashSig(a, numHashes)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      |if ($c.numElements() == 0) {
      |  ${ev.isNull} = true;
      |} else {
      |  ${ev.value} = graft.expressions.NativeKernels.minhashSig($c, $numHashes);
      |}
      |""".stripMargin)

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}

/** 64-bit SimHash of a token-array column — see [[NativeKernels.simhash]]. */
case class SimHash64(child: Expression) extends UnaryExpression with KernelCall {
  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"graft_simhash expects array<string>, got $t")
  }

  override protected def nullSafeEval(arr: Any): Any =
    NativeKernels.simhash(arr.asInstanceOf[ArrayData])

  override protected def kernelCall(c: String): String =
    s"graft.expressions.NativeKernels.simhash($c)"

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

/** Running per-point EWMA over a (ts, value)-struct array sorted by
  * (ts, value) — see [[NativeKernels.ewma]]. `alpha` is a build-time
  * literal so the generated code stays one static call.
  */
case class EwmaFold(child: Expression, alpha: Double)
    extends UnaryExpression with KernelCall {
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(s: StructType, _) if s.length == 2 &&
        s.fields(1).dataType == DoubleType && alpha > 0 && alpha <= 1 =>
      TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_ewma expects (array<struct<_, value double>>, alpha in (0,1]), got $t")
  }

  override protected def nullSafeEval(arr: Any): Any =
    NativeKernels.ewma(arr.asInstanceOf[ArrayData], alpha)

  override protected def kernelCall(c: String): String =
    s"graft.expressions.NativeKernels.ewma($c, ${alpha}D)"

  override protected def withNewChildInternal(newChild: Expression): EwmaFold =
    copy(child = newChild)
}

/** Running per-point Holt double-exponential level over a (ts, value)-
  * struct array sorted by (ts, value) — see [[NativeKernels.holt]].
  * `alpha`/`beta` are build-time literals so the generated code stays
  * one static call.
  */
case class HoltFold(child: Expression, alpha: Double, beta: Double)
    extends UnaryExpression with KernelCall {
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(s: StructType, _) if s.length == 2 &&
        s.fields(1).dataType == DoubleType &&
        alpha > 0 && alpha <= 1 && beta > 0 && beta <= 1 =>
      TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_holt expects (array<struct<_, value double>>, alpha in (0,1], beta in (0,1]), got $t")
  }

  override protected def nullSafeEval(arr: Any): Any =
    NativeKernels.holt(arr.asInstanceOf[ArrayData], alpha, beta)

  override protected def kernelCall(c: String): String =
    s"graft.expressions.NativeKernels.holt($c, ${alpha}D, ${beta}D)"

  override protected def withNewChildInternal(newChild: Expression): HoltFold =
    copy(child = newChild)
}

/** Running per-point additive Holt-Winters (level + trend +
  * index-periodic seasonal) over a (ts, value)-struct array sorted by
  * (ts, value) — see [[NativeKernels.holtWinters]]. All smoothing
  * constants and the period are build-time literals so the generated
  * code stays one static call.
  */
case class HoltWintersFold(child: Expression, alpha: Double, beta: Double,
                           gamma: Double, period: Int)
    extends UnaryExpression with KernelCall {
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(s: StructType, _) if s.length == 2 &&
        s.fields(1).dataType == DoubleType &&
        alpha > 0 && alpha <= 1 && beta > 0 && beta <= 1 &&
        gamma > 0 && gamma <= 1 && period >= 2 =>
      TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      "graft_holtwinters expects (array<struct<_, value double>>, " +
        s"alpha/beta/gamma in (0,1], period >= 2), got $t")
  }

  override protected def nullSafeEval(arr: Any): Any =
    NativeKernels.holtWinters(arr.asInstanceOf[ArrayData], alpha, beta, gamma, period)

  override protected def kernelCall(c: String): String =
    s"graft.expressions.NativeKernels.holtWinters($c, ${alpha}D, ${beta}D, ${gamma}D, $period)"

  override protected def withNewChildInternal(newChild: Expression): HoltWintersFold =
    copy(child = newChild)
}

/** Product-quantization encode of a vector column into one packed long
  * (m × 4-bit codes, 16 codewords per subspace) — see
  * [[NativeKernels.pqEncode]]. The codebook matrix is plan state, held
  * as an immutable ArraySeq for case-class equality (same rationale as
  * [[CentroidCosines]]).
  */
case class PqEncode(child: Expression,
                    books: scala.collection.immutable.ArraySeq[Double],
                    m: Int, subDim: Int)
    extends UnaryExpression {
  override def dataType: DataType = LongType

  // NULL when the vector's length doesn't match m*subDim
  override def nullable: Boolean = true

  @transient private lazy val booksArr: Array[Double] = books.toArray

  private def isFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _)
        if m > 0 && m <= 16 && subDim > 0 && books.length == m * 16 * subDim =>
      TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_pq_encode expects (array<float|double>, m*16*subDim codebooks, m in [1,16]), got $t")
  }

  override protected def nullSafeEval(arr: Any): Any = {
    val a = arr.asInstanceOf[ArrayData]
    if (a.numElements() != m * subDim) null
    else NativeKernels.pqEncode(a, booksArr, m, subDim, isFloat)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val booksRef = ctx.addReferenceObj("books", booksArr, "double[]")
    nullSafeCodeGen(ctx, ev, c => s"""
      |if ($c.numElements() != ${m * subDim}) {
      |  ${ev.isNull} = true;
      |} else {
      |  ${ev.value} = graft.expressions.NativeKernels.pqEncode(
      |    $c, $booksRef, $m, $subDim, $isFloat);
      |}
      |""".stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): PqEncode =
    copy(child = newChild)
}

/** Asymmetric-distance lookup over a packed PQ code and a per-query
  * LUT column — see [[NativeKernels.pqAdc]].
  */
case class PqAdc(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (LongType, ArrayType(DoubleType, _)) => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"graft_pq_adc expects (long code, array<double> lut), got $t")
    }

  override protected def nullSafeEval(code: Any, lut: Any): Any =
    NativeKernels.pqAdc(code.asInstanceOf[Long], lut.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (c, l) =>
      s"graft.expressions.NativeKernels.pqAdc($c, $l)")

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): PqAdc =
    copy(left = newLeft, right = newRight)
}

/** Polynomial rolling hash of a string column — see
  * [[NativeKernels.rollingHash]].
  */
case class RollingHash(child: Expression) extends UnaryExpression with KernelCall {
  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"graft_rollhash expects string, got $t")
  }

  override protected def nullSafeEval(s: Any): Any =
    NativeKernels.rollingHash(s.asInstanceOf[UTF8String])

  override protected def kernelCall(c: String): String =
    s"graft.expressions.NativeKernels.rollingHash($c)"

  override protected def withNewChildInternal(newChild: Expression): RollingHash =
    copy(child = newChild)
}

/** Distinct word 3-shingles of a string column — see
  * [[NativeKernels.wordShingles3]].
  */
case class WordShingles3(child: Expression) extends UnaryExpression with KernelCall {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"graft_word_shingles expects string, got $t")
  }

  override protected def nullSafeEval(s: Any): Any =
    NativeKernels.wordShingles3(s.asInstanceOf[UTF8String])

  override protected def kernelCall(c: String): String =
    s"graft.expressions.NativeKernels.wordShingles3($c)"

  override protected def withNewChildInternal(newChild: Expression): WordShingles3 =
    copy(child = newChild)
}

/** Distinct char 3-grams of a string column — see
  * [[NativeKernels.charGrams3]].
  */
case class CharGrams3(child: Expression) extends UnaryExpression with KernelCall {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"graft_char_grams expects string, got $t")
  }

  override protected def nullSafeEval(s: Any): Any =
    NativeKernels.charGrams3(s.asInstanceOf[UTF8String])

  override protected def kernelCall(c: String): String =
    s"graft.expressions.NativeKernels.charGrams3($c)"

  override protected def withNewChildInternal(newChild: Expression): CharGrams3 =
    copy(child = newChild)
}

/** One-pass character/token statistics `[alpha, punct, stop_en,
  * stop_de, stop_fr, stop_es, zh]` of a string column — see
  * [[NativeKernels.textStats]] for the regex-parity contract.
  */
case class TextStats(child: Expression) extends UnaryExpression with KernelCall {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"graft_text_stats expects string, got $t")
  }

  override protected def nullSafeEval(s: Any): Any =
    NativeKernels.textStats(s.asInstanceOf[UTF8String])

  override protected def kernelCall(c: String): String =
    s"graft.expressions.NativeKernels.textStats($c)"

  override protected def withNewChildInternal(newChild: Expression): TextStats =
    copy(child = newChild)
}

/** Repetition counters `[n_words, n_distinct_words, top_bigram_count,
  * n_distinct_trigrams]` of a string column — see
  * [[NativeKernels.repStats]].
  */
case class RepStats(child: Expression) extends UnaryExpression with KernelCall {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"graft_rep_stats expects string, got $t")
  }

  override protected def nullSafeEval(s: Any): Any =
    NativeKernels.repStats(s.asInstanceOf[UTF8String])

  override protected def kernelCall(c: String): String =
    s"graft.expressions.NativeKernels.repStats($c)"

  override protected def withNewChildInternal(newChild: Expression): RepStats =
    copy(child = newChild)
}

/** Random-hyperplane LSH bucket of a numeric-array column — see
  * [[NativeKernels.lshBucket]]. Accepts `array<float>` or `array<double>`.
  */
case class LshBucket(child: Expression, planes: Int)
    extends UnaryExpression with KernelCall {
  override def dataType: DataType = LongType

  private def isFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) if planes > 0 && planes <= 63 =>
      TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_lsh_bucket expects (array<float|double>, int literal in [1,63]), got $t")
  }

  override protected def nullSafeEval(arr: Any): Any =
    NativeKernels.lshBucket(arr.asInstanceOf[ArrayData], planes, isFloat)

  override protected def kernelCall(c: String): String =
    s"graft.expressions.NativeKernels.lshBucket($c, $planes, $isFloat)"

  override protected def withNewChildInternal(newChild: Expression): LshBucket =
    copy(child = newChild)
}

/** Banded LSH bucket ids (`array<long>`, one per band) of a
  * numeric-array column — see [[NativeKernels.lshBandBuckets]].
  */
case class LshBandBuckets(child: Expression, rowsPerBand: Int, bands: Int)
    extends UnaryExpression with KernelCall {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  private def isFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _)
        if rowsPerBand > 0 && rowsPerBand <= 63 && bands > 0 =>
      TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_lsh_bands expects (array<float|double>, int, int), got $t")
  }

  override protected def nullSafeEval(arr: Any): Any =
    NativeKernels.lshBandBuckets(arr.asInstanceOf[ArrayData], rowsPerBand, bands, isFloat)

  override protected def kernelCall(c: String): String =
    s"graft.expressions.NativeKernels.lshBandBuckets($c, $rowsPerBand, $bands, $isFloat)"

  override protected def withNewChildInternal(newChild: Expression): LshBandBuckets =
    copy(child = newChild)
}

/** Rounded Jaccard similarity of two distinct-element string-array
  * columns — see [[NativeKernels.jaccard]].
  */
case class JaccardSim(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType

  private def ok(e: Expression): Boolean = e.dataType match {
    case ArrayType(StringType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (ok(left) && ok(right)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_jaccard expects (array<string>, array<string>), got (${left.dataType}, ${right.dataType})")

  override protected def nullSafeEval(a: Any, b: Any): Any =
    NativeKernels.jaccard(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.expressions.NativeKernels.jaccard($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): JaccardSim =
    copy(left = newLeft, right = newRight)
}

/** Deterministic near-duplicate jitter of a float-vector column — see
  * [[NativeKernels.jitter]].
  */
case class Jitter(left: Expression, right: Expression, amp: Double)
    extends BinaryExpression {
  override def dataType: DataType = ArrayType(FloatType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _), LongType) => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"graft_jitter expects (array<float>, long id, double literal), got $t")
    }

  override protected def nullSafeEval(v: Any, id: Any): Any =
    NativeKernels.jitter(v.asInstanceOf[ArrayData], id.asInstanceOf[Long], amp)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (v, id) =>
      s"graft.expressions.NativeKernels.jitter($v, $id, $amp)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Jitter =
    copy(left = newLeft, right = newRight)
}

/** Per-centroid cosine scores (`array<double>`, one slot per centroid in
  * id order) of a numeric-array column against a packed centroid matrix —
  * see [[NativeKernels.centCosines]].
  *
  * The centroids ride along as a plan constant (a `double[]` reference
  * object in the generated code), NOT as a joined relation: nearest-
  * centroid assignment is a per-row reduction, so expressing it as an
  * expression keeps IVF assignment inside one WholeStageCodegen span with
  * zero shuffle — where the former formulation paid a corpus×nlist join
  * plus a rank window partitioned by vec_id (a full-corpus shuffle of
  * nlist-times-replicated rows).
  */
case class CentroidCosines(child: Expression,
                           cents: scala.collection.immutable.ArraySeq[Double],
                           dim: Int, rounded: Boolean)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  // NULL when the vector's length doesn't match the centroid dim
  override def nullable: Boolean = true

  // the matrix is held as an immutable ArraySeq so case-class equality
  // is element-wise — an Array field compares by reference, silently
  // defeating canonicalization / semanticEquals / subexpression
  // elimination for semantically identical plan fragments. The kernel
  // reads a primitive double[]; materialized once per plan instance.
  @transient private lazy val centsArr: Array[Double] = cents.toArray

  private def isFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _)
        if dim > 0 && cents.length % (dim + 1) == 0 && cents.length > 0 =>
      TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_cent_cos expects (array<float|double>, packed centroid matrix), got $t")
  }

  override protected def nullSafeEval(arr: Any): Any = {
    val a = arr.asInstanceOf[ArrayData]
    if (a.numElements() != dim) null
    else NativeKernels.centCosines(a, centsArr, dim, rounded, isFloat)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val centsRef = ctx.addReferenceObj("cents", centsArr, "double[]")
    nullSafeCodeGen(ctx, ev, c => s"""
      |if ($c.numElements() != $dim) {
      |  ${ev.isNull} = true;
      |} else {
      |  ${ev.value} = graft.expressions.NativeKernels.centCosines(
      |    $c, $centsRef, $dim, $rounded, $isFloat);
      |}
      |""".stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): CentroidCosines =
    copy(child = newChild)
}

private[expressions] object IntLit {
  /** Extract a literal Int argument of a SQL function builder. */
  def unapply(e: Expression): Option[Int] = e match {
    case Literal(v: Int, IntegerType) => Some(v)
    case _ if e.foldable && e.dataType == IntegerType =>
      Option(e.eval(null)).map(_.asInstanceOf[Int])
    case _ => None
  }
}
