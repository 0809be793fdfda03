package graft.expressions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native Catalyst expression: dot product of two numeric-array columns
  * (`array<float>` or `array<double>` on either side, mixed allowed).
  *
  * The higher-order-function formulation
  * (`aggregate(zip_with(a, b, *), 0.0, +)`) is CodegenFallback — every
  * row pays interpreted-lambda overhead and intermediate array
  * allocation. This expression generates a tight fused multiply-add loop
  * inside whole-stage codegen, which is what the ANN/dedup inner loop
  * needs at 100 TB. Summation is the same left-to-right fold over
  * double-widened elements, so results are bit-identical to the HOF
  * version over cast-to-double arrays (and to an external oracle).
  * Accepting `array<float>` directly removes the per-row
  * `transform(embedding, CAST)` that round 1 paid on every joined pair.
  *
  * Length-mismatched inputs yield NULL — the same result as the HOF
  * formulation, where `zip_with` null-pads the shorter side and the
  * null propagates through the sum.
  */
case class DotProduct(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = DoubleType

  // NULL on length mismatch even for non-nullable children
  override def nullable: Boolean = true

  private def elemOk(e: Expression): Boolean = e.dataType match {
    case ArrayType(DoubleType | FloatType, _) => true
    case _ => false
  }

  private def isFloat(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (elemOk(left) && elemOk(right)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_dot expects (array<float|double>, array<float|double>), got (${left.dataType}, ${right.dataType})")

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    val lf = isFloat(left)
    val rf = isFloat(right)
    var s = 0.0
    var i = 0
    while (i < n) {
      val xv = if (lf) x.getFloat(i).toDouble else x.getDouble(i)
      val yv = if (rf) y.getFloat(i).toDouble else y.getDouble(i)
      s += xv * yv
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      val getL = if (isFloat(left)) s"(double) $a.getFloat($i)" else s"$a.getDouble($i)"
      val getR = if (isFloat(right)) s"(double) $b.getFloat($i)" else s"$b.getDouble($i)"
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $s = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $s += $getL * $getR;
         |  }
         |  ${ev.value} = $s;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

/** Registry of graft's native expressions, shared by the programmatic
  * [[GraftFunctions.register]] path and the `spark.sql.extensions`
  * injector (`graft.GraftExtensions`).
  */
object GraftFunctions {

  private def arity(name: String, n: Int, children: Seq[Expression]): Unit =
    require(children.length == n, s"$name expects $n arguments, got ${children.length}")

  val all: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[DotProduct].getName, "graft_dot"),
      (cs: Seq[Expression]) => { arity("graft_dot", 2, cs); DotProduct(cs.head, cs(1)) }),
    (FunctionIdentifier("graft_minhash_sig"),
      new ExpressionInfo(classOf[MinHashSig].getName, "graft_minhash_sig"),
      (cs: Seq[Expression]) => {
        arity("graft_minhash_sig", 2, cs)
        cs(1) match {
          case IntLit(n) => MinHashSig(cs.head, n)
          case other => throw new IllegalArgumentException(
            s"graft_minhash_sig: numHashes must be an int literal, got $other")
        }
      }),
    (FunctionIdentifier("graft_simhash"),
      new ExpressionInfo(classOf[SimHash64].getName, "graft_simhash"),
      (cs: Seq[Expression]) => { arity("graft_simhash", 1, cs); SimHash64(cs.head) }),
    (FunctionIdentifier("graft_rollhash"),
      new ExpressionInfo(classOf[RollingHash].getName, "graft_rollhash"),
      (cs: Seq[Expression]) => { arity("graft_rollhash", 1, cs); RollingHash(cs.head) }),
    (FunctionIdentifier("graft_word_shingles"),
      new ExpressionInfo(classOf[WordShingles3].getName, "graft_word_shingles"),
      (cs: Seq[Expression]) => { arity("graft_word_shingles", 1, cs); WordShingles3(cs.head) }),
    (FunctionIdentifier("graft_char_grams"),
      new ExpressionInfo(classOf[CharGrams3].getName, "graft_char_grams"),
      (cs: Seq[Expression]) => { arity("graft_char_grams", 1, cs); CharGrams3(cs.head) }),
    (FunctionIdentifier("graft_rep_stats"),
      new ExpressionInfo(classOf[RepStats].getName, null, "graft_rep_stats",
        "_FUNC_(text) - [n_words, n_distinct_words, top_bigram_count, " +
          "n_distinct_trigrams] over split(trim(text), ' +') in one pass.",
        "", "", "", "", "", "", "built-in"),
      (cs: Seq[Expression]) => { arity("graft_rep_stats", 1, cs); RepStats(cs.head) }),
    (FunctionIdentifier("graft_text_stats"),
      new ExpressionInfo(classOf[TextStats].getName, null, "graft_text_stats",
        "_FUNC_(text) - [alpha, punct, stop_en, stop_de, stop_fr, " +
          "stop_es, zh] character/token counts in one pass.",
        "", "", "", "", "", "", "built-in"),
      (cs: Seq[Expression]) => { arity("graft_text_stats", 1, cs); TextStats(cs.head) }),
    (FunctionIdentifier("graft_lsh_bucket"),
      new ExpressionInfo(classOf[LshBucket].getName, "graft_lsh_bucket"),
      (cs: Seq[Expression]) => {
        arity("graft_lsh_bucket", 2, cs)
        cs(1) match {
          case IntLit(p) => LshBucket(cs.head, p)
          case other => throw new IllegalArgumentException(
            s"graft_lsh_bucket: planes must be an int literal, got $other")
        }
      }),
    (FunctionIdentifier("graft_lsh_bands"),
      new ExpressionInfo(classOf[LshBandBuckets].getName, "graft_lsh_bands"),
      (cs: Seq[Expression]) => {
        arity("graft_lsh_bands", 3, cs)
        (cs(1), cs(2)) match {
          case (IntLit(r), IntLit(b)) => LshBandBuckets(cs.head, r, b)
          case other => throw new IllegalArgumentException(
            s"graft_lsh_bands: rowsPerBand/bands must be int literals, got $other")
        }
      }),
    (FunctionIdentifier("graft_jaccard"),
      new ExpressionInfo(classOf[JaccardSim].getName, null, "graft_jaccard",
        "_FUNC_(a, b) - round(|a∩b| / (|a|+|b|-|a∩b|), 6) of two string " +
          "arrays. Inputs are expected to hold DISTINCT elements (as " +
          "graft_word_shingles / graft_char_grams emit): the intersection " +
          "is counted first-match-only, but the union term uses the raw " +
          "array sizes, so duplicate elements shrink the result vs " +
          "distinct-set Jaccard.",
        "", "", "", "", "", "", "built-in"),
      (cs: Seq[Expression]) => { arity("graft_jaccard", 2, cs); JaccardSim(cs.head, cs(1)) }),
    (FunctionIdentifier("graft_pq_encode"),
      new ExpressionInfo(classOf[PqEncode].getName, "graft_pq_encode"),
      (cs: Seq[Expression]) => {
        arity("graft_pq_encode", 4, cs)
        val booksOk = cs(1).foldable && (cs(1).dataType match {
          case ArrayType(DoubleType, _) => true
          case _ => false
        })
        if (!booksOk) throw new IllegalArgumentException(
          s"graft_pq_encode: books must be a foldable array<double>, got ${cs(1)}")
        val books = cs(1).eval(null)
          .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData].toDoubleArray()
        (cs(2), cs(3)) match {
          case (IntLit(m), IntLit(sd)) =>
            PqEncode(cs.head,
              scala.collection.immutable.ArraySeq.unsafeWrapArray(books), m, sd)
          case other => throw new IllegalArgumentException(
            s"graft_pq_encode: m/subDim must be int literals, got $other")
        }
      }),
    (FunctionIdentifier("graft_pq_adc"),
      new ExpressionInfo(classOf[PqAdc].getName, "graft_pq_adc"),
      (cs: Seq[Expression]) => { arity("graft_pq_adc", 2, cs); PqAdc(cs.head, cs(1)) }),
    (FunctionIdentifier("graft_ewma"),
      new ExpressionInfo(classOf[EwmaFold].getName, "graft_ewma"),
      (cs: Seq[Expression]) => {
        arity("graft_ewma", 2, cs)
        cs(1) match {
          case a if a.foldable && a.dataType == DoubleType =>
            EwmaFold(cs.head, a.eval(null).asInstanceOf[Double])
          case other => throw new IllegalArgumentException(
            s"graft_ewma: alpha must be a double literal, got $other")
        }
      }),
    (FunctionIdentifier("graft_holt"),
      new ExpressionInfo(classOf[HoltFold].getName, "graft_holt"),
      (cs: Seq[Expression]) => {
        arity("graft_holt", 3, cs)
        (cs(1), cs(2)) match {
          case (a, b) if a.foldable && a.dataType == DoubleType &&
              b.foldable && b.dataType == DoubleType =>
            HoltFold(cs.head, a.eval(null).asInstanceOf[Double],
              b.eval(null).asInstanceOf[Double])
          case other => throw new IllegalArgumentException(
            s"graft_holt: alpha/beta must be double literals, got $other")
        }
      }),
    (FunctionIdentifier("graft_holtwinters"),
      new ExpressionInfo(classOf[HoltWintersFold].getName, "graft_holtwinters"),
      (cs: Seq[Expression]) => {
        arity("graft_holtwinters", 5, cs)
        (cs(1), cs(2), cs(3), cs(4)) match {
          case (a, b, g, p) if a.foldable && a.dataType == DoubleType &&
              b.foldable && b.dataType == DoubleType &&
              g.foldable && g.dataType == DoubleType &&
              p.foldable && p.dataType == IntegerType =>
            HoltWintersFold(cs.head, a.eval(null).asInstanceOf[Double],
              b.eval(null).asInstanceOf[Double],
              g.eval(null).asInstanceOf[Double],
              p.eval(null).asInstanceOf[Int])
          case other => throw new IllegalArgumentException(
            s"graft_holtwinters: alpha/beta/gamma must be double literals and period an int literal, got $other")
        }
      }),
    (FunctionIdentifier("graft_mm_synth"),
      new ExpressionInfo(classOf[MmSynthPayload].getName, "graft_mm_synth"),
      (cs: Seq[Expression]) => { arity("graft_mm_synth", 2, cs); MmSynthPayload(cs.head, cs(1)) }),
    (FunctionIdentifier("graft_mm_meta"),
      new ExpressionInfo(classOf[MmHeaderMeta].getName, "graft_mm_meta"),
      (cs: Seq[Expression]) => { arity("graft_mm_meta", 1, cs); MmHeaderMeta(cs.head) }),
    (FunctionIdentifier("graft_wav_stats"),
      new ExpressionInfo(classOf[WavStats].getName, "graft_wav_stats"),
      (cs: Seq[Expression]) => { arity("graft_wav_stats", 1, cs); WavStats(cs.head) }),
    (FunctionIdentifier("graft_jitter"),
      new ExpressionInfo(classOf[Jitter].getName, "graft_jitter"),
      (cs: Seq[Expression]) => {
        arity("graft_jitter", 3, cs)
        cs(2) match {
          case a if a.foldable && a.dataType == DoubleType =>
            Jitter(cs.head, cs(1), a.eval(null).asInstanceOf[Double])
          case other => throw new IllegalArgumentException(
            s"graft_jitter: amp must be a double literal, got $other")
        }
      }),
    (FunctionIdentifier("graft_cent_cos"),
      new ExpressionInfo(classOf[CentroidCosines].getName, "graft_cent_cos"),
      (cs: Seq[Expression]) => {
        arity("graft_cent_cos", 4, cs)
        // the packed centroid matrix is index state, not data: extract the
        // literal once at build time so the hot loop reads a primitive
        // double[] and the plan tree doesn't carry the array literal
        val centsOk = cs(1).foldable && (cs(1).dataType match {
          case ArrayType(DoubleType, _) => true
          case _ => false
        })
        if (!centsOk) throw new IllegalArgumentException(
          s"graft_cent_cos: cents must be a foldable array<double>, got ${cs(1)}")
        val cents = cs(1).eval(null)
          .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData].toDoubleArray()
        (cs(2), cs(3)) match {
          case (IntLit(dim), r) if r.foldable && r.dataType == BooleanType =>
            CentroidCosines(cs.head,
              scala.collection.immutable.ArraySeq.unsafeWrapArray(cents), dim,
              r.eval(null).asInstanceOf[Boolean])
          case other => throw new IllegalArgumentException(
            s"graft_cent_cos: dim/rounded must be int/boolean literals, got $other")
        }
      }),
  )

  /** Idempotent session registration (SQL + DataFrame `expr`). */
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    all.foreach { case (id, info, builder) =>
      if (!reg.functionExists(id)) reg.registerFunction(id, info, builder)
    }
  }
}
