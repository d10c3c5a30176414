package graft.functions

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.types._

/** Native dot product over two `array<float|double>` columns.
  *
  * The `zip_with`+`aggregate` higher-order-function formulation is
  * interpreted (no codegen) and allocates an intermediate array per
  * row; on the LSH paths that evaluates millions of 64-element folds
  * per second and dominated the candidate-join stage. This expression
  * generates a tight fused multiply-add loop inside whole-stage
  * codegen, reads float elements with a per-element widening cast (so
  * results are bit-identical to summing the cast-to-double arrays in
  * index order — the same left-to-right double sum DuckDB's
  * `list_dot_product` over `DOUBLE[]` produces), and allocates nothing.
  *
  * Null semantics match the HOF formulation it replaces: a null array
  * on either side yields null, any null *element* yields null
  * (zip_with's `x * y` is null-propagating and `acc + null` poisons
  * the fold), and arrays of different lengths yield null (zip_with
  * pads the shorter side with nulls) — a truncated embedding must
  * surface as missing, not as a plausible prefix cosine.
  */
case class DotProduct(left: Expression, right: Expression) extends BinaryExpression {

  override def prettyName: String = "graft_dot"
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(e: Expression): Boolean = e.dataType match {
      case ArrayType(FloatType | DoubleType, _) => true
      case _ => false
    }
    if (ok(left) && ok(right)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float|double> inputs, " +
        s"got ${left.dataType.catalogString} and ${right.dataType.catalogString}")
  }

  private def isFloat(e: Expression): Boolean =
    e.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    if (a.numElements() != b.numElements()) return null
    val n = a.numElements()
    val (af, bf) = (isFloat(left), isFloat(right))
    var s = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val x = if (af) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (bf) b.getFloat(i).toDouble else b.getDouble(i)
      s += x * y
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("sum")
      val getA = if (isFloat(left)) s"(double) $a.getFloat($i)" else s"$a.getDouble($i)"
      val getB = if (isFloat(right)) s"(double) $b.getFloat($i)" else s"$b.getDouble($i)"
      s"""
         |int $n = $a.numElements();
         |double $s = 0.0;
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $s += $getA * $getB;
         |  }
         |}
         |${ev.value} = $s;
         |""".stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

/** Engine extensions, installed via the public `SparkSessionExtensions`
  * hook on every session builder (Bench / Verify / Plans / tests). */
object GraftExtensions {
  val install: SparkSessionExtensions => Unit = { ext =>
    ext.injectFunction((
      new FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[DotProduct].getName, "graft_dot"),
      (children: Seq[Expression]) => DotProduct(children.head, children(1))))
    ext.injectFunction((
      new FunctionIdentifier("graft_eq_count"),
      new ExpressionInfo(classOf[EqCount].getName, "graft_eq_count"),
      (children: Seq[Expression]) => EqCount(children.head, children(1))))
    ext.injectFunction((
      new FunctionIdentifier("graft_zorder"),
      new ExpressionInfo(classOf[ZInterleave].getName, "graft_zorder"),
      (children: Seq[Expression]) => ZInterleave(children.head, children(1))))
    ext.injectFunction((
      new FunctionIdentifier("graft_bloom_contains"),
      new ExpressionInfo(classOf[BloomContains].getName, "graft_bloom_contains"),
      (children: Seq[Expression]) => children match {
        case Seq(s, Literal(id: Int, IntegerType)) =>
          BloomContains(s, BloomRegistry.get(id))
        case _ => throw new IllegalArgumentException(
          "usage: graft_bloom_contains(str, <bloom registry id literal>)")
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_mmr_select"),
      new ExpressionInfo(classOf[MmrSelect].getName, "graft_mmr_select"),
      (children: Seq[Expression]) => children match {
        case Seq(pool, Literal(k: Int, IntegerType),
            Literal(lam: Double, DoubleType), Literal(pw: Double, DoubleType)) =>
          MmrSelect(pool, k, lam, pw)
        case _ => throw new IllegalArgumentException(
          "usage: graft_mmr_select(pool, <k literal>, <lambda literal>, " +
            "<penalty weight literal>)")
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_space_saving"),
      new ExpressionInfo(classOf[SpaceSavingAgg].getName, "graft_space_saving"),
      (children: Seq[Expression]) => children match {
        case Seq(u, w, Literal(cap: Int, IntegerType)) => SpaceSavingAgg(u, w, cap)
        case _ => throw new IllegalArgumentException(
          "usage: graft_space_saving(user, weight, <cap literal>)")
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_minhash_bands"),
      new ExpressionInfo(classOf[MinHashBandKeys].getName, "graft_minhash_bands"),
      (children: Seq[Expression]) => children match {
        case Seq(sh, Literal(b: Int, IntegerType), Literal(r: Int, IntegerType)) =>
          MinHashBandKeys(sh, b, r)
        case _ => throw new IllegalArgumentException(
          "usage: graft_minhash_bands(shingles, <bands literal>, <rowsPerBand literal>)")
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_kmv"),
      new ExpressionInfo(classOf[KmvAgg].getName, "graft_kmv"),
      (children: Seq[Expression]) => children match {
        case Seq(h, Literal(k: Int, IntegerType)) => KmvAgg(h, k)
        case _ => throw new IllegalArgumentException(
          "usage: graft_kmv(digest, <k literal>)")
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_gram"),
      new ExpressionInfo(classOf[GramAgg].getName, "graft_gram"),
      (children: Seq[Expression]) => children match {
        case Seq(xs, Literal(d: Int, IntegerType)) => GramAgg(xs, d)
        case _ => throw new IllegalArgumentException(
          "usage: graft_gram(snapped_array, <dim literal>)")
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_cdc_cuts"),
      new ExpressionInfo(classOf[CdcCuts].getName, "graft_cdc_cuts"),
      (children: Seq[Expression]) => children match {
        case Seq(s, Literal(w: Int, IntegerType), Literal(d: Int, IntegerType)) =>
          CdcCuts(s, w, d)
        case _ => throw new IllegalArgumentException(
          "usage: graft_cdc_cuts(str, <window literal>, <divisor literal>)")
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_portable_minhash_sig"),
      new ExpressionInfo(classOf[PortableMinHashSig].getName,
        "graft_portable_minhash_sig"),
      (children: Seq[Expression]) => children match {
        case Seq(s, Literal(d: Int, IntegerType), Literal(l: Int, IntegerType)) =>
          PortableMinHashSig(s, d, l)
        case _ => throw new IllegalArgumentException(
          "usage: graft_portable_minhash_sig(text, <digests literal>, <lanes literal>)")
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_portable_simhash"),
      new ExpressionInfo(classOf[PortableSimhashFp].getName,
        "graft_portable_simhash"),
      (children: Seq[Expression]) => PortableSimhashFp(children.head)))
    ext.injectFunction((
      new FunctionIdentifier("graft_cell_probes"),
      new ExpressionInfo(classOf[CellProbes].getName, "graft_cell_probes"),
      (children: Seq[Expression]) => children match {
        case Seq(v, Literal(id: Int, IntegerType), Literal(p: Int, IntegerType)) =>
          CellProbes(v, CodebookRegistry.get(id), p)
        case _ => throw new IllegalArgumentException(
          "usage: graft_cell_probes(vec, <codebook registry id literal>, <probes literal>)")
      }))
  }
}
