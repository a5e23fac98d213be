package graft.functions.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, QuaternaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Fused product-quantization encode + ADC scoring: one pass over a
  * corpus vector computes, per subspace, the argmin-L2 code against the
  * broadcast codebook (expanded-form distance rounded at 6dp, smaller
  * code index on ties — term-for-term the relational window encode of
  * [[graft.operators.SimilarityOps.pqTopK]]) and accumulates, in
  * subspace index order, the per-query ADC dot from the broadcast LUT
  * plus the reconstruction norm.
  *
  * Output layout: `[adc_0 … adc_{nQ−1}, vnorm2, code_0 … code_{m−1}]`
  * (the codes ride along so specs can pin fused-vs-relational encode
  * equality; the operator slices them off).
  *
  * Why an Expression (the §7.3 ladder): the relational PQ pipeline pays
  * two corpus-scale shuffles — the `row_number` encode window over
  * n·m·k rows and the (query, vec) ADC aggregation over n·m·nQ rows.
  * Both disappear here: the codebook/LUT are plan-time broadcast arrays
  * and everything else is row-local, so the ONLY shuffle left in the
  * fused scorer is the final per-query top-k over n·nQ rows (map-side
  * group-limited). The ADC sum also becomes index-ordered on both
  * engines (the oracle aggregates `ORDER BY s` into a list and dots it
  * with a ones vector), designing out the shuffled-sum rounding hazard
  * class (the q79 lesson) instead of relying on magnitudes.
  *
  * Inputs: `vec` array<float|double> (dim = m·w), `cbFlat` (m·k·w
  * doubles, laid out [(s·k + c)·w + d]), `cnorm2Flat` (m·k doubles,
  * [s·k + c]), `lutFlat` (nQ·m·k doubles, [(q·m + s)·k + c]). The 6dp
  * rounding replicates Catalyst `Round` exactly
  * (`BigDecimal.valueOf(x).setScale(6, HALF_UP)`).
  */
case class PqAdcScores(vec: Expression, cbFlat: Expression,
    cnorm2Flat: Expression, lutFlat: Expression, m: Int, k: Int)
    extends QuaternaryExpression {

  override def first: Expression = vec
  override def second: Expression = cbFlat
  override def third: Expression = cnorm2Flat
  override def fourth: Expression = lutFlat

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "pq_adc_scores"

  override def checkInputDataTypes(): TypeCheckResult = {
    if (m < 1 || k < 1)
      return TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires m >= 1 and k >= 1 (got m=$m, k=$k)")
    val vecOk = vec.dataType match {
      case ArrayType(DoubleType, _) | ArrayType(FloatType, _) => true
      case _ => false
    }
    val flatsOk = Seq(cbFlat, cnorm2Flat, lutFlat).forall(_.dataType match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    })
    if (!vecOk || !flatsOk)
      TypeCheckResult.TypeCheckFailure(s"$prettyName expects " +
        "(array<float|double>, array<double>, array<double>, array<double>), got " +
        Seq(vec, cbFlat, cnorm2Flat, lutFlat).map(_.dataType.sql).mkString(", "))
    else TypeCheckResult.TypeCheckSuccess
  }

  private def vecIsDouble: Boolean =
    vec.dataType.asInstanceOf[ArrayType].elementType == DoubleType

  override protected def nullSafeEval(v: Any, cb: Any, cn: Any, lut: Any): Any = {
    val x = v.asInstanceOf[ArrayData]
    val cbA = cb.asInstanceOf[ArrayData]
    val cnA = cn.asInstanceOf[ArrayData]
    val lutA = lut.asInstanceOf[ArrayData]
    val dim = x.numElements()
    if (dim % m != 0 || cbA.numElements() != dim * k ||
      cnA.numElements() != m * k || lutA.numElements() % (m * k) != 0)
      return null
    val w = dim / m
    val nQ = lutA.numElements() / (m * k)
    val vd = vecIsDouble
    val out = new Array[Double](nQ + 1 + m)
    var s = 0
    while (s < m) {
      // dot(sv, sv) once per subspace, index order
      var svv = 0.0
      var d = 0
      while (d < w) {
        val xi = if (vd) x.getDouble(s * w + d) else x.getFloat(s * w + d).toDouble
        svv += xi * xi
        d += 1
      }
      var best = -1
      var bestDist = Double.PositiveInfinity
      var c = 0
      while (c < k) {
        var svc = 0.0
        d = 0
        while (d < w) {
          val xi = if (vd) x.getDouble(s * w + d) else x.getFloat(s * w + d).toDouble
          svc += xi * cbA.getDouble((s * k + c) * w + d)
          d += 1
        }
        val dist = java.math.BigDecimal
          .valueOf(svv - 2.0 * svc + cnA.getDouble(s * k + c))
          .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
        if (dist < bestDist) { bestDist = dist; best = c }
        c += 1
      }
      out(nQ) += cnA.getDouble(s * k + best)
      var q = 0
      while (q < nQ) {
        out(q) += lutA.getDouble((q * m + s) * k + best)
        q += 1
      }
      out(nQ + 1 + s) = best.toDouble
      s += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, cb, cn, lut) => {
      val dim = ctx.freshName("dim")
      val w = ctx.freshName("w")
      val nQ = ctx.freshName("nQ")
      val out = ctx.freshName("out")
      val s = ctx.freshName("s")
      val d = ctx.freshName("d")
      val c = ctx.freshName("c")
      val q = ctx.freshName("q")
      val svv = ctx.freshName("svv")
      val svc = ctx.freshName("svc")
      val xi = ctx.freshName("xi")
      val best = ctx.freshName("best")
      val bestDist = ctx.freshName("bestDist")
      val dist = ctx.freshName("dist")
      def getX(idx: String): String =
        if (vecIsDouble) s"$x.getDouble($idx)" else s"(double) $x.getFloat($idx)"
      s"""
         |final int $dim = $x.numElements();
         |if ($dim % $m != 0 || $cb.numElements() != $dim * $k ||
         |    $cn.numElements() != $m * $k ||
         |    $lut.numElements() % ($m * $k) != 0) {
         |  ${ev.isNull} = true;
         |} else {
         |  final int $w = $dim / $m;
         |  final int $nQ = $lut.numElements() / ($m * $k);
         |  final double[] $out = new double[$nQ + 1 + $m];
         |  for (int $s = 0; $s < $m; $s++) {
         |    double $svv = 0.0;
         |    for (int $d = 0; $d < $w; $d++) {
         |      final double $xi = ${getX(s"$s * $w + $d")};
         |      $svv += $xi * $xi;
         |    }
         |    int $best = -1;
         |    double $bestDist = Double.POSITIVE_INFINITY;
         |    for (int $c = 0; $c < $k; $c++) {
         |      double $svc = 0.0;
         |      for (int $d = 0; $d < $w; $d++) {
         |        $svc += ${getX(s"$s * $w + $d")} *
         |          $cb.getDouble(($s * $k + $c) * $w + $d);
         |      }
         |      final double $dist = java.math.BigDecimal
         |        .valueOf($svv - 2.0 * $svc + $cn.getDouble($s * $k + $c))
         |        .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue();
         |      if ($dist < $bestDist) { $bestDist = $dist; $best = $c; }
         |    }
         |    $out[$nQ] += $cn.getDouble($s * $k + $best);
         |    for (int $q = 0; $q < $nQ; $q++) {
         |      $out[$q] += $lut.getDouble(($q * $m + $s) * $k + $best);
         |    }
         |    $out[$nQ + 1 + $s] = (double) $best;
         |  }
         |  ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newFirst: Expression,
      newSecond: Expression, newThird: Expression,
      newFourth: Expression): PqAdcScores =
    copy(vec = newFirst, cbFlat = newSecond, cnorm2Flat = newThird,
      lutFlat = newFourth)
}
