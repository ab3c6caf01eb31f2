package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType}

/** Asymmetric-distance (ADC) score of a product-quantized vector against a
  * per-query lookup table: `graft_pq_adc(codes, lut)` → double, where
  * `codes` is the corpus row's `array<int>` of M sub-codebook assignments
  * and `lut` is the query's flat `array<double>` of M·K partial dot
  * products (`lut[m·K + j] = q_subᵐ · cᵐⱼ`, K inferred as
  * `lut.length / codes.length`). The score `Σₘ lut[m·K + codes[m]]`
  * reconstructs the approximate full dot product without touching the
  * original embedding — the corpus side of a PQ search scans M small
  * codes per row instead of `dim` floats (16 codes vs 64 floats here,
  * and the same expression serves byte-packed M=16/K=256 layouts).
  *
  * Why a custom expression (same rationale as [[DotProduct]]): the HOF
  * formulation (`aggregate(transform(sequence(...)))`) is
  * CodegenFallback-interpreted with per-element boxing, and this is the
  * hot kernel of the ADC pass (|Q|·|C| evaluations). Here it is an
  * M-step primitive loop inside whole-stage codegen.
  *
  * Null arrays and null ELEMENTS propagate to NULL (the guard is emitted
  * only when the input type says containsNull, like [[DotProduct]]); a
  * `lut` whose length is not a multiple of the code count, or a code
  * outside `[0, K)`, raises — a corrupt code column must fail loudly.
  */
case class PqAdc(codes: Expression, lut: Expression) extends BinaryExpression {

  override def left: Expression = codes
  override def right: Expression = lut

  override def checkInputDataTypes(): TypeCheckResult = (codes.dataType, lut.dataType) match {
    case (ArrayType(IntegerType, _), ArrayType(DoubleType, _)) =>
      TypeCheckResult.TypeCheckSuccess
    case (c, l) =>
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (array<int> codes, array<double> lut), got " +
          s"${c.simpleString} and ${l.simpleString}")
  }

  override def dataType: DataType = DoubleType

  override def nullable: Boolean = true

  override def prettyName: String = "graft_pq_adc"

  private def elementsNullable: Boolean = Seq(codes, lut).exists(_.dataType match {
    case ArrayType(_, n) => n
    case _ => false
  })

  override protected def nullSafeEval(c: Any, l: Any): Any = {
    val cd = c.asInstanceOf[ArrayData]
    val lt = l.asInstanceOf[ArrayData]
    val m = cd.numElements()
    val n = lt.numElements()
    if (m == 0 || n % m != 0) {
      throw new IllegalArgumentException(
        s"graft_pq_adc: lut length $n is not a positive multiple of code count $m")
    }
    if (elementsNullable) {
      var i = 0
      while (i < m) { if (cd.isNullAt(i)) return null; i += 1 }
      i = 0
      while (i < n) { if (lt.isNullAt(i)) return null; i += 1 }
    }
    val k = n / m
    var acc = 0.0
    var i = 0
    while (i < m) {
      val code = cd.getInt(i)
      if (code < 0 || code >= k) {
        throw new IllegalArgumentException(
          s"graft_pq_adc: code $code at subspace $i outside [0, $k)")
      }
      acc += lt.getDouble(i * k + code)
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (c, l) => {
      val m = ctx.freshName("m")
      val n = ctx.freshName("n")
      val k = ctx.freshName("k")
      val i = ctx.freshName("i")
      val code = ctx.freshName("code")
      val acc = ctx.freshName("acc")
      val nullElementGuard =
        if (elementsNullable)
          s"""
             |for (int $i = 0; $i < $m; $i++) {
             |  if ($c.isNullAt($i)) { ${ev.isNull} = true; break; }
             |}
             |for (int $i = 0; $i < $n && !${ev.isNull}; $i++) {
             |  if ($l.isNullAt($i)) { ${ev.isNull} = true; break; }
             |}
           """.stripMargin
        else ""
      s"""
         |final int $m = $c.numElements();
         |final int $n = $l.numElements();
         |if ($m == 0 || $n % $m != 0) {
         |  throw new IllegalArgumentException(
         |    "graft_pq_adc: lut length " + $n + " is not a positive multiple of code count " + $m);
         |}
         |$nullElementGuard
         |if (!${ev.isNull}) {
         |  final int $k = $n / $m;
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $m; $i++) {
         |    final int $code = $c.getInt($i);
         |    if ($code < 0 || $code >= $k) {
         |      throw new IllegalArgumentException(
         |        "graft_pq_adc: code " + $code + " at subspace " + $i + " outside [0, " + $k + ")");
         |    }
         |    $acc += $l.getDouble($i * $k + $code);
         |  }
         |  ${ev.value} = $acc;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PqAdc =
    copy(codes = newLeft, lut = newRight)
}
