package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native dot product over two float vectors (`array<float>` → double).
  *
  * Why a custom Catalyst expression: the built-in formulation
  * `aggregate(zip_with(a, b, _*_), 0d, _+_)` has the right semantics but
  * higher-order functions are CodegenFallback — every vector pair walks an
  * interpreted lambda tree with per-element boxing. This expression
  * generates a tight primitive loop inside whole-stage codegen (and its
  * interpreted path reads the float arrays directly), which is the hot
  * inner kernel of brute-force similarity search (Similarity.topK: |Q|·|C|
  * evaluations).
  *
  * Semantics match the HOF formulation exactly: elements are upcast to
  * double and accumulated left-to-right (same IEEE result, same DuckDB
  * oracle parity), null arrays AND null elements propagate to a NULL
  * result (the HOF fold yields NULL on a null element), and mismatched
  * lengths raise — a malformed embedding column should fail loudly, not
  * silently truncate. The null-element check is only emitted when the
  * input type says containsNull, keeping the common loop tight.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  // ExpectsInputTypes is not implementable outside org.apache.spark in
  // Spark 4 (AbstractDataType went private[sql]); check types directly.
  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(t: DataType): Boolean = t match {
      case ArrayType(FloatType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<float> arguments, got " +
        s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
  }

  override def dataType: DataType = DoubleType

  override def nullable: Boolean = true

  override def prettyName: String = "graft_dot"

  private def elementsNullable: Boolean = Seq(left, right).exists(_.dataType match {
    case ArrayType(_, n) => n
    case _ => false
  })

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (y.numElements() != n) {
      throw new IllegalArgumentException(
        s"graft_dot: vector lengths differ (${n} vs ${y.numElements()})")
    }
    if (elementsNullable) {
      var i = 0
      while (i < n) {
        if (x.isNullAt(i) || y.isNullAt(i)) return null
        i += 1
      }
    }
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
      val nullElementGuard =
        if (elementsNullable)
          s"""
             |for (int $i = 0; $i < $n; $i++) {
             |  if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
             |}
           """.stripMargin
        else ""
      s"""
         |final int $n = $a.numElements();
         |if ($b.numElements() != $n) {
         |  throw new IllegalArgumentException(
         |    "graft_dot: vector lengths differ (" + $n + " vs " + $b.numElements() + ")");
         |}
         |$nullElementGuard
         |if (!${ev.isNull}) {
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $acc += ((double) $a.getFloat($i)) * ((double) $b.getFloat($i));
         |  }
         |  ${ev.value} = $acc;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}
