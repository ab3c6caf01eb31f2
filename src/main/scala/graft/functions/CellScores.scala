package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** All centroid scores of a vector in one expression:
  * `graft_cell_scores(emb, centroidsFlat, biases)` → `array<double>`
  * where score i = e·c_i − bias_i (with bias = ‖c_i‖²/2 this is the
  * argmax form of nearest-centroid assignment: argmin ‖e−c‖² =
  * argmax e·c − ‖c‖²/2).
  *
  * Why not k composed `graft_dot(emb, lit(c_i))` structs: that build is
  * a ~70-node expression tree PER CENTROID, and the k-means training
  * loop rebuilds it with fresh literals every Lloyd iteration — paying
  * Catalyst analysis plus a near-method-size-limit codegen body each
  * time (measured ~4 s/iteration at 16×64 on a 2 000-row fixture; the
  * same JIT-starvation class as the LSH key composition,
  * [[LshBucketKeys]]). Here the matrix is one flat float[] reference
  * object and the generated source is IDENTICAL across iterations —
  * the codegen cache hits, and the kernel is a two-level primitive
  * loop that JITs. Accumulation is double, left-to-right per centroid,
  * exactly `graft_dot`'s order — scores are bit-identical to the
  * composed form.
  *
  * `centroidsFlat` (length = k·dim, centroid-major) and `biases`
  * (length k, double) must be foldable. */
case class CellScores(
    vector: Expression,
    centroidsFlat: Expression,
    biases: Expression)
    extends TernaryExpression {

  override def first: Expression = vector
  override def second: Expression = centroidsFlat
  override def third: Expression = biases

  override def checkInputDataTypes(): TypeCheckResult = {
    def floatArr(t: DataType): Boolean = t match {
      case ArrayType(FloatType, _) => true
      case _ => false
    }
    def doubleArr(t: DataType): Boolean = t match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (!floatArr(vector.dataType) || !floatArr(centroidsFlat.dataType))
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires array<float> vector and centroids, got " +
          s"${vector.dataType.simpleString} and ${centroidsFlat.dataType.simpleString}")
    else if (!doubleArr(biases.dataType))
      TypeCheckResult.TypeCheckFailure(s"$prettyName biases must be array<double>")
    else if (!centroidsFlat.foldable || !biases.foldable)
      TypeCheckResult.TypeCheckFailure(s"$prettyName centroids/biases must be literals")
    else TypeCheckResult.TypeCheckSuccess
  }

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  // conservatively nullable (like DotProduct): a null ELEMENT propagates
  // to a NULL result even when the vector column itself is non-nullable
  override def nullable: Boolean = true

  override def prettyName: String = "graft_cell_scores"

  @transient private lazy val flat: Array[Float] =
    centroidsFlat.eval(null).asInstanceOf[ArrayData].toFloatArray()
  @transient private lazy val bias: Array[Double] =
    biases.eval(null).asInstanceOf[ArrayData].toDoubleArray()
  private lazy val k: Int = bias.length
  private lazy val dim: Int = {
    require(k > 0 && flat.length % k == 0,
      s"$prettyName: centroid matrix length ${flat.length} not divisible by k=$k")
    flat.length / k
  }

  private def elementsNullable: Boolean = vector.dataType match {
    case ArrayType(_, n) => n
    case _ => false
  }

  override def eval(input: InternalRow): Any = {
    val v = vector.eval(input)
    if (v == null) return null
    val x = v.asInstanceOf[ArrayData]
    if (x.numElements() != dim)
      throw new IllegalArgumentException(
        s"$prettyName: vector length ${x.numElements()} != centroid dim $dim")
    if (elementsNullable) {
      var i = 0
      while (i < dim) { if (x.isNullAt(i)) return null; i += 1 }
    }
    val out = new Array[Double](k)
    var off = 0
    var c = 0
    while (c < k) {
      var acc = 0.0
      var d = 0
      while (d < dim) { acc += x.getFloat(d).toDouble * flat(off + d); d += 1 }
      out(c) = acc - bias(c)
      off += dim
      c += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val matRef = ctx.addReferenceObj("cellCentroids", flat, "float[]")
    val biasRef = ctx.addReferenceObj("cellBiases", bias, "double[]")
    val vecCode = vector.genCode(ctx)
    val x = vecCode.value
    val out = ctx.freshName("scores")
    val off = ctx.freshName("off")
    val c = ctx.freshName("c")
    val d = ctx.freshName("d")
    val acc = ctx.freshName("acc")
    val nullGuard =
      if (elementsNullable)
        s"""
           |for (int $d = 0; $d < $dim && !${ev.isNull}; $d++) {
           |  if ($x.isNullAt($d)) ${ev.isNull} = true;
           |}
         """.stripMargin
      else ""
    ev.copy(code =
      code"""
         |${vecCode.code}
         |boolean ${ev.isNull} = ${vecCode.isNull};
         |org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} = null;
         |if (!${ev.isNull}) {
         |  if ($x.numElements() != $dim) {
         |    throw new IllegalArgumentException(
         |      "$prettyName: vector length " + $x.numElements() + " != centroid dim $dim");
         |  }
         |  $nullGuard
         |  if (!${ev.isNull}) {
         |    double[] $out = new double[$k];
         |    int $off = 0;
         |    for (int $c = 0; $c < $k; $c++) {
         |      double $acc = 0.0;
         |      for (int $d = 0; $d < $dim; $d++) {
         |        $acc += ((double) $x.getFloat($d)) * $matRef[$off + $d];
         |      }
         |      $out[$c] = $acc - $biasRef[$c];
         |      $off += $dim;
         |    }
         |    ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
         |  }
         |}
       """.stripMargin)
  }

  override protected def withNewChildrenInternal(
      first: Expression, second: Expression, third: Expression): CellScores =
    copy(vector = first, centroidsFlat = second, biases = third)
}
