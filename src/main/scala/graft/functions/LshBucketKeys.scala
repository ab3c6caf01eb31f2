package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, QuaternaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, IntegerType, LongType}

/** All LSH bucket keys of a vector in one expression:
  * `graft_lsh_keys(emb, planesFlat, tables, planes)` → `array<long>` of
  * length `tables`, where key t packs the sign bits of the `planes`
  * hyperplane projections of table t.
  *
  * Why one expression instead of composing `graft_dot` per plane: the
  * composed form is `tables × planes` inlined dim-length loops inside one
  * whole-stage-codegen method — at 16 tables × 4 planes × dim 64 the
  * generated method is thousands of bytecodes, past HotSpot's inlining
  * budgets (and toward -XX:-DontCompileHugeMethods territory), so it
  * executes as cold interpreter-grade code: the LSH lane measured ~6 s
  * for a 2 000-row fixture, pure per-row evaluation cost. Here the plane
  * matrix is ONE flat float[] reference object walked by a three-level
  * nested loop — ~30 bytecodes in the hot body, JIT-compiles like the
  * hand-written kernel it is. Projection accumulation is double,
  * left-to-right, exactly `graft_dot`'s order, so the keys are
  * bit-identical to the composed form they replace.
  *
  * `planesFlat` (length = tables·planes·dim, plane-major), `tables` and
  * `planes` must be foldable (literals): the matrix is evaluated once at
  * plan time and shipped as a codegen reference object, never per row.
  */
case class LshBucketKeys(
    vector: Expression,
    planesFlat: Expression,
    tables: Expression,
    planes: Expression)
    extends QuaternaryExpression {

  override def first: Expression = vector
  override def second: Expression = planesFlat
  override def third: Expression = tables
  override def fourth: Expression = planes

  override def checkInputDataTypes(): TypeCheckResult = {
    def arrOk(t: DataType): Boolean = t match {
      case ArrayType(FloatType, _) => true
      case _ => false
    }
    if (!arrOk(vector.dataType) || !arrOk(planesFlat.dataType))
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires array<float> vector and planes, got " +
          s"${vector.dataType.simpleString} and ${planesFlat.dataType.simpleString}")
    else if (tables.dataType != IntegerType || planes.dataType != IntegerType)
      TypeCheckResult.TypeCheckFailure(s"$prettyName table/plane counts must be INT")
    else if (!planesFlat.foldable || !tables.foldable || !planes.foldable)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName planes/tables/planes-per-table must be literals")
    else TypeCheckResult.TypeCheckSuccess
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  // conservatively nullable (like DotProduct): even with a non-nullable
  // vector COLUMN, a null ELEMENT propagates to a NULL result, and a
  // false non-nullability promise here would let downstream codegen
  // skip the null check
  override def nullable: Boolean = true

  override def prettyName: String = "graft_lsh_keys"

  private lazy val nTables: Int = tables.eval(null).asInstanceOf[Int]
  private lazy val nPlanes: Int = planes.eval(null).asInstanceOf[Int]
  @transient private lazy val flat: Array[Float] = {
    val a = planesFlat.eval(null).asInstanceOf[ArrayData].toFloatArray()
    require(nTables > 0 && nPlanes > 0 && a.length % (nTables * nPlanes) == 0,
      s"$prettyName: planes length ${a.length} not divisible by tables×planes")
    a
  }
  private lazy val dim: Int = flat.length / (nTables * nPlanes)

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
        s"$prettyName: vector length ${x.numElements()} != plane dim $dim")
    if (elementsNullable) {
      var i = 0
      while (i < dim) { if (x.isNullAt(i)) return null; i += 1 }
    }
    val keys = new Array[Long](nTables)
    var off = 0
    var t = 0
    while (t < nTables) {
      var key = 0L
      var p = 0
      while (p < nPlanes) {
        var acc = 0.0
        var d = 0
        while (d < dim) { acc += x.getFloat(d).toDouble * flat(off + d); d += 1 }
        if (acc >= 0.0) key |= (1L << p)
        off += dim
        p += 1
      }
      keys(t) = key
      t += 1
    }
    new GenericArrayData(keys)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val planesRef = ctx.addReferenceObj("lshPlanes", flat, "float[]")
    val vecCode = vector.genCode(ctx)
    val x = vecCode.value
    val keys = ctx.freshName("keys")
    val off = ctx.freshName("off")
    val t = ctx.freshName("t")
    val p = ctx.freshName("p")
    val d = ctx.freshName("d")
    val acc = ctx.freshName("acc")
    val key = ctx.freshName("key")
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
         |      "$prettyName: vector length " + $x.numElements() + " != plane dim $dim");
         |  }
         |  $nullGuard
         |  if (!${ev.isNull}) {
         |    long[] $keys = new long[$nTables];
         |    int $off = 0;
         |    for (int $t = 0; $t < $nTables; $t++) {
         |      long $key = 0L;
         |      for (int $p = 0; $p < $nPlanes; $p++) {
         |        double $acc = 0.0;
         |        for (int $d = 0; $d < $dim; $d++) {
         |          $acc += ((double) $x.getFloat($d)) * $planesRef[$off + $d];
         |        }
         |        if ($acc >= 0.0) $key |= (1L << $p);
         |        $off += $dim;
         |      }
         |      $keys[$t] = $key;
         |    }
         |    ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($keys);
         |  }
         |}
       """.stripMargin)
  }

  override protected def withNewChildrenInternal(
      first: Expression, second: Expression, third: Expression, fourth: Expression): LshBucketKeys =
    copy(vector = first, planesFlat = second, tables = third, planes = fourth)
}
