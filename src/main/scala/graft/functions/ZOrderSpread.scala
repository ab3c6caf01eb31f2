package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** One z-order column's pre-interleaved curve contribution:
  * `graft_zspread(v, boundaries, spreads)` → `spreads[#{i : v ≥ boundaries[i]}]`.
  *
  * Replaces the `aggregate(zip_with(boundaries, deltas, …))` fold in
  * Compaction.zOrderKey (r17 left it interpreted — higher-order
  * functions are CodegenFallback, so every row walked a 255-element
  * lambda tree with per-element boxing, twice per rewrite). Here the
  * boundary array is binary-searched (the boundaries are sorted —
  * approxQuantile output at increasing probabilities) and the result is
  * ONE lookup in the precomputed spread table: ~8 comparisons per row
  * instead of 255 interpreted closures, inside whole-stage codegen. The
  * r17 alternative — unrolling the fold into 2×255 codegen'd `when`
  * terms — was measured and REVERTED (1.2 MB task binaries); this
  * expression ships the tables as two small reference objects instead
  * of an expression tree, so the plan stays tiny.
  *
  * Exact-equivalence argument (the lane outputs must not move): the old
  * fold summed `delta(i) = spread(i+1) − spread(i)` over every i with
  * `v ≥ b(i)`. With b non-decreasing that index set is the prefix
  * `[0, idx)` where `idx = #{i : v ≥ b(i)}`, and the sum telescopes to
  * `spread(idx)` — the table lookup. NULL and NaN inputs satisfy no
  * `≥`, so both yield `spreads[0]`, which the caller builds as
  * `spread(0) = 0` — identical to the fold's when/otherwise-0 path.
  * Duplicate boundaries (skewed columns) count multiply in both
  * formulations (the search returns the upper bound).
  *
  * `boundaries` (array<double>, sorted) and `spreads` (array<long>,
  * length = boundaries+1) must be foldable: evaluated once at plan time,
  * shipped as codegen reference objects, never per row.
  */
case class ZOrderSpread(value: Expression, boundaries: Expression, spreads: Expression)
    extends TernaryExpression {

  override def first: Expression = value
  override def second: Expression = boundaries
  override def third: Expression = spreads

  override def checkInputDataTypes(): TypeCheckResult = {
    if (value.dataType != DoubleType)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName value must be DOUBLE, got ${value.dataType.simpleString}")
    else if (!Seq(boundaries, spreads).forall(_.foldable))
      TypeCheckResult.TypeCheckFailure(s"$prettyName boundary/spread tables must be literals")
    else (boundaries.dataType, spreads.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(LongType, _)) => TypeCheckResult.TypeCheckSuccess
      case (b, s) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (double, array<double>, array<long>), got " +
          s"(${value.dataType.simpleString}, ${b.simpleString}, ${s.simpleString})")
    }
  }

  override def dataType: DataType = LongType

  // never NULL: a NULL value maps to spreads[0] (the curve origin), the
  // same "contributes 0 everywhere" rule the HOF fold implemented
  override def nullable: Boolean = false

  override def prettyName: String = "graft_zspread"

  @transient private lazy val bounds: Array[Double] = {
    val a = boundaries.eval(null).asInstanceOf[ArrayData].toDoubleArray()
    require(a.length >= 1, s"$prettyName: empty boundary table")
    var i = 1
    while (i < a.length) {
      require(a(i - 1) <= a(i), s"$prettyName: boundaries not sorted at $i")
      i += 1
    }
    a
  }
  @transient private lazy val table: Array[Long] = {
    val t = spreads.eval(null).asInstanceOf[ArrayData].toLongArray()
    require(t.length == bounds.length + 1,
      s"$prettyName: spread table length ${t.length} != boundaries ${bounds.length} + 1")
    t
  }

  override def eval(input: InternalRow): Any = {
    val v = value.eval(input)
    if (v == null) return table(0)
    val d = v.asInstanceOf[Double]
    var lo = 0
    var hi = bounds.length
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (d >= bounds(mid)) lo = mid + 1 else hi = mid
    }
    table(lo)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bRef = ctx.addReferenceObj("zBounds", bounds, "double[]")
    val tRef = ctx.addReferenceObj("zSpreads", table, "long[]")
    val vCode = value.genCode(ctx)
    val lo = ctx.freshName("lo")
    val hi = ctx.freshName("hi")
    val mid = ctx.freshName("mid")
    ev.copy(
      code = code"""
         |${vCode.code}
         |long ${ev.value} = $tRef[0];
         |if (!${vCode.isNull}) {
         |  int $lo = 0;
         |  int $hi = $bRef.length;
         |  while ($lo < $hi) {
         |    int $mid = ($lo + $hi) >>> 1;
         |    if (${vCode.value} >= $bRef[$mid]) $lo = $mid + 1; else $hi = $mid;
         |  }
         |  ${ev.value} = $tRef[$lo];
         |}
       """.stripMargin,
      isNull = org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral)
  }

  override protected def withNewChildrenInternal(
      first: Expression, second: Expression, third: Expression): ZOrderSpread =
    copy(value = first, boundaries = second, spreads = third)
}
