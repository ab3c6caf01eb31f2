package graft

import graft.sources.Compaction
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The native graft_zspread expression vs the r17 HOF formulation it
  * replaced (`aggregate(zip_with(bounds, deltas, …))`): identical z-values
  * on every row — the telescoping-sum ⇔ table-lookup equivalence that
  * keeps the z-order lanes' file layouts (and so the skipping lanes'
  * pruned row sets) byte-stable across the optimization. */
class ZOrderSpreadSpec extends SparkSpec {

  import spark.implicits._

  /** The exact pre-r18 fold, kept here as the reference semantics. */
  private def hofZ(df: org.apache.spark.sql.DataFrame, zCols: Seq[String], bits: Int): Column = {
    val buckets = 1 << bits
    val probs = (1 until buckets).map(_.toDouble / buckets).toArray
    val k = zCols.size
    def spread(v: Long, j: Int): Long =
      (0 until bits).map(p => ((v >> p) & 1L) << (p * k + j)).sum
    val allBounds = df.stat.approxQuantile(zCols.toArray, probs, 1.0 / (4.0 * buckets))
    val zParts = zCols.zipWithIndex.map { case (c, j) =>
      val bs = allBounds(j)
      val deltas = bs.indices.map(i => spread(i + 1L, j) - spread(i.toLong, j)).toArray
      aggregate(
        zip_with(lit(bs), lit(deltas),
          (b, dlt) => when(col(c).cast("double") >= b, dlt).otherwise(0L)),
        lit(0L),
        (acc, x) => acc + x)
    }
    zParts.reduce(_ + _)
  }

  test("native z-key == HOF z-key on real events, both bit widths") {
    val ev = Tables.events(spark, sf("sf0.001"))
      .select("event_id", "user_id", "value")
    for (bits <- Seq(6, 8)) {
      val cols = Seq("event_id", "user_id")
      val both = ev
        .withColumn("znative", Compaction.zOrderKey(ev, cols, bits))
        .withColumn("zhof", hofZ(ev, cols, bits))
      assert(both.filter(col("znative") =!= col("zhof")).isEmpty,
        s"native and HOF z-values diverge at bits=$bits")
      assert(both.filter(col("znative") =!= 0L).count() > 0, "degenerate all-zero key")
    }
  }

  test("NULL and skewed duplicate-boundary inputs match the fold semantics") {
    // one constant column → every approxQuantile boundary identical
    // (the duplicate-boundary edge); NULLs must land at the curve origin
    val df = Seq(
      (Some(1.0), Some(5.0)), (Some(2.0), Some(5.0)), (Some(3.0), Some(5.0)),
      (None: Option[Double], Some(5.0)), (Some(100.0), None: Option[Double])
    ).toDF("a", "b")
    val cols = Seq("a", "b")
    val both = df
      .withColumn("znative", Compaction.zOrderKey(df, cols, 4))
      .withColumn("zhof", hofZ(df, cols, 4))
    assert(both.filter(col("znative") =!= col("zhof")).isEmpty)
    // NULL in BOTH columns contributes 0 in both formulations
    val nulls = Seq((None: Option[Double], None: Option[Double])).toDF("a", "b")
      .union(Seq((Some(1.0), Some(2.0))).toDF("a", "b"))
    val z = nulls.withColumn("z", Compaction.zOrderKey(nulls, cols, 4))
    assert(z.filter(col("a").isNull && col("b").isNull)
      .filter(col("z") =!= 0L).isEmpty, "all-NULL row must sit at the curve origin")
  }

  test("graft_zspread is callable from SQL and never CodegenFallback-null") {
    Seq(0.5, 1.5, 2.5, Double.NaN).toDF("v").createOrReplaceTempView("zs_test")
    val r = spark.sql(
      "SELECT v, graft_zspread(v, array(1.0d, 2.0d), array(0L, 1L, 3L)) AS z FROM zs_test")
      .collect().map(x => (x.getDouble(0), x.getLong(1)))
    val m = r.toMap
    assert(m(0.5) == 0L && m(1.5) == 1L && m(2.5) == 3L)
    assert(r.collectFirst { case (v, z) if v.isNaN => z }.contains(0L),
      "NaN satisfies no boundary — curve origin, like the fold")
  }
}
