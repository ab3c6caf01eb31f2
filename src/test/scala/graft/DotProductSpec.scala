package graft

import graft.functions.GraftExtensions
import graft.ops.Similarity
import org.apache.spark.sql.functions._

/** The native graft_dot expression vs the built-in HOF formulation: same
  * IEEE result (left-to-right double accumulation), SQL-callable, and it
  * stays inside whole-stage codegen (no CodegenFallback marker). */
class DotProductSpec extends SparkSpec {

  import spark.implicits._

  private def embs = Tables.embeddings(spark, sf("sf0.001"))

  test("native dot == HOF dot, bit-identical, on real embeddings") {
    val both = embs.alias("a").join(embs.alias("b"), col("a.vec_id") + 1 === col("b.vec_id"))
      .select(
        Similarity.dot(col("a.embedding"), col("b.embedding")).as("native"),
        Similarity.dotHof(col("a.embedding"), col("b.embedding")).as("hof"))
    assert(both.filter(col("native") =!= col("hof")).isEmpty)
    assert(both.count() > 0)
  }

  test("graft_dot is callable from SQL") {
    embs.limit(5).createOrReplaceTempView("e_dot_test")
    val r = spark.sql(
      "SELECT vec_id, graft_dot(embedding, embedding) AS d FROM e_dot_test")
      .as[(Long, Double)].collect()
    assert(r.length == 5 && r.forall(_._2 > 0.0))
  }

  test("nulls propagate; mismatched lengths raise") {
    val df = Seq(
      (1L, Some(Seq(1.0f, 2.0f)), Some(Seq(3.0f, 4.0f))),
      (2L, None, Some(Seq(1.0f)))
    ).toDF("id", "a", "b")
    val out = df.select(col("id"), GraftExtensions.dot(col("a"), col("b")).as("d")).collect()
    val m = out.map(r => r.getLong(0) -> Option(r.get(1))).toMap
    assert(m(1L).contains(11.0))
    assert(m(2L).isEmpty)

    val bad = Seq((Seq(1.0f, 2.0f), Seq(1.0f))).toDF("a", "b")
    val e = intercept[Exception] {
      bad.select(GraftExtensions.dot(col("a"), col("b"))).collect()
    }
    assert(e.getMessage != null)
  }

  test("null ELEMENTS yield NULL, matching the HOF formulation") {
    val df = Seq(
      (1L, Seq(Option(1.0f), None), Seq(Option(3.0f), Option(4.0f))),
      (2L, Seq(Option(1.0f), Option(2.0f)), Seq(Option(3.0f), Option(4.0f)))
    ).toDF("id", "a", "b")
    val out = df.select(
      col("id"),
      GraftExtensions.dot(col("a"), col("b")).as("native"),
      Similarity.dotHof(col("a"), col("b")).as("hof")).collect()
    val m = out.map(r => r.getLong(0) -> (Option(r.get(1)), Option(r.get(2)))).toMap
    assert(m(1L) == (None, None), s"null element must propagate: ${m(1L)}")
    assert(m(2L)._1.contains(11.0) && m(2L)._2.contains(11.0))
  }

  test("Num.rnd rounds half away from zero for both signs") {
    val cases = Seq(
      0.05 -> 0.1, -0.05 -> -0.1, // the sign-aware tie cases
      0.04 -> 0.0, -0.04 -> -0.0,
      1.25 -> 1.3, -1.25 -> -1.3,
      2.0 -> 2.0, -2.0 -> -2.0)
    val out = cases.map(_._1).toDF("x")
      .select(Num.rnd(col("x"), 1).as("r")).as[Double].collect()
    cases.map(_._2).zip(out).foreach { case (want, got) =>
      assert(got == want, s"expected $want got $got")
    }
  }

  test("expression participates in whole-stage codegen (no fallback)") {
    val plan = embs
      .select(Similarity.dot(col("embedding"), col("embedding")).as("d"))
      .queryExecution.executedPlan
    // the '*' prefix marks operators inside a WholeStageCodegen stage
    val s = plan.toString
    assert(s.linesIterator.exists(l => l.contains("*(1) Project") && l.contains("graft_dot")), s)
  }

  test("graft_lsh_keys equals the composed per-plane dot formulation") {
    // the packed kernel must be BIT-identical to tables×planes graft_dot
    // sign tests (same double accumulation order) — build both from the
    // same deterministic plane components and compare on real embeddings
    val tables = 4
    val planes = 3
    val dim = 64
    def component(t: Int, p: Int, d: Int): Float = {
      var z = t.toLong * 1000003L + p.toLong * 1009L + d.toLong + 0x9e3779b97f4a7c15L
      z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
      z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
      z = z ^ (z >>> 31)
      (z.toDouble / Long.MaxValue.toDouble).toFloat
    }
    val flat = typedLit(
      (0 until tables).flatMap(t => (0 until planes).flatMap(p =>
        (0 until dim).map(d => component(t, p, d)))).toArray)
    def composedKey(t: Int) =
      (0 until planes).map { p =>
        val plane = typedLit((0 until dim).map(d => component(t, p, d)).toArray)
        when(Similarity.dot(col("embedding"), plane) >= 0.0, lit(1L << p)).otherwise(lit(0L))
      }.reduce(_ + _)
    val both = embs.select(
      GraftExtensions.lshKeys(col("embedding"), flat, lit(tables), lit(planes)).as("packed"),
      array((0 until tables).map(composedKey): _*).as("composed"))
    assert(both.filter(col("packed") =!= col("composed")).isEmpty)
    assert(both.count() > 0)
  }

  test("graft_lsh_keys: nulls propagate, wrong vector length raises, SQL-callable") {
    val flat = typedLit(Array.fill(2 * 2 * 2)(0.5f)) // 2 tables × 2 planes × dim 2
    val df = Seq(
      (1L, Some(Seq(1.0f, -1.0f))),
      (2L, None)
    ).toDF("id", "v")
    val out = df
      .select(col("id"),
        GraftExtensions.lshKeys(col("v"), flat, lit(2), lit(2)).as("k"))
      .collect()
      .map(r => r.getLong(0) -> Option(r.get(1))).toMap
    assert(out(2L).isEmpty, "null vector must yield NULL keys")
    // projection of (1,-1)·(0.5,0.5) = 0.0 → sign bit SET (>= 0), both planes
    assert(out(1L).map(_.toString).contains("WrappedArray(3, 3)") ||
      out(1L).exists(_.asInstanceOf[scala.collection.Seq[_]] == Seq(3L, 3L)))
    val bad = Seq((1L, Seq(1.0f, 2.0f, 3.0f))).toDF("id", "v")
      .select(GraftExtensions.lshKeys(col("v"), flat, lit(2), lit(2)))
    val e = intercept[Exception](bad.collect())
    assert(e.getMessage != null)
    Seq((1L, Seq(1.0f, 2.0f))).toDF("id", "v").createOrReplaceTempView("lsh_sql_test")
    val viaSql = spark.sql(
      "SELECT graft_lsh_keys(v, array(" +
        Array.fill(8)("0.5F").mkString(",") + "), 2, 2) AS k FROM lsh_sql_test")
    assert(viaSql.count() === 1)
  }
}
