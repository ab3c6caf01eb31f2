package graft

import org.apache.spark.sql.functions._

import java.nio.file.Files

/** ScaleUp (the BASELINE.md scaling-table data generator): replication is
  * exact ×R on every growing table, collision-free, referentially intact,
  * modulo-class-preserving, and non-degenerate for similarity workloads
  * (replica docs are word-permutations, replica embeddings sign-flips —
  * neither is a near-dup of its original). */
class ScaleUpSpec extends SparkSpec {

  private lazy val outDir: String = {
    val d = Files.createTempDirectory("graft-scaleup").toString
    ScaleUp.scale(spark, sf("sf0.001"), d, factor = 3)
    d
  }
  private def out(t: String) = spark.read.parquet(s"$outDir/$t.parquet")
  // events routes through the normalizing reader: the ts assertions below
  // do long arithmetic, and the scaled output carries ns-long ts.
  private def base(t: String) =
    if (t == "events") Tables.events(spark, sf("sf0.001"))
    else Tables.read(spark, sf("sf0.001"), t)

  test("row counts scale by the factor; geography stays fixed") {
    for (t <- Seq("customer", "supplier", "part", "orders", "lineitem",
        "events", "documents", "embeddings"))
      assert(out(t).count() === 3 * base(t).count(), t)
    for (t <- Seq("region", "nation"))
      assert(out(t).count() === base(t).count(), t)
  }

  test("keys stay unique and lineitem FKs resolve against the scaled dims") {
    for ((t, k) <- Seq("events" -> "event_id", "documents" -> "doc_id",
        "embeddings" -> "vec_id", "orders" -> "o_orderkey", "customer" -> "c_custkey"))
      assert(out(t).select(k).distinct.count() === out(t).count(), s"$t.$k")
    val li = out("lineitem")
    assert(li.join(out("orders"), li("l_orderkey") === col("o_orderkey"), "left_anti").count() === 0)
    assert(li.join(out("part"), li("l_partkey") === col("p_partkey"), "left_anti").count() === 0)
    assert(li.join(out("supplier"), li("l_suppkey") === col("s_suppkey"), "left_anti").count() === 0)
    assert(out("orders").join(out("customer"),
      col("o_custkey") === col("c_custkey"), "left_anti").count() === 0)
  }

  test("modulo-derived fixture classes keep their exact rates per replica") {
    // event_id % {2,3,4,5} drive engagement flags + cost coverage; the
    // stride is a multiple of 60, so each replica reproduces the base rates.
    for (m <- Seq(2, 3, 4, 5)) {
      val b = base("events").filter(col("event_id") % m === 0).count()
      assert(out("events").filter(col("event_id") % m === 0).count() === 3 * b, s"% $m")
    }
    // doc_id % 100 (ext19 split cut-points) and % 5 (ext20 train/eval).
    for (m <- Seq(5, 100)) {
      val b = base("documents").filter(col("doc_id") % m === 0).count()
      assert(out("documents").filter(col("doc_id") % m === 0).count() === 3 * b, s"doc % $m")
    }
  }

  test("replica event streams occupy disjoint time windows at base density") {
    // temporal density must stay constant as the stream grows — replica
    // windows may not overlap (else interval joins measure the generator's
    // artificial pile-up, not the engine)
    val evS = {
      val mx = base("events").agg(max("event_id")).head.getLong(0)
      (mx / 60 + 1) * 60
    }
    val windows = out("events")
      .groupBy((col("event_id") / evS).cast("long").as("replica"))
      .agg(min("ts").as("lo"), max("ts").as("hi"))
      .orderBy("replica")
      .collect()
    assert(windows.length === 3)
    windows.sliding(2).foreach { w =>
      assert(w(0).getLong(2) < w(1).getLong(1),
        s"replica ${w(0).getLong(0)} window overlaps replica ${w(1).getLong(0)}")
    }
    // each replica spans the base window's width (same density, longer timeline)
    val baseSpan = {
      val r = base("events").agg(min("ts"), max("ts")).head
      r.getLong(1) - r.getLong(0)
    }
    windows.foreach(w => assert(w.getLong(2) - w.getLong(1) === baseSpan))
  }

  test("replica documents preserve the word multiset but not the word order") {
    val docS = {
      val mx = base("documents").agg(max("doc_id")).head.getLong(0)
      (mx / 100 + 1) * 100
    }
    val joined = base("documents").select(col("doc_id"), col("text").as("orig"))
      .join(out("documents").select((col("doc_id") - lit(docS)).as("doc_id"), col("text")),
        Seq("doc_id"))
      .select(
        (sort_array(split(col("orig"), " ")) === sort_array(split(col("text"), " ")))
          .as("same_multiset"),
        (col("orig") === col("text")).as("same_text"))
    val n = joined.count()
    assert(n === base("documents").count())
    assert(joined.filter(col("same_multiset")).count() === n, "word multiset must survive")
    assert(joined.filter(col("same_text")).count() === 0, "no replica doc may be byte-identical")
  }

  test("replica embeddings preserve norms but not direction") {
    val vecS = {
      val mx = base("embeddings").agg(max("vec_id")).head.getLong(0)
      (mx / 100 + 1) * 100
    }
    val stats = base("embeddings").select(col("vec_id"), col("embedding").as("a"))
      .join(out("embeddings").select((col("vec_id") - lit(vecS)).as("vec_id"),
        col("embedding").as("b")), Seq("vec_id"))
      .select(
        abs(graft.functions.GraftExtensions.dot(col("a"), col("a")) - graft.functions.GraftExtensions.dot(col("b"), col("b")))
          .as("norm_diff"),
        (graft.functions.GraftExtensions.dot(col("a"), col("b")) /
          sqrt(graft.functions.GraftExtensions.dot(col("a"), col("a")) * graft.functions.GraftExtensions.dot(col("b"), col("b"))))
          .as("cos"))
      .agg(max("norm_diff").as("max_norm_diff"), avg(abs(col("cos"))).as("mean_abs_cos"))
      .head
    assert(stats.getDouble(0) < 1e-3, "norms must be preserved (float roundoff only)")
    assert(stats.getDouble(1) < 0.25, "replicas must not be near-parallel to originals")
  }
}
