package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev tool: scale the driver testdata up by an integer factor R so the
  * scaling table in BASELINE.md can be extended beyond sf0.1 (the largest
  * scale the driver ships). `runMain graft.ScaleUp <inDir> <outDir> [R=10]`.
  *
  * This is NOT naive row duplication — exact copies would distort the
  * measured scaling of every similarity/dedup query (10 identical copies of
  * each doc → LSH bucket membership ×10 → candidate pairs ×100, a
  * superlinear blow-up a REAL 10×-larger corpus does not have). Instead,
  * replica i of each table gets:
  *
  *  - **Collision-free key offsets** that preserve referential integrity
  *    (orders.o_custkey shifts by the same stride as customer.c_custkey,
  *    lineitem's three FKs shift with their dims) AND preserve the
  *    modulo-derived semantics baked into the fixtures: the event_id
  *    stride is a multiple of 60 so the %2/%3/%4/%5 engagement/cost
  *    classes (Tables.sessions/sessionCosts) keep their exact rates, and
  *    the doc_id/vec_id strides are multiples of 100 so the %100 split
  *    cut-points (ext19), the %5 train/eval split (ext20) and the %50
  *    query-set fraction (ext3) are scale-invariant.
  *  - **A deterministic per-replica word permutation** of document text:
  *    words are reordered by xxhash64(word, pos, replica), which preserves
  *    the word multiset (token counts, TF, quality ratios unchanged) while
  *    destroying 3-gram shingles across replicas — replicas are NOT
  *    near-dups of their originals, so near-dup density stays constant
  *    as the corpus grows, which is how a real corpus scales. Replica 0
  *    is byte-identical to the input, keeping the genuine dup structure.
  *  - **A deterministic per-replica Rademacher sign-flip** of embedding
  *    components (component j of replica i is multiplied by ±1 from
  *    xxhash64(i, j)): norms and the per-component marginal distribution
  *    are preserved (k-means/IVF geometry stays realistic) while expected
  *    cosine between a replica and its original is ~0 — again, no
  *    artificial near-neighbor inflation.
  *
  * region/nation stay fixed (TPC-H semantics: geography does not grow
  * with scale factor). Dims and facts both replicate ×R, matching TPC-H's
  * scaling rules for customer/supplier/part/orders/lineitem.
  */
object ScaleUp {

  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: ScaleUp <inDir> <outDir> [factor]")
    val (inDir, outDir) = (args(0), args(1))
    val factor = if (args.length > 2) args(2).toInt else 10
    val spark = GraftSession.build("graft-scaleup")
    scale(spark, inDir, outDir, factor)
    spark.stop()
  }

  /** Smallest multiple of `mod` strictly greater than the table's max key —
    * collision-free across replicas, congruent to 0 mod `mod` so every
    * `key % d` class with d | mod is preserved in each replica. */
  private def stride(df: DataFrame, key: String, mod: Long): Long = {
    val mx = df.agg(max(col(key))).head.getLong(0)
    (mx / mod + 1) * mod
  }

  /** Union of R copies of `df` with `shift(replica)` applied to each. */
  private def replicate(df: DataFrame, factor: Int)(
      shift: (DataFrame, Int) => DataFrame): DataFrame =
    (0 until factor).map(i => shift(df, i)).reduce(_ unionByName _)

  def scale(spark: SparkSession, inDir: String, outDir: String, factor: Int): Unit = {
    def in(t: String) = Tables.read(spark, inDir, t)
    def write(t: String, df: DataFrame, parts: Int): Unit =
      df.repartition(parts).write.mode("overwrite").parquet(s"$outDir/$t.parquet")

    // Fixed geography — copy through unchanged.
    write("region", in("region"), 1)
    write("nation", in("nation"), 1)

    val custS = stride(in("customer"), "c_custkey", 100L)
    val suppS = stride(in("supplier"), "s_suppkey", 100L)
    val partS = stride(in("part"), "p_partkey", 100L)
    val ordS = stride(in("orders"), "o_orderkey", 100L)

    write("customer", replicate(in("customer"), factor) { (df, i) =>
      df.withColumn("c_custkey", col("c_custkey") + lit(i * custS))
    }, factor)
    write("supplier", replicate(in("supplier"), factor) { (df, i) =>
      df.withColumn("s_suppkey", col("s_suppkey") + lit(i * suppS))
    }, 1)
    write("part", replicate(in("part"), factor) { (df, i) =>
      df.withColumn("p_partkey", col("p_partkey") + lit(i * partS))
    }, factor)
    write("orders", replicate(in("orders"), factor) { (df, i) =>
      df.withColumn("o_orderkey", col("o_orderkey") + lit(i * ordS))
        .withColumn("o_custkey", col("o_custkey") + lit(i * custS))
    }, factor)
    write("lineitem", replicate(in("lineitem"), factor) { (df, i) =>
      df.withColumn("l_orderkey", col("l_orderkey") + lit(i * ordS))
        .withColumn("l_partkey", col("l_partkey") + lit(i * partS))
        .withColumn("l_suppkey", col("l_suppkey") + lit(i * suppS))
    }, factor * 2)

    // events: stride multiple of 60 = lcm(2,3,4,5) — engagement flags and
    // the cost-coverage quarter (event_id % {2,3,4,5}) keep exact rates.
    // Timestamps shift by a whole-day multiple of the base span per
    // replica: a 10×-bigger event stream covers a 10×-longer timeline at
    // the SAME temporal density, the way a production stream grows. Naive
    // replication into the base window would 10× the density instead, and
    // every time-window operator (interval join, sessionize, tumbling
    // windows) would see ~100× the overlapping pairs — a quadratic
    // blow-up that measures the generator, not the engine. Whole days
    // (UTC) keep per-date volumes and any date-boundary behavior intact.
    // normalizeTs: ts arithmetic below is ns-long; absorb either fixture
    // physical type (TIMESTAMP(NANOS)-as-long or timestamp[us]).
    val ev = Tables.normalizeTs(in("events"), "ts")
    val evS = stride(ev, "event_id", 60L)
    val userS = stride(ev, "user_id", 100L)
    val dayNs = 86400L * 1000000000L
    val tsSpanDays: Long = {
      val r = ev.agg(min(col("ts")), max(col("ts"))).head
      (r.getLong(1) - r.getLong(0)) / dayNs + 1
    }
    write("events", replicate(ev, factor) { (df, i) =>
      df.withColumn("event_id", col("event_id") + lit(i * evS))
        .withColumn("user_id", col("user_id") + lit(i * userS))
        .withColumn("ts", col("ts") + lit(i * tsSpanDays * dayNs))
    }, factor)

    val docS = stride(in("documents"), "doc_id", 100L)
    write("documents", replicate(in("documents"), factor) { (df, i) =>
      val shifted = df.withColumn("doc_id", col("doc_id") + lit(i * docS))
      if (i == 0) shifted
      else {
        // Deterministic word permutation: sort (hash, pos, word) structs —
        // multiset preserved, shingle sets destroyed. No RNG anywhere, so
        // regeneration is bit-stable run to run.
        val words = shifted
          .select(col("doc_id"), col("lang"), col("source"),
            posexplode(split(col("text"), " ")).as(Seq("pos", "word")))
          .withColumn("h", xxhash64(col("word"), col("pos"), lit(i)))
        words
          .groupBy("doc_id", "lang", "source")
          .agg(concat_ws(" ",
            transform(array_sort(collect_list(struct(col("h"), col("pos"), col("word")))),
              x => x("word"))).as("text"))
          .withColumn("n_chars", length(col("text")))
          .select("doc_id", "text", "lang", "source", "n_chars")
      }
    }, factor)

    val vecS = stride(in("embeddings"), "vec_id", 100L)
    write("embeddings", replicate(in("embeddings"), factor) { (df, i) =>
      val shifted = df.withColumn("vec_id", col("vec_id") + lit(i * vecS))
      if (i == 0) shifted
      else shifted.withColumn("embedding",
        // Rademacher diagonal per (replica, component): ±1 from the parity
        // of xxhash64(i, j). Keeps norms, breaks cosine across replicas.
        expr(s"transform(embedding, (x, j) -> CAST(x * (1 - 2 * pmod(xxhash64($i, j), 2)) AS FLOAT))"))
    }, factor)
  }
}
