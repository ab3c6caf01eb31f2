package graft

import graft.ops.Curation
import org.apache.spark.sql.functions._

/** Curation ops (EXT28–EXT30): source-overlap matrix, token-budget
  * truncation, deterministic seeded shuffle. Value semantics beyond what
  * the DuckDB oracles pin: hand-built overlap ground truth, prefix/count
  * invariants, permutation + replay laws. */
class CurationSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Tables.documents(spark, sf("sf0.001"))

  test("sourceOverlap matches hand-computed Jaccard on a planted corpus") {
    // srcA and srcB share exactly one 3-shingle ("x y z"); srcC shares none.
    val planted = Seq(
      (1L, "a b x y z q", "srcA"),
      (2L, "x y z k l m", "srcB"),
      (3L, "p q r s t u", "srcC"))
      .toDF("doc_id", "text", "source")
    val got = Curation.sourceOverlap(planted)
      .select("src_a", "src_b", "n_a", "n_b", "inter", "jaccard")
      .as[(String, String, Long, Long, Long, Double)].collect().toSet
    // 6 tokens → 4 shingles per doc; |A∪B| = 4 + 4 − 1 = 7.
    assert(got === Set(("srcA", "srcB", 4L, 4L, 1L, 0.1429)))
  }

  test("sourceOverlap on the fixture: bounded pair count, jaccard in (0, 1]") {
    val m = Curation.sourceOverlap(docs).cache()
    val nSources = docs.select("source").distinct().count()
    assert(m.count() <= nSources * (nSources - 1) / 2)
    assert(m.filter(col("jaccard") <= 0 || col("jaccard") > 1).count() === 0)
    assert(m.filter(col("src_a") >= col("src_b")).count() === 0, "pair order canonical")
    assert(m.filter(col("inter") > least(col("n_a"), col("n_b"))).count() === 0,
      "intersection cannot exceed either set")
  }

  test("truncateToBudget: prefix property, exact counts, no-op under budget") {
    val t = Curation.truncateToBudget(docs, maxTokens = 10).cache()
    assert(t.filter(col("kept_tokens") =!= least(col("n_tokens"), lit(10L))).count() === 0)
    assert(t.filter(size(split(col("text_trunc"), " ")).cast("long") =!= col("kept_tokens"))
      .count() === 0, "truncated text carries exactly kept_tokens tokens")
    // the truncated text is a byte prefix of the original
    val joined = t.join(docs, "doc_id")
    assert(joined.filter(!col("text").startsWith(col("text_trunc"))).count() === 0)
    // a budget beyond every doc length is the identity
    val big = Curation.truncateToBudget(docs, maxTokens = 1000000)
    assert(big.join(docs, "doc_id").filter(col("text") =!= col("text_trunc")).count() === 0)
  }

  test("seededShuffle is a replayable permutation; the seed actually shuffles") {
    val a = Curation.seededShuffle(docs, seed = 42L, shards = 8).cache()
    val n = docs.count()
    assert(a.count() === n)
    assert(a.select("doc_id").distinct().count() === n)
    assert(a.select("shard", "pos").distinct().count() === n, "slots are unique")
    // pos is contiguous 1..k within each shard
    val bad = a.groupBy("shard")
      .agg(count(lit(1)).as("k"), max("pos").as("mx"), min("pos").as("mn"))
      .filter(col("mx") =!= col("k") || col("mn") =!= 1L)
    assert(bad.count() === 0)
    // replay: same seed ⇒ identical slots; different seed ⇒ a different order
    val b = Curation.seededShuffle(docs, seed = 42L, shards = 8)
    assert(a.except(b).count() === 0 && b.except(a).count() === 0)
    val c = Curation.seededShuffle(docs, seed = 7L, shards = 8)
    assert(c.except(a).count() > 0, "changing the seed must move documents")
    // The seed must change RELATIVE order, not just shard labels: an
    // additive-only seed shifts every hash by a constant, relabeling
    // shards while every co-sharded pair keeps its order. Take doc pairs
    // co-sharded under BOTH seeds and require a discordant pair (order
    // inverted between epochs).
    val slots42 = a.select(col("doc_id"), col("shard").as("sa"), col("pos").as("pa"))
    val slots7 = c.select(col("doc_id"), col("shard").as("sc"), col("pos").as("pc"))
    val j = slots42.join(slots7, "doc_id")
    val pairs = j.as("x").join(j.as("y"),
      col("x.sa") === col("y.sa") && col("x.sc") === col("y.sc") &&
        col("x.doc_id") < col("y.doc_id"))
    val discordant = pairs.filter(
      (col("x.pa") < col("y.pa")) =!= (col("x.pc") < col("y.pc"))).count()
    assert(discordant > 0, "changing the seed must invert some within-shard order")
  }

  test("sourceCap keeps at most N per source, longest-first, via WindowGroupLimit") {
    import spark.implicits._
    val docs = Tables.documents(spark, sf("sf0.001"))
    val capped = graft.ops.Curation.sourceCap(docs, maxPerGroup = 3)
    val perSource = capped.groupBy("source").count().select("count").as[Long].collect()
    assert(perSource.nonEmpty && perSource.forall(_ <= 3))
    // the kept set is exactly the 3 longest (doc_id tie-break) per source
    val want = docs.select($"source", $"doc_id", $"n_chars")
      .as[(String, Long, Long)].collect()
      .groupBy(_._1).values.flatMap(g =>
        g.sortBy(t => (-t._3, t._2)).take(3).map(t => (t._1, t._2))).toSet
    val got = capped.select($"source", $"doc_id").as[(String, Long)].collect().toSet
    assert(got === want)
    // scale shape: partial top-N runs BEFORE the exchange
    val plan = capped.queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"), plan)
    assert(plan.indexOf("WindowGroupLimit") != plan.lastIndexOf("WindowGroupLimit"),
      "expected a partial+final WindowGroupLimit pair\n" + plan)
  }
}
