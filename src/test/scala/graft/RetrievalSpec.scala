package graft

import graft.ops.Retrieval
import org.apache.spark.sql.functions._

/** BM25 laws on a hand corpus + lane shape. */
class RetrievalSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "rare common common"),
    (2L, "common common common"),
    (3L, "rare rare common"),
    (4L, "other words entirely")
  ).toDF("doc_id", "text")

  test("bm25 ranks rarer matches above common ones and honors topK") {
    val q = Seq((1, "rare")).toDF("query_id", "term")
    val r = Retrieval.bm25(docs, q, topK = 2)
      .orderBy("rank").select("doc_id").as[Long].collect()
    // Only docs 1 and 3 contain 'rare'; doc 3 has higher tf → rank 1.
    assert(r.toSeq == Seq(3L, 1L))
  }

  test("bm25 matches the closed-form score on a hand corpus") {
    val q = Seq((7, "rare")).toDF("query_id", "term")
    val got = Retrieval.bm25(docs, q, topK = 10)
      .filter($"doc_id" === 3L).select("score").as[Double].head()
    // N=4, df=2, tf=2, dl=3, avgdl=3, k1=1.2, b=0.75
    val idf = math.log(1.0 + (4.0 - 2 + 0.5) / (2 + 0.5))
    val want = idf * (2.0 * 2.2) / (2.0 + 1.2 * (1.0 - 0.75 + 0.75 * 3.0 / 3.0))
    assert(math.abs(got - want) < 1e-12, s"got $got want $want")
  }

  test("multi-term scores are the sum of single-term scores") {
    val both = Seq((1, "rare"), (1, "common")).toDF("query_id", "term")
    val single = Retrieval.bm25(docs, Seq((1, "rare")).toDF("query_id", "term"), topK = 10)
      .union(Retrieval.bm25(docs, Seq((1, "common")).toDF("query_id", "term"), topK = 10))
      .groupBy("doc_id").agg(sum("score").as("s"))
    val combined = Retrieval.bm25(docs, both, topK = 10)
      .select($"doc_id", $"score")
    val joined = combined.join(single, "doc_id")
      .select(abs($"score" - $"s").as("d")).as[Double].collect()
    assert(joined.nonEmpty && joined.forall(_ < 1e-12))
  }
}
