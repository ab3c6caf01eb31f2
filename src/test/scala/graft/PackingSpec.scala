package graft

import graft.ops.{Chunking, Packing, TextOps}
import org.apache.spark.sql.functions._

/** Training-batch assembly: concat-and-split sequence packing, LPT-style
  * balanced shards, and the cross-document duplication audit. Every
  * semantic claim is checked against a sequential Scala reconstruction on
  * an adversarial layout, and the plan invariants (no global window, no
  * single-partition exchange) are pinned. */
class PackingSpec extends SparkSpec {

  import spark.implicits._

  private lazy val docs = Tables.documents(spark, sf("sf0.001"))

  test("packSpans equals a sequential per-shard reconstruction") {
    val L = 64L
    val got = Packing
      .packSpans(docs, "doc_id", size(TextOps.tokens(col("text"))), L, nShards = 4)
      .select("doc_id", "shard", "n_tok", "block_first", "block_last", "n_blocks")
      .as[(Long, Long, Long, Long, Long, Long)].collect()

    // reconstruct: per shard, docs in id order, running token total
    val source = docs
      .select(col("doc_id"), (size(TextOps.tokens(col("text"))) + 1).cast("long").as("n_tok"))
      .as[(Long, Long)].collect().sortBy(_._1)
    val expected = source.toSeq
      .groupBy { case (id, _) => id % 4 }
      .flatMap { case (shard, rows) =>
        var cum = 0L
        rows.map { case (id, tok) =>
          val first = cum / L
          cum += tok
          val last = (cum - 1) / L
          (id, shard, tok, first, last, last - first + 1)
        }
      }
      .toSet
    assert(got.length === source.length)
    assert(got.toSet === expected)
  }

  test("packSummary: tail-only padding, fill ratio consistent with spans") {
    val L = 64L
    val summary = Packing
      .packSummary(docs, "doc_id", size(TextOps.tokens(col("text"))), L, nShards = 4)
      .select("shard", "n_docs", "total_tokens", "n_blocks", "pad_tokens")
      .as[(Long, Long, Long, Long, Long)].collect()
    assert(summary.length === 4)
    summary.foreach { case (_, nDocs, total, nBlocks, pad) =>
      assert(nDocs > 0 && total > 0)
      assert(pad >= 0 && pad < L, "concat-and-split pads only the shard's tail block")
      assert(nBlocks === (total + L - 1) / L)
    }
    // block counts agree with the per-doc span frame
    val maxBlock = Packing
      .packSpans(docs, "doc_id", size(TextOps.tokens(col("text"))), L, nShards = 4)
      .groupBy("shard").agg(max("block_last").as("mb"))
      .as[(Long, Long)].collect().toMap
    summary.foreach { case (shard, _, _, nBlocks, _) =>
      assert(maxBlock(shard) === nBlocks - 1, s"shard $shard span/summary disagree")
    }
  }

  test("balancedShards: serpentine LPT bounds imbalance by one round's spread") {
    val loads = Packing.balancedShards(docs, "n_chars", "doc_id", nShards = 8)
      .groupBy("shard").agg(sum("n_chars").as("load"))
      .as[(Long, Long)].collect().toMap
    assert(loads.keySet === (0L until 8L).toSet)
    // serpentine dealing over a descending size order keeps every shard
    // within one largest-document of every other
    val maxDoc = docs.agg(max("n_chars")).as[Long].head()
    val spread = loads.values.max - loads.values.min
    assert(spread <= maxDoc,
      s"imbalance $spread exceeds one max-document bound $maxDoc: $loads")
    // naive doc_id % 8 sharding is strictly worse or equal on this corpus
    val naive = docs.groupBy(pmod(col("doc_id"), lit(8)).as("shard"))
      .agg(sum("n_chars").as("load")).select("load").as[Long].collect()
    assert(spread <= naive.max - naive.min,
      "size-ranked serpentine should not lose to naive hash sharding")
  }

  test("balancedShards is deterministic across input partitionings") {
    val a = Packing.balancedShards(docs.repartition(13), "n_chars", "doc_id", 8)
      .select("doc_id", "shard").as[(Long, Long)].collect().toMap
    val b = Packing.balancedShards(docs.repartition(3), "n_chars", "doc_id", 8)
      .select("doc_id", "shard").as[(Long, Long)].collect().toMap
    assert(a === b)
  }

  test("globalRankBy ranks composite desc/asc orders exactly") {
    val rows = Seq((1L, 5L), (2L, 9L), (3L, 5L), (4L, 9L), (5L, 1L))
    val df = rows.toDF("id", "sz").repartition(7)
    val got = Chunking.globalRankBy(df, Seq(col("sz").desc, col("id")), "rn")
      .select("id", "rn").as[(Long, Long)].collect().toMap
    val expected = rows.sortBy { case (id, sz) => (-sz, id) }
      .zipWithIndex.map { case ((id, _), i) => id -> (i + 1L) }.toMap
    assert(got === expected)
  }

  test("packing and sharding plan no global window / single-partition exchange") {
    val spans = Packing.packSpans(docs, "doc_id", size(TextOps.tokens(col("text"))), 64L, 4)
    val shards = Packing.balancedShards(docs, "n_chars", "doc_id", 8)
    Seq(spans, shards).foreach { frame =>
      frame.collect()
      val plan = frame.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange SinglePartition"),
        s"planned a global exchange:\n$plan")
    }
    // the pack window must be keyed by shard, not global
    val spanPlan = spans.queryExecution.executedPlan.toString
    assert(spanPlan.contains("shard"), spanPlan)
  }

  test("sharedGramAudit counts cross-document gram sharing, not within-doc repeats") {
    val corpus = Seq(
      (0L, "alpha beta gamma delta"),       // shares "alpha beta gamma" with doc 1
      (1L, "alpha beta gamma epsilon"),
      (2L, "zeta eta theta iota"),          // fully unique grams
      (3L, "kappa kappa kappa kappa kappa") // repeats WITHIN the doc only
    ).toDF("doc_id", "text")
    val got = TextOps.sharedGramAudit(corpus)
      .select("doc_id", "n_shingles", "n_shared")
      .as[(Long, Long, Long)].collect().map { case (k, a, b) => k -> ((a, b)) }.toMap
    assert(got(0L) === ((2L, 1L)), "doc 0: 2 distinct grams, 1 shared with doc 1")
    assert(got(1L) === ((2L, 1L)))
    assert(got(2L) === ((2L, 0L)), "unique grams are not shared")
    assert(got(3L) === ((1L, 0L)),
      "a gram repeated only within one doc is distinct-collapsed and unshared")
  }
}
