package graft

import graft.ops.SpanDedup
import org.apache.spark.sql.functions._

/** EXT33 exact-substring span dedup (SpanDedup): planted-corpus ground
  * truth for span detection, merging, keep-first election and text
  * reconstruction — the value semantics behind the ext33 DuckDB oracles. */
class SpanDedupSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Tables.documents(spark, sf("sf0.001"))

  // Doc 1 and doc 2 share an 8-token run (positions 2..9 in doc 1,
  // 0..7 in doc 2); doc 3 is clean. L=5 → 4 duplicated grams, all of
  // whose first occurrences live in doc 1, so doc 2 carries one merged
  // 8-token span and doc 1 carries none.
  private val planted = Seq(
    (1L, "u v c d e f g h i j k l"),
    (2L, "c d e f g h i j x y"),
    (3L, "p q r s t u v w a b"))
    .toDF("doc_id", "text")

  test("duplicatedSpans: shared run marked only in the later doc, merged maximal") {
    val spans = SpanDedup.duplicatedSpans(planted, L = 5)
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(spans === Set((2L, 0L, 7L, 8L)))
  }

  test("duplicatedSpans: within-doc repetition keeps the first occurrence") {
    // one doc repeating a 5-gram at positions 0 and 7: only the second
    // occurrence is redundant → one span [7, 11].
    val rep = Seq((9L, "a b c d e x y a b c d e")).toDF("doc_id", "text")
    val spans = SpanDedup.duplicatedSpans(rep, L = 5)
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(spans === Set((9L, 7L, 11L, 5L)))
  }

  test("duplicatedSpans: non-adjacent spans stay separate") {
    // doc 21 duplicates doc 20's grams at [0,4] and [10,14] with a
    // unique 5-token gap — two islands, not one.
    val two = Seq(
      (20L, "a b c d e z1 z2 z3 z4 z5 f g h i j"),
      (21L, "a b c d e q1 q2 q3 q4 q5 f g h i j"))
      .toDF("doc_id", "text")
    val spans = SpanDedup.duplicatedSpans(two, L = 5)
      .filter($"doc_id" === 21L)
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(spans === Set((21L, 0L, 4L, 5L), (21L, 10L, 14L, 5L)))
  }

  test("trimSpans: redundant tokens removed, order preserved, clean docs verbatim") {
    val t = SpanDedup.trimSpans(planted, L = 5)
      .as[(Long, Long, Long, String)].collect().map(r => r._1 -> r).toMap
    assert(t(1L) === ((1L, 12L, 12L, "u v c d e f g h i j k l")))
    assert(t(2L) === ((2L, 10L, 2L, "x y")))
    assert(t(3L) === ((3L, 10L, 10L, "p q r s t u v w a b")))
  }

  test("fixture: spans cover exactly the redundant positions; trim is consistent") {
    val l = 5
    val spans = SpanDedup.duplicatedSpans(docs, L = l).cache()
    assert(spans.count() > 0, "fixture corpus has duplicated spans")
    assert(spans.filter($"span_tokens" =!= $"span_end" - $"span_start" + 1).count() === 0)
    assert(spans.filter($"span_tokens" < l).count() === 0,
      s"every span covers at least one $l-gram")
    // spans per doc never overlap or touch (maximal merge)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id").orderBy("span_start")
    assert(spans.withColumn("prev_end", lag("span_end", 1).over(w))
      .filter($"prev_end".isNotNull && $"span_start" <= $"prev_end" + 1)
      .count() === 0)
    // trim removes exactly the span-covered token count per doc
    val removedBySpans = spans.groupBy("doc_id")
      .agg(sum("span_tokens").as("removed"))
    val t = SpanDedup.trimSpans(docs, L = l)
      .withColumn("removed_t", $"n_tokens" - $"kept_tokens")
    val joined = t.join(removedBySpans, Seq("doc_id"), "left")
      .withColumn("removed", coalesce($"removed", lit(0L)))
    assert(joined.filter($"removed_t" =!= $"removed").count() === 0)
    spans.unpersist()
  }
}
