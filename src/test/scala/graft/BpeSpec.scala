package graft

import graft.ops.Bpe
import org.apache.spark.sql.functions._

/** BPE vocabulary induction: hand-checked merge sequences (the
  * Sennrich et al. 2016 worked-example style), greedy-run semantics,
  * and the merge-resume contract `ext42_bpe`'s unrolled oracle relies
  * on. */
class BpeSpec extends SparkSpec {

  import spark.implicits._

  test("hand-checked merge sequence: counts, tie-breaks, and resumed state") {
    // words: low×3, lower×2, newest×1
    // round 1: (l,o)=5 ties (o,w)=5 → lexicographic → (l,o)
    // round 2: lo,w = 5 wins
    // round 3: (e,r)=2 ties (low,e)=2 → "e" < "low" → (e,r)
    val docs = Seq((1L, "low low lower newest"), (2L, "low lower")).toDF("doc_id", "text")
    val got = Bpe.bpeMerges(docs, merges = 3)
      .as[(Long, String, String, Long)].collect().toSeq
    assert(got === Seq((1L, "l", "o", 5L), (2L, "lo", "w", 5L), (3L, "e", "r", 2L)))
    // resumed vocabulary state after applying the learned rules
    val state = Bpe.applyMerges(docs, got.map(m => (m._2, m._3)))
      .as[(String, Long, Seq[String])].collect().map(r => r._1 -> r._3).toMap
    assert(state("low") === Seq("low"))
    assert(state("lower") === Seq("low", "er"))
    assert(state("newest") === Seq("n", "e", "w", "e", "s", "t"))
  }

  test("greedy left-to-right run merging: 'aaaa' becomes [aa, aa], never [a, aa, a]") {
    val docs = Seq((1L, "aaaa")).toDF("doc_id", "text")
    val got = Bpe.bpeMerges(docs, merges = 2)
      .as[(Long, String, String, Long)].collect().toSeq
    // get_stats counts every adjacent position: (a,a) appears 3× in aaaa
    assert(got.head === ((1L, "a", "a", 3L)))
    // after [aa, aa], the only pair left is (aa, aa)
    assert(got(1) === ((2L, "aa", "aa", 1L)))
    val state = Bpe.applyMerges(docs, Seq(("a", "a")))
      .as[(String, Long, Seq[String])].collect()
    assert(state.head._3 === Seq("aa", "aa"), "greedy non-overlapping merge")
  }

  test("odd run: 'aaaaa' merges to [aa, aa, a]") {
    val docs = Seq((1L, "aaaaa")).toDF("doc_id", "text")
    val state = Bpe.applyMerges(docs, Seq(("a", "a")))
      .as[(String, Long, Seq[String])].collect()
    assert(state.head._3 === Seq("aa", "aa", "a"))
  }

  test("a pairless vocabulary stops early instead of failing") {
    val docs = Seq((1L, "a b c a")).toDF("doc_id", "text")
    val got = Bpe.bpeMerges(docs, merges = 3).collect()
    assert(got.isEmpty, "single-character words have no pairs to merge")
  }

  test("encode counts BPE tokens per doc through the vocabulary join") {
    // after merging (l,o) then (lo,w): low=1 sym, lower=3 (low,e,r),
    // hi=2 (h,i) — counts follow the doc's word multiset
    val docs = Seq((1L, "low low hi"), (2L, "lower")).toDF("doc_id", "text")
    val got = Bpe.encodeCounts(docs, Seq(("l", "o"), ("lo", "w")))
      .as[(Long, Long)].collect().toMap
    assert(got === Map(1L -> 4L, 2L -> 3L))
    // zero merges degenerate to character counts per doc
    val chars = Bpe.encodeCounts(docs, Nil).as[(Long, Long)].collect().toMap
    assert(chars === Map(1L -> 8L, 2L -> 5L))
  }

  test("frequency weighting: a pair in a frequent word beats a pair in a rare long word") {
    // 'xy' appears 10 times -> (x,y)=10; 'abcde' once -> each pair =1
    val docs = Seq((1L, (Seq.fill(10)("xy") :+ "abcde").mkString(" "))).toDF("doc_id", "text")
    val got = Bpe.bpeMerges(docs, merges = 1)
      .as[(Long, String, String, Long)].collect()
    assert(got.head === ((1L, "x", "y", 10L)))
  }
}
