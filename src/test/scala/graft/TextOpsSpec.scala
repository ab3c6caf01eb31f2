package graft

import graft.ops.{Dedup, Sampling, TextOps}
import org.apache.spark.sql.functions.{col, countDistinct}

/** Hand-computed fixtures for the repetition quality signals — the oracle
  * row (ext4_repetition) pins engine parity at corpus scale; this pins the
  * DEFINITIONS on documents small enough to verify by eye. Signals come
  * back rounded to 4dp (Num.rnd), so expectations are the rounded exact
  * ratios. */
class TextOpsSpec extends SparkSpec {

  import spark.implicits._

  private def signals(texts: (Long, String)*): Map[Long, (Long, Double, Double, Double)] =
    TextOps.repetitionSignals(texts.toDF("doc_id", "text"))
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))))
      .toMap

  test("repetition signals on hand-checked documents") {
    val got = signals(
      // 6 tokens, 3 distinct → ratio 1−3/6 = 0.5; 2-grams: "a b"×2,
      // "b a"×2, "a c"×1 → top2 = 2 of 5 slots = 0.4; the two 5-grams
      // are distinct → no dup coverage
      1L -> "a b a b a c",
      // one 5-gram chanted twice: "p q r s t" at positions 0 and 5 covers
      // all 10 positions; 5 distinct tokens in 10 → ratio 0.5; top 2-gram
      // ("p q" et al.) occurs 2 of 9 slots = 0.2222
      2L -> "p q r s t p q r s t",
      // no repetition at all: 6 distinct tokens, every 2-gram unique →
      // top2 = 1 of 5 slots = 0.2
      3L -> "u v w x y z")

    assert(got(1L) === ((6L, 0.5, 0.4, 0.0)))
    assert(got(2L) === ((10L, 0.5, 0.2222, 1.0)))
    assert(got(3L) === ((6L, 0.0, 0.2, 0.0)))
  }

  test("repetition signals: degenerate short documents don't divide by zero") {
    val got = signals(1L -> "solo", 2L -> "two tokens")
    // 1 token: no 2-gram slots (denominator guarded to 1), no 5-grams
    assert(got(1L) === ((1L, 0.0, 0.0, 0.0)))
    // 2 tokens: the one 2-gram fills its one slot → frac_top2gram = 1.0
    assert(got(2L) === ((2L, 0.0, 1.0, 0.0)))
  }

  test("unigram log-prob on a hand-checked corpus") {
    // Corpus: "a a b" + "a c" → counts a=3, b=1, c=1, total=5.
    // doc 1: mean(ln(3/5), ln(3/5), ln(1/5)) ; doc 2: mean(ln(3/5), ln(1/5)).
    val docs = Seq((1L, "a a b"), (2L, "a c")).toDF("doc_id", "text")
    val got = TextOps.unigramLogProb(docs)
      .as[(Long, Long, Double)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    def rnd4(x: Double) = math.floor(x.abs * 1e4 + 0.5) / 1e4 * math.signum(x)
    assert(got(1L) === ((3L, rnd4((2 * math.log(3.0 / 5) + math.log(1.0 / 5)) / 3))))
    assert(got(2L) === ((2L, rnd4((math.log(3.0 / 5) + math.log(1.0 / 5)) / 2))))
  }

  test("sliding chunks: hand-checked windows, tail kept short, full coverage") {
    val doc = Seq((1L, "t1 t2 t3 t4 t5")).toDF("doc_id", "text")
    val got = TextOps.slidingChunks(doc, chunkSize = 3, stride = 2)
      .as[(Long, Long, Long, Long, String)].collect().toSet
    assert(got === Set(
      (1L, 0L, 0L, 3L, "t1 t2 t3"),
      (1L, 1L, 2L, 3L, "t3 t4 t5"),
      (1L, 2L, 4L, 1L, "t5")))
    // fixture invariants: chunk count = ceil(n/stride); every token
    // position is covered by at least one window
    val docs = Tables.documents(spark, sf("sf0.001"))
    val chunks = TextOps.slidingChunks(docs, chunkSize = 16, stride = 8).cache()
    val n = docs.select(org.apache.spark.sql.functions.size(
      org.apache.spark.sql.functions.split($"text", " ")).cast("long").as("n"))
      .agg(org.apache.spark.sql.functions.sum(
        (($"n" + 7L) / 8L).cast("long"))).as[Long].head() // ceil(n/8)
    assert(chunks.count() === n)
    assert(chunks.filter($"chunk_tokens" < 1 || $"chunk_tokens" > 16).count() === 0)
    chunks.unpersist()
  }

  test("winnowing: shared runs of >= w+k-1 tokens share a fingerprint; edits elsewhere don't break it") {
    // the guarantee: with k=3, w=4 any 6-token shared run must surface
    // in both documents' fingerprint sets — even though every OTHER
    // token differs (the single whole-doc hash fails exactly this)
    val shared = "alpha beta gamma delta epsilon zeta"
    val a = (1 to 12).map(i => s"xa$i").mkString(" ") + " " + shared + " " +
      (1 to 12).map(i => s"ya$i").mkString(" ")
    val b = (1 to 9).map(i => s"xb$i").mkString(" ") + " " + shared + " " +
      (1 to 15).map(i => s"yb$i").mkString(" ")
    val docs = Seq((1L, a), (2L, b)).toDF("doc_id", "text")
    val fps = TextOps.winnowFingerprints(docs)
      .as[(Long, Long, String)].collect()
    val fpsA = fps.filter(_._1 == 1L).map(_._3).toSet
    val fpsB = fps.filter(_._1 == 2L).map(_._3).toSet
    assert((fpsA intersect fpsB).nonEmpty, "the shared 6-token run must share a fingerprint")
    // density: winnowing keeps ~2/(w+1) of gram positions, far below all
    val nGramsA = a.split(" ").length - 2
    assert(fpsA.size < nGramsA, "fingerprints are a strict selection, not all grams")
    // selections come only from complete windows (the defined domain)
    assert(fps.forall { case (_, pos, _) => pos >= 0 }, "positions parse back")
  }

  test("winnow pairs: planted overlap surfaces, disjoint docs don't, boilerplate guard caps df") {
    // A and B share a 9-token run (≥ w+k−1 = 6 ⇒ the guarantee applies
    // with room to spare); C is fully disjoint; D1..D20 all share ONE
    // boilerplate sentence whose fingerprints the df guard must drop
    // (maxDf=10 < 20 docs) — without creating any D-D pair from it.
    val shared = (1 to 9).map(i => s"ov$i").mkString(" ")
    val boiler = (1 to 9).map(i => s"bp$i").mkString(" ")
    def filler(p: String, n: Int) = (1 to n).map(i => s"$p$i").mkString(" ")
    val corpus = Seq(
      (1L, s"${filler("xa", 10)} $shared ${filler("ya", 10)}"),
      (2L, s"${filler("xb", 12)} $shared ${filler("yb", 8)}"),
      (3L, filler("zc", 30))) ++
      (1 to 20).map(i => (100L + i, s"${filler(s"d${i}f", 10)} $boiler"))
    val docs = corpus.toDF("doc_id", "text")
    val pairs = TextOps.winnowPairs(docs, minShared = 1L, maxDf = 10L)
      .as[(Long, Long, Long, Double)].collect()
    assert(pairs.exists(p => p._1 == 1L && p._2 == 2L),
      s"the planted 9-token overlap must surface: ${pairs.toSeq}")
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L), "disjoint doc pairs with nobody")
    assert(!pairs.exists(p => p._1 > 100L && p._2 > 100L),
      s"boilerplate shared by 20 docs is over the df cap — no D-D pairs: ${pairs.toSeq}")
    // containment normalizes by the SMALLER doc's full fingerprint set
    val ab = pairs.find(p => p._1 == 1L && p._2 == 2L).get
    assert(ab._4 > 0.0 && ab._4 <= 1.0, s"containment in (0,1]: ${ab._4}")
    // with the guard off, the boilerplate pairs DO appear — the cap is
    // what suppressed them, not the winnowing
    val unguarded = TextOps.winnowPairs(docs, minShared = 1L, maxDf = 0L)
      .as[(Long, Long, Long, Double)].collect()
    assert(unguarded.exists(p => p._1 > 100L && p._2 > 100L),
      "without the cap the boilerplate fingerprints pair D docs")
  }

  test("winnow decontam: a leaked eval span is flagged with containment; clean evals are not") {
    // eval doc 1 is a 10-token question buried VERBATIM inside train
    // doc 100's much longer page (the asymmetric case containment
    // exists for); eval doc 2 shares nothing with any train doc.
    val question = (1 to 10).map(i => s"q$i").mkString(" ")
    def filler(p: String, n: Int) = (1 to n).map(i => s"$p$i").mkString(" ")
    val train = Seq(
      (100L, s"${filler("ta", 30)} $question ${filler("tb", 30)}"),
      (101L, filler("tc", 40))).toDF("doc_id", "text")
    val eval = Seq((1L, question), (2L, filler("ze", 10))).toDF("doc_id", "text")
    val got = TextOps.winnowContainment(train, eval, minOverlap = 0.1)
      .as[(Long, Long, Long, Double)].collect()
    val leaked = got.filter(_._1 == 1L)
    assert(leaked.length === 1 && leaked.head._2 === 100L,
      s"the buried question must flag against its train page: ${got.toSeq}")
    // the eval doc IS the span — every one of its fingerprints comes
    // from the shared run, so containment is total
    assert(leaked.head._4 === 1.0, s"full containment for a verbatim leak: ${leaked.head}")
    assert(!got.exists(_._1 == 2L), "a clean eval doc flags nothing")
  }

  test("token-budget mix: quotas fill in permutation order; crossing doc included; absent source drops") {
    import graft.ops.Sampling
    import org.apache.spark.sql.functions.col
    // src a: 4 docs × 3 tokens; budget 7 → prefix of 3 docs (0+3 < 7,
    // 3+3 < 7 is false for the 3rd? no: before-sums are 0,3,6,9 → the
    // three docs with before < 7). src b: budget 2 < first doc's 5
    // tokens → exactly the one crossing doc. src c: no budget → gone.
    val docs = Seq(
      (1L, "a", "t t t"), (2L, "a", "t t t"), (3L, "a", "t t t"), (4L, "a", "t t t"),
      (10L, "b", "u u u u u"), (11L, "b", "u u u u u"),
      (20L, "c", "v v")).toDF("doc_id", "src", "text")
    val got = Sampling.tokenBudgetMix(docs, col("src"), Map("a" -> 7L, "b" -> 2L))
      .as[(Long, String, Long)].collect()
    val bySrc = got.groupBy(_._2).view.mapValues(_.map(_._1).toSet).toMap
    assert(bySrc("a").size === 3, s"before-sums 0,3,6 < 7; 9 is not: $got")
    assert(bySrc("b").size === 1, "the budget-crossing first doc is included")
    assert(!bySrc.contains("c"), "a source without a budget drops")
    assert(got.forall(r => r._2 != "a" || r._3 === 3L))
    // determinism: same seed → same membership; different seed → same
    // QUOTAS (sizes) with possibly different members
    val again = Sampling.tokenBudgetMix(docs, col("src"), Map("a" -> 7L, "b" -> 2L))
      .as[(Long, String, Long)].collect()
    assert(got.sortBy(_._1).toSeq === again.sortBy(_._1).toSeq)
    val reseed = Sampling.tokenBudgetMix(docs, col("src"), Map("a" -> 7L, "b" -> 2L), seed = 7L)
      .as[(Long, String, Long)].collect()
    assert(reseed.count(_._2 == "a") === 3 && reseed.count(_._2 == "b") === 1)
    // the bucketed prefix-sum path is a pure optimization: hashBuckets=1
    // degenerates to the naive single-window cutoff — membership must be
    // identical at any bucketing on a corpus spanning many buckets
    val wide = (0 until 300).map(i => (i.toLong, s"s${i % 3}",
      ("w " * (1 + i % 7)).trim)).toDF("doc_id", "src", "text")
    val quotas = Map("s0" -> 120L, "s1" -> 1L, "s2" -> 10000L)
    val bucketed = Sampling.tokenBudgetMix(wide, col("src"), quotas)
      .as[(Long, String, Long)].collect().toSet
    val naive = Sampling.tokenBudgetMix(wide, col("src"), quotas, hashBuckets = 1)
      .as[(Long, String, Long)].collect().toSet
    assert(bucketed === naive, "bucket classification changed membership")
    assert(bucketed.count(_._2 == "s2") === 100, "an over-budget quota keeps the whole source")
  }

  test("perplexity buckets: quantile slices follow the LM order; sizes split evenly") {
    // 6 docs of sharply different probability mass: docs repeating the
    // corpus-dominant token score highest (head); rare-token docs land
    // in the tail. 6 docs / 3 buckets = 2 each.
    val docs = Seq(
      (1L, "a a a a a a a a"), (2L, "a a a a b"), (3L, "a a b b"),
      (4L, "b b c c"), (5L, "c c d d"), (6L, "e f g h")).toDF("doc_id", "text")
    val got = TextOps.perplexityBuckets(docs)
      .select("doc_id", "bucket", "label").as[(Long, Long, String)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    assert(got.values.map(_._1).groupBy(identity).view.mapValues(_.size).toMap ===
      Map(1L -> 2, 2L -> 2, 3L -> 2), s"even split: $got")
    assert(got(1L) === (1L, "head"), s"the most probable doc heads: $got")
    assert(got(6L) === (3L, "tail"), s"the all-rare doc tails: $got")
    assert(got(2L)._2 === "head" && got(5L)._2 === "tail" && got(3L)._2 === "middle")
  }

  test("bigram LM: a rare continuation of common words scores low; unigrams cannot see it") {
    // "big cat" appears once while "big dog"×3 and "sly cat"×3 make
    // both of its words individually common — the bigram model scores
    // doc 9's continuation low, the unigram model scores doc 9 and a
    // frequent-pair doc identically (same word multiset frequencies).
    val docs = Seq(
      (1L, "big dog big dog big dog"),
      (2L, "sly cat sly cat sly cat"),
      (9L, "big cat")
    ).toDF("doc_id", "text")
    val bg = TextOps.bigramLogProb(docs)
      .as[(Long, Long, Double)].collect().map(r => r._1 -> r._3).toMap
    assert(bg(9L) < bg(1L) && bg(9L) < bg(2L), s"rare continuation flagged: $bg")
    // hand-check doc 9: positions (big cat), (cat _)? only "big cat";
    // its 2 bigrams: "big cat" (c=1) and none else — n_bigrams = 1,
    // prefix c("big") counts big→dog ×3 and big→cat ×1 ⇒ ln(1/4)
    val d9 = TextOps.bigramLogProb(docs).filter($"doc_id" === 9L)
      .as[(Long, Long, Double)].head()
    assert(d9._2 === 1L)
    def rnd4(x: Double) = math.floor(x.abs * 1e4 + 0.5) / 1e4 * math.signum(x)
    assert(d9._3 === rnd4(math.log(1.0 / 4.0)))
    // a 1-token doc has no bigram positions and no row
    val one = Seq((5L, "solo")).toDF("doc_id", "text")
    assert(TextOps.bigramLogProb(docs.unionByName(one)).filter($"doc_id" === 5L).count() === 0L)
    // a ZERO-token doc (reachable via the tokenizer seam: regexTokens on
    // text with no [a-z]{2,} runs) must yield no row, not a slice error
    val zero = Seq((6L, "!!! ??? 123"), (7L, "real words here")).toDF("doc_id", "text")
    val z = TextOps.bigramLogProb(zero, tok = TextOps.regexTokens).collect()
    assert(z.map(_.getLong(0)).toSet === Set(7L), "zero-token doc drops out cleanly")
  }

  test("leakage-safe split: a near-dup pair planted across split boundaries moves as one") {
    // docs 5 and 96 are near-identical; a doc-keyed modBucket split puts
    // 5 in train (5 < 80) and 96 in test (96 >= 90) — the leakage the
    // group-keyed split exists to prevent. Filler docs are all unique.
    val shared = "alpha beta gamma delta epsilon zeta eta theta"
    val base = Seq(
      (5L, s"$shared one"),
      (96L, s"$shared two")
    ) ++ (100L to 140L).map(i => (i, s"filler doc number $i with its own content $i"))
    val docs = base.toDF("doc_id", "text")
    val pairs = Dedup.jaccardPairs(docs, 3, 0.5)
    assert(pairs.as[(Long, Long, Double)].collect().map(p => (p._1, p._2)).toSet
      === Set((5L, 96L)), "exactly the planted pair is near-dup")
    val naive = Sampling.hashSplit(docs.select(col("doc_id")), col("doc_id"),
      Seq(("train", 80), ("val", 10), ("test", 10)), Sampling.modBucket)
      .as[(Long, String)].collect().toMap
    assert(naive(5L) === "train" && naive(96L) === "test",
      "the naive split must actually straddle for this test to bind")
    val safe = Sampling.leakageSafeSplit(docs, pairs,
      Seq(("train", 80), ("val", 10), ("test", 10)), Sampling.modBucket)
      .as[(Long, Long, String)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(safe(5L) === ((5L, "train")) && safe(96L) === ((5L, "train")),
      s"cluster must adopt min id 5 and ITS split: ${safe(5L)} ${safe(96L)}")
    // singletons keep their own id and every input doc comes back
    assert(safe.size === docs.count())
    assert(safe(100L)._1 === 100L)
    // the global law: one split per group, no exceptions
    val viol = Sampling.leakageSafeSplit(docs, pairs,
      Seq(("train", 80), ("val", 10), ("test", 10)), Sampling.modBucket)
      .groupBy("group_id").agg(countDistinct("split").as("n"))
      .filter(col("n") =!= 1L)
    assert(viol.isEmpty, "a group straddled splits")
  }

  test("hashed classifier: bucket arithmetic is md5-derived, weights are a caller seam") {
    // hand-check one token: bucket = hexval(md5[0])·16 + hexval(md5[1])
    val tok = "spark"
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(tok.getBytes("UTF-8")).map("%02x".format(_)).mkString
    def hv(c: Char) = if (c >= 'a') c - 'a' + 10 else c - '0'
    val bucket = hv(hex(0)) * 16 + hv(hex(1))
    val expectW = ((bucket.toLong * 37L) % 21L) - 10L
    val one = Seq((1L, tok)).toDF("doc_id", "text")
    val r = TextOps.hashedClassifierScore(one, TextOps.DemoClassifierWeights)
      .as[(Long, Long, Long, Double, Boolean)].head()
    assert(r === ((1L, 1L, expectW, expectW.toDouble, expectW >= 0L)), s"got $r")
    // the weight vector is a genuine seam: flipping it flips the verdict
    val flipped = TextOps.DemoClassifierWeights.map(w => -w)
    val r2 = TextOps.hashedClassifierScore(one, flipped)
      .as[(Long, Long, Long, Double, Boolean)].head()
    assert(r2._3 === -expectW && r2._5 === (-expectW >= 0L), s"got $r2")
    // a zero-feature doc (regexTokens over non-alpha text) has no row
    val zero = Seq((2L, "123 !!!"), (3L, "words here")).toDF("doc_id", "text")
    val z = TextOps.hashedClassifierScore(zero, TextOps.DemoClassifierWeights,
      tok = TextOps.regexTokens)
    assert(z.select("doc_id").as[Long].collect().toSet === Set(3L))
  }

  test("stupid backoff: all four tiers score hand-checked values; short docs drop out") {
    // train "a b c a b d": trigram counts {abc,bca,cab,abd}=1, pre2
    // counts {"a b":2,"b c":1,"c a":1}; bigram counts {"a b":2,others 1},
    // prev counts {a:2,b:2,c:1}; unigrams a:2 b:2 c:1 d:1, N=6.
    val train = Seq((1L, "a b c a b d")).toDF("doc_id", "text")
    val eval = Seq(
      (10L, "a b c"), // tri tier: ln(c(abc)/c2(ab)) = ln(1/2)
      (11L, "d a b"), // bi tier: tri "d a b" unseen; ln(0.4) + ln(c(ab)/c1(a)) = ln(0.4) + ln(2/2)
      (12L, "b d c"), // uni tier: tri+bg unseen, c(c)=1 → 2ln(0.4) + ln(1/6)
      (13L, "a b x"), // oov tier: x unseen anywhere → 3ln(0.4) − ln(6)
      (14L, "a b")    // < 3 tokens — no trigram position, no row
    ).toDF("doc_id", "text")
    val got = TextOps.backoffLogProb(train, eval)
      .as[(Long, Long, Long, Long, Long, Long, Double)].collect()
      .map(r => r._1 -> r).toMap
    def rnd4(x: Double) = math.floor(x.abs * 1e4 + 0.5) / 1e4 * math.signum(x)
    val a = math.log(0.4)
    assert(got.keySet === Set(10L, 11L, 12L, 13L), s"got ${got.keySet}")
    assert(got(10L) === ((10L, 1L, 1L, 0L, 0L, 0L, rnd4(math.log(1.0 / 2.0)))), s"${got(10L)}")
    assert(got(11L) === ((11L, 1L, 0L, 1L, 0L, 0L, rnd4(a + math.log(2.0 / 2.0)))), s"${got(11L)}")
    assert(got(12L) === ((12L, 1L, 0L, 0L, 1L, 0L, rnd4(2 * a + math.log(1.0 / 6.0)))), s"${got(12L)}")
    assert(got(13L) === ((13L, 1L, 0L, 0L, 0L, 1L, rnd4(3 * a - math.log(6.0)))), s"${got(13L)}")
    // self-scoring never backs off: every position lands in the tri tier
    val self = TextOps.backoffLogProb(train, train)
      .as[(Long, Long, Long, Long, Long, Long, Double)].head()
    assert(self._2 === self._3 && self._5 === 0L && self._6 === 0L,
      s"self-scored corpus backed off: $self")
  }

  test("tokenizer seam: regexTokens swaps tokenization without forking the operator") {
    // "a" (single char) and "T1" (uppercase) are whitespace tokens but
    // not [a-z]{2,} runs; "foo-bar" is ONE whitespace token but TWO
    // regex tokens — the seam must change starts, counts, and text.
    val doc = Seq((1L, "a foo-bar T1 baz")).toDF("doc_id", "text")
    val ws = TextOps.slidingChunks(doc, chunkSize = 2, stride = 2)
      .as[(Long, Long, Long, Long, String)].collect().toSet
    assert(ws === Set((1L, 0L, 0L, 2L, "a foo-bar"), (1L, 1L, 2L, 2L, "T1 baz")))
    val rx = TextOps.slidingChunks(doc, chunkSize = 2, stride = 2, tok = TextOps.regexTokens)
      .as[(Long, Long, Long, Long, String)].collect().toSet
    assert(rx === Set((1L, 0L, 0L, 2L, "foo bar"), (1L, 1L, 2L, 1L, "baz")))
    // the same seam flows through the LM scorer: under regexTokens the
    // vocabulary has no "a"/"T1" rows and per-doc n_tokens shifts
    val lm = TextOps.unigramLogProb(doc, tok = TextOps.regexTokens)
      .as[(Long, Long, Double)].head()
    assert(lm._2 === 3L, "regex tokenizer counts foo, bar, baz")
  }

  test("DSIR importance selection ranks target-like documents first") {
    import graft.ops.Sampling
    // Target domain speaks "zz"; the raw corpus mostly speaks "qq".
    // Selection under the target-vs-source ratio must surface the two
    // zz-speaking raw docs before any qq doc, in (weight, doc_id) order.
    val target = Seq((100L, "zz zz zz aa"), (101L, "zz zz bb")).toDF("doc_id", "text")
    val raw = Seq(
      (1L, "qq qq qq aa"),
      (2L, "zz zz qq aa"),
      (3L, "qq qq bb cc"),
      (4L, "zz zz zz bb"))
      .toDF("doc_id", "text")
    val (tTf, tTot) = TextOps.unigramModel(target)
    val (sTf, sTot) = TextOps.unigramModel(raw)
    val picked = Sampling.importanceSelect(raw, tTf, tTot, sTf, sTot, quota = 2)
      .as[(Long, Double)].collect()
    assert(picked.map(_._1).toSet === Set(2L, 4L), s"got ${picked.toSeq}")
    // and the quota is a hard cut
    assert(Sampling.importanceSelect(raw, tTf, tTot, sTf, sTot, quota = 3).count() === 3)
  }

  test("unigram log-prob: rarer-token documents score lower; bounds hold") {
    // On the fixture corpus the score is a mean of ln(p), p ≤ 1 → every
    // avg_logp is ≤ 0, and a doc made ONLY of the corpus's most common
    // token must sit at the maximum possible score.
    val docs = Tables.documents(spark, sf("sf0.001"))
    val scored = TextOps.unigramLogProb(docs)
    assert(scored.filter(org.apache.spark.sql.functions.col("avg_logp") > 0).count() === 0)
    assert(scored.count() === docs.count())
  }

  test("classifier training learns the planted separation") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // 20 positive docs of one token, 20 negative of another
    val docs = ((0 until 20).map(i => (i.toLong, "excellent excellent excellent")) ++
      (20 until 40).map(i => (i.toLong, "terrible terrible terrible")))
      .toDF("doc_id", "text")
    def bucketOf(tok: String): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(tok.getBytes("UTF-8")).take(1).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex, 16)
    }
    val (bGood, bBad) = (bucketOf("excellent"), bucketOf("terrible"))
    assert(bGood != bBad, "planted tokens collided; pick different tokens")
    def weights(iters: Int): Map[Long, Double] =
      TextOps.trainHashedClassifier(docs, col("doc_id") < 20L, iterations = iters)
        .as[(Long, Double)].collect().toMap
    val w1 = weights(1)
    val w5 = weights(5)
    assert(w5(bGood) > 0 && w5(bBad) < 0, s"${w5(bGood)} / ${w5(bBad)}")
    // more steps move further down the separable gradient
    assert(w5(bGood) > w1(bGood) && w5(bBad) < w1(bBad))
    // untouched buckets stay exactly 0
    assert(w5.count { case (_, v) => v == 0.0 } == 254)
  }

}
