package graft

import graft.ops.{Dedup, Similarity}
import org.apache.spark.sql.functions._

/** Dedup + similarity operators against the planted structure in the
  * driver fixtures: documents has exactly 25 near-dup pairs at 3-shingle
  * Jaccard ≥ 0.8 (clean gap below), embeddings has none above 0.95. */
class DedupSimilaritySpec extends SparkSpec {

  import spark.implicits._

  private def docs = Tables.documents(spark, sf("sf0.001"))
  private def embs = Tables.embeddings(spark, sf("sf0.001"))

  test("exact keep-first dedup keeps exactly one row per key, the earliest") {
    val df = Seq(
      (1L, "a", 30L), (2L, "a", 10L), (3L, "a", 20L),
      (4L, "b", 10L), (5L, "c", 10L), (6L, "c", 10L) // tie on ts → min id wins
    ).toDF("session_id", "k", "ts")
    val kept = Dedup.keepFirst(df, Seq("k"), "ts", "session_id")
      .select("session_id").as[Long].collect().toSet
    assert(kept == Set(2L, 4L, 5L))
  }

  test("MinHash+LSH finds exactly the exact-Jaccard near-dup pairs") {
    val exact = Dedup.jaccardPairs(docs).select("doc_a", "doc_b")
      .as[(Long, Long)].collect().toSet
    val lsh = Dedup.minhashLshPairs(docs).select("doc_a", "doc_b")
      .as[(Long, Long)].collect().toSet
    assert(exact.size >= 20, s"expected planted near-dups, got ${exact.size}")
    assert(lsh == exact)
  }

  test("m-of-b band agreement (minBandMatches=2) keeps every fixture pair") {
    // Deterministic on a fixed corpus (xxhash64 signatures): the ≥2-band
    // rule must still find the full exact ground truth here while it
    // suppresses background single-band collisions quadratically (the
    // sf10 century measurement in BASELINE.md is the scale motivation).
    val exact = Dedup.jaccardPairs(docs).select("doc_a", "doc_b")
      .as[(Long, Long)].collect().toSet
    val m2 = Dedup.minhashLshPairs(docs, minBandMatches = 2)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(m2 == exact, s"m=2 lost ${(exact -- m2).size} true pairs on the fixture")
  }

  test("prefix-filtered exact Jaccard equals the naive inverted-index join") {
    // The prefix filter must be value-preserving at ANY threshold: same
    // pairs, same 4-dp jaccard. Check a loose threshold (many pairs,
    // prefix = most of each doc) and the default (tight prefixes).
    for (t <- Seq(0.2, 0.5)) {
      val naive = Dedup.jaccardPairs(docs, threshold = t)
        .as[(Long, Long, Double)].collect().toSet
      val pref = Dedup.jaccardPairsPrefix(docs, threshold = t)
        .as[(Long, Long, Double)].collect().toSet
      assert(naive.nonEmpty, s"t=$t needs a non-trivial pair set")
      assert(pref == naive, s"t=$t: prefix path diverged from ground truth")
    }
  }

  test("LSH banding derives from the threshold with candidate recall ≥ 0.99") {
    def recall(k: Int, bands: Int, j: Double): Double =
      1.0 - math.pow(1.0 - math.pow(j, (k / bands).toDouble), bands.toDouble)
    // low thresholds force more bands / fewer rows; a fixed 16×4 would
    // cap recall at ~0.64 for j = 0.5
    assert(Dedup.bandingFor(64, 0.5) == 32)
    assert(Dedup.bandingFor(64, 0.8) == 16)
    assert(recall(64, 16, 0.5) < 0.7)
    for (t <- Seq(0.3, 0.5, 0.7, 0.8, 0.9, 0.95)) {
      val b = Dedup.bandingFor(64, t)
      assert(64 % (64 / b) == 0)
      assert(recall(64, b, t) >= 0.99, s"threshold=$t bands=$b")
    }
  }

  test("LSH hot-bucket guard bounds a planted pathological bucket") {
    // 200 identical texts (one signature → the same bucket in all 16
    // bands, 200-doc buckets → 19 900 pairs unguarded) plus one honest
    // near-dup pair with unique buckets. With maxBucket=50 the hot
    // buckets are dropped — their pairs never reach the pair join — while
    // the honest pair survives untouched.
    val boiler = (0 until 200).map(i => (1000L + i, "the same boilerplate line repeated " * 5))
    val near = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      (2L, "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda"))
    val df = (boiler ++ near).toDF("doc_id", "text")
    val oversized = Dedup.oversizedBuckets(df, maxBucket = 50)
      .as[(Int, Long, Long)].collect()
    assert(oversized.nonEmpty && oversized.forall(_._3 == 200L),
      s"expected 200-doc hot buckets, got ${oversized.mkString(",")}")
    val guarded = Dedup.minhashLshPairs(df, maxBucket = 50)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(guarded == Set((1L, 2L)), s"got $guarded")
    // Unguarded control: the hot bucket's pairs all come through.
    val unguarded = Dedup.minhashLshPairs(df).count()
    assert(unguarded == 19901L, s"got $unguarded")
  }

  test("connected components cluster transitive chains to the min id") {
    // chain 1–2–3 (1 and 3 never directly paired) + separate pair 5–6 +
    // an out-of-order edge (7,4) exercising the undirected symmetrization
    val pairs = Seq((1L, 2L), (2L, 3L), (5L, 6L), (4L, 7L))
      .toDF("doc_a", "doc_b")
    val comp = Dedup.connectedComponents(pairs)
      .as[(Long, Long)].collect().toMap
    assert(comp == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 5L -> 5L, 6L -> 5L, 4L -> 4L, 7L -> 4L))
    // clustering vs greedy on the chain: greedy drops every doc_b
    // (2, 3, 6, 7); clustering keeps one representative per group and
    // drops the same ids here — but on a chain where b was already
    // removed, clustering still guarantees the min-id survivor, which
    // the greedy rule only happens to match on this shape.
    val survivorsByCluster = comp.collect { case (id, c) if id == c => id }.toSet
    assert(survivorsByCluster == Set(1L, 5L, 4L))
  }

  test("components converge on a 200-hop chain (pointer doubling, not diameter rounds)") {
    // A path graph 0–1–2–…–199: plain neighbor-min propagation needs ~200
    // rounds (the default maxIter of 30 would abort); pointer doubling
    // must collapse it within the default budget.
    val chain = (0L until 199L).map(i => (i, i + 1)).toDF("doc_a", "doc_b")
    val comp = Dedup.connectedComponents(chain).as[(Long, Long)].collect()
    assert(comp.length == 200 && comp.forall(_._2 == 0L))
  }

  test("SimHash: planted near-dup pairs are closer than background pairs") {
    val sig = Dedup.simhash(docs).as[(Long, Long)].collect().toMap
    val pairs = Dedup.jaccardPairs(docs).select("doc_a", "doc_b").as[(Long, Long)].collect()
    def hamming(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)
    val dupDists = pairs.map { case (a, b) => hamming(sig(a), sig(b)) }
    // NB all docs share one 31-token vocabulary, so even unrelated pairs
    // have overlapping token sets; the separation is in the means, not a
    // clean threshold.
    val bg = (0L to 40L).sliding(2).collect { case Seq(a, b) if !pairs.contains((a, b)) =>
      hamming(sig(a), sig(b))
    }.toSeq
    val dupMean = dupDists.map(_.toDouble).sum / dupDists.length
    val bgMean = bg.map(_.toDouble).sum / bg.size
    assert(dupMean < bgMean, s"dupMean=$dupMean bgMean=$bgMean")
  }

  test("SimHash banded pairs == brute-force hamming pairs (pigeonhole recall)") {
    val sig = Dedup.simhash(docs).as[(Long, Long)].collect()
    val brute = (for {
      (a, sa) <- sig; (b, sb) <- sig if a < b
      if java.lang.Long.bitCount(sa ^ sb) <= 3
    } yield (a, b)).toSet
    val banded = Dedup.simhashPairs(docs, maxHamming = 3)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(banded == brute)
    assert(brute.nonEmpty, "expected at least one near-identical signature pair")
  }

  test("blocked top-k equals brute-force top-k restricted to the query's label") {
    val brute = Similarity.topK(embs, k = 500, queryMod = 100) // effectively unbounded k
    val labels = embs.select(col("vec_id"), col("label")).as[(Long, Int)].collect().toMap
    val bruteInLabel = brute.as[(Long, Long, Long, Double)].collect()
      .filter { case (q, v, _, _) => labels(q) == labels(v) }
      .groupBy(_._1).toSeq
      .flatMap { case (_, rs) => rs.sortBy(r => (-r._4, r._2)).take(5).map(r => (r._1, r._2)) }
      .toSet
    val blocked = Similarity.topKBlocked(embs, k = 5, queryMod = 100)
      .select("q_id", "vec_id").as[(Long, Long)].collect().toSet
    assert(blocked == bruteInLabel)
  }

  test("LSH ANN recall vs brute force is high and far above chance") {
    val brute = Similarity.topK(embs, k = 10, queryMod = 50)
      .select("q_id", "vec_id").as[(Long, Long)].collect().toSet
    val lsh = Similarity.topKLsh(embs, k = 10, queryMod = 50)
      .select("q_id", "vec_id").as[(Long, Long)].collect().toSet
    val recall = (lsh & brute).size.toDouble / brute.size
    // deterministic hyperplanes ⇒ recall is fixed (measured 1.00 on this
    // fixture at the default probeBits=4); chance would be 10/500 = 0.02
    assert(recall >= 0.95, s"recall=$recall")
    // and multi-probe is what buys it: the single-bucket variant measured
    // 0.88 here — keep it honest (well above chance, below the probed path)
    val noProbe = Similarity.topKLsh(embs, k = 10, queryMod = 50, probeBits = 0)
      .select("q_id", "vec_id").as[(Long, Long)].collect().toSet
    val recall0 = (noProbe & brute).size.toDouble / brute.size
    assert(recall0 >= 0.7 && recall0 <= recall, s"recall0=$recall0")
  }

  test("trained IVF: recall rises with nProbe and beats chance by far") {
    val brute = Similarity.topK(embs, k = 10, queryMod = 50)
      .select("q_id", "vec_id").as[(Long, Long)].collect().toSet
    def recallAt(np: Int) = {
      val ivf = Similarity.topKIvf(embs, k = 10, queryMod = 50, nProbe = np)
        .select("q_id", "vec_id").as[(Long, Long)].collect().toSet
      (ivf & brute).size.toDouble / brute.size
    }
    // measured 0.42 / 0.86 on this fixture; chance = 10/500 = 0.02. The
    // fixture's neighbors are weak (top-10 cosine ≈ 0.5, scattered
    // across cells), so probing half the 16 cells is what high recall
    // costs here — the knob, not the index, is the contract.
    val r2 = recallAt(2)
    val r8 = recallAt(8)
    assert(r8 >= 0.7, s"recall@nProbe=8 = $r8")
    assert(r8 > r2, s"recall must rise with nProbe: r2=$r2 r8=$r8")
  }

  test("caller-supplied query frame matches the fixture filter and takes external queries") {
    // 1) handing the % filter in explicitly reproduces the default rows
    //    exactly, for all three search paths
    val qFrame = embs.filter(col("vec_id") % 50 === 0)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select("q_id", "vec_id", "rk").as[(Long, Long, Long)].collect().toSet
    assert(rows(Similarity.topK(embs, qFrame, 10)) == rows(Similarity.topK(embs)))
    assert(rows(Similarity.topKLsh(embs, qFrame, 10, 4, 16, 64, 4)) ==
      rows(Similarity.topKLsh(embs)))
    // IVF trains per call (float summation order) — compare recall-vs-
    // exact instead of row sets
    val brute = rows(Similarity.topK(embs)).map(r => (r._1, r._2))
    val ivfExt = Similarity.topKIvf(embs, qFrame, 10, 16, 8, 5)
      .select("q_id", "vec_id").as[(Long, Long)].collect().toSet
    assert((ivfExt & brute).size.toDouble / brute.size >= 0.7)
    // 2) a genuinely external query frame (vectors NOT in the corpus):
    //    shift ids out of range; every corpus row is eligible (no
    //    self-match), each query returns exactly k rows
    val external = embs.filter(col("vec_id") % 100 === 0)
      .select((col("vec_id") + 1000000L).as("vec_id"), col("embedding"))
    val nq = external.count()
    val ext = Similarity.topK(embs, external, 7)
    assert(ext.count() == nq * 7)
    assert(ext.groupBy("q_id").count().filter(col("count") =!= 7).isEmpty)
  }

  test("recallPerQuery scores hits per query with zero-hit queries kept") {
    val exact = Similarity.topK(embs, k = 10, queryMod = 50)
    // approx = exact ⇒ recall 1.0 everywhere
    val perfect = Similarity.recallPerQuery(exact, exact)
      .select("recall").as[Double].collect()
    assert(perfect.nonEmpty && perfect.forall(_ == 1.0))
    // approx missing one query entirely ⇒ that query scores 0.0, not a
    // dropped row
    val someQ = exact.select("q_id").distinct().as[Long].head()
    val partial = Similarity.recallPerQuery(exact, exact.filter(col("q_id") =!= someQ))
    val byQ = partial.select("q_id", "recall").as[(Long, Double)].collect().toMap
    assert(byQ(someQ) == 0.0)
    assert(byQ.size == perfect.length)
    assert(byQ.filter(_._1 != someQ).values.forall(_ == 1.0))
  }

  test("cosine of a vector with itself is 1") {
    val df = embs.limit(3).select(Similarity.cosine(col("embedding"), col("embedding")).as("c"))
    df.as[Double].collect().foreach(c => assert(math.abs(c - 1.0) < 1e-12))
  }

  test("embedding near-dup is empty on this corpus (max pair cosine ~0.51)") {
    assert(Similarity.nearDupPairs(embs).isEmpty)
  }

  test("trained-cell near-dup finds exactly the planted duplicate vectors") {
    // Plant near-identical copies of 5 corpus vectors (one component
    // nudged by 1e-3 → cosine ≈ 1) under fresh ids; the trained-cell
    // path must find exactly the 5 planted pairs — no labels involved.
    val base = embs.select("vec_id", "embedding")
    val planted = base.filter(col("vec_id") % 100 === 0).limit(5)
      .select(
        (col("vec_id") + 1000000L).as("vec_id"),
        concat(
          slice(col("embedding"), 1, 63),
          array(element_at(col("embedding"), 64) + lit(0.001f))).as("embedding"))
    val corpus = base.unionByName(planted)
    val pairs = Similarity.nearDupPairsIvf(corpus)
      .select("vec_a", "vec_b").as[(Long, Long)].collect().toSet
    val expected = planted.select("vec_id").as[Long].collect()
      .map(id => (id - 1000000L, id)).toSet
    assert(pairs == expected, s"got $pairs, expected $expected")
  }

  test("sign-LSH near-dup finds exactly the planted pairs (incl. a nudged near-dup)") {
    // Same planted structure as the trained-cell test: near-identical
    // copies (one component nudged by 1e-3, cosine ≈ 1) must collide in
    // at least one of the 8 tables and survive the exact re-verify; the
    // rest of the corpus (max pair cosine ≈ 0.51) must contribute
    // nothing past the threshold filter.
    val base = embs.select("vec_id", "embedding")
    val planted = base.filter(col("vec_id") % 100 === 0).limit(5)
      .select(
        (col("vec_id") + 1000000L).as("vec_id"),
        concat(
          slice(col("embedding"), 1, 63),
          array(element_at(col("embedding"), 64) + lit(0.001f))).as("embedding"))
    val corpus = base.unionByName(planted)
    val pairs = Similarity.nearDupPairsLsh(corpus)
      .select("vec_a", "vec_b").as[(Long, Long)].collect().toSet
    val expected = planted.select("vec_id").as[Long].collect()
      .map(id => (id - 1000000L, id)).toSet
    assert(pairs == expected, s"got $pairs, expected $expected")
  }

  test("cluster-balanced sampling flattens a dominant mode a uniform cut preserves") {
    // 80 vectors near +x, 20 near +y (distinct per-vector jitter so ids
    // spread); seeds = the two lowest ids, one from each mode. A uniform
    // 20%-cut keeps the 80/20 imbalance; the per-cell quota returns
    // exactly 10 + 10.
    def v(main: Int, i: Int): Seq[Float] = {
      val arr = Array.fill(64)(0f)
      arr(main) = 1f
      arr(2 + (i % 8)) = 0.01f * ((i % 5) + 1)
      arr.toSeq
    }
    val corpus =
      ((0 until 80).map(i => (i * 2L, v(0, i))) ++ // even ids: +x mode
        (0 until 20).map(i => (i * 2L + 1L, v(1, i)))) // odd ids: +y mode
        .toDF("vec_id", "embedding")
    val got = Similarity.clusterBalancedSample(corpus, k = 2, quota = 10)
      .as[(Long, Long)].collect()
    assert(got.length === 20, "both cells filled their quota")
    val byCell = got.groupBy(_._2).view.mapValues(_.length).toMap
    assert(byCell === Map(0L -> 10, 1L -> 10), s"flattened to quota per cell: $byCell")
    // cell 0 seeded by vec_id 0 (+x), so its members are the even ids
    val cell0 = got.filter(_._2 == 0L).map(_._1)
    assert(cell0.forall(_ % 2 == 0), "the +x mode landed in the +x seed's cell")
  }

  test("tail-recall preset finds inexact neighbors the exact-copy default misses") {
    // Plant 40 genuinely-inexact neighbors at cosines spread over
    // ~[0.95, 0.999]: nudge the first component by α·‖e‖ with α cycling
    // through 4 magnitudes (worst-case cosine 1/√(1+α²)). At these
    // angles signLshPairRecall gives the default (24, 8) ~0.49–0.99 per
    // pair and the tail preset (16, 16) ~0.96–1.0; on the FIXED plane
    // matrix the outcome is deterministic, so the inclusion and the
    // strict gap are pinned facts, not flaky probabilities.
    val alphas = Seq(0.33, 0.25, 0.15, 0.05) // cosines ≈ 0.95, 0.97, 0.989, 0.9988
    val planted = embs.filter(col("vec_id") < 40)
      .withColumn("__a",
        element_at(typedLit(alphas), (pmod(col("vec_id"), lit(4)) + 1).cast("int")))
      .select(
        (col("vec_id") + 1000000L).as("vec_id"),
        concat(
          array((element_at(col("embedding"), 1) +
            col("__a") * Similarity.norm(col("embedding"))).cast("float")),
          slice(col("embedding"), 2, 63)).as("embedding"),
        col("label"))
    val corpus = embs.unionByName(planted)
    // ground truth: exact all-pairs over the planted ids at the 0.95
    // threshold (some α=0.33 plants fall below it — that's the point:
    // the threshold, not the planting, defines a true pair)
    val truth = Similarity.nearDupPairs(corpus).select("vec_a", "vec_b")
      .as[(Long, Long)].collect().toSet
    assert(truth.size >= 30, s"planted pairs above threshold: ${truth.size}")
    val tail = Similarity.nearDupPairsLsh(corpus, planes = 16, tables = 16)
      .select("vec_a", "vec_b").as[(Long, Long)].collect().toSet
    val dflt = Similarity.nearDupPairsLsh(corpus)
      .select("vec_a", "vec_b").as[(Long, Long)].collect().toSet
    assert(tail == truth,
      s"tail preset must reach full recall here (missed ${(truth -- tail).size})")
    assert(dflt.subsetOf(truth), "both configs verify exactly — no false pairs")
    assert(dflt.size < truth.size,
      s"the exact-copy default misses inexact tails (found ${dflt.size}/${truth.size})")
  }

  test("trained-quantizer cluster balance honors quotas and flattens the planted mode") {
    // Same two-mode corpus as the frozen-quantizer test, but the cells
    // come from kmeansCentroids — centroid VALUES depend on float
    // summation order, so assertions are properties, not values: quota
    // per cell, total, and the 80/20 imbalance flattened to 50/50.
    def v(main: Int, i: Int): Seq[Float] = {
      val arr = Array.fill(64)(0f)
      arr(main) = 1f
      arr(2 + (i % 8)) = 0.01f * ((i % 5) + 1)
      arr.toSeq
    }
    val corpus =
      ((0 until 80).map(i => (i * 2L, v(0, i))) ++
        (0 until 20).map(i => (i * 2L + 1L, v(1, i))))
        .toDF("vec_id", "embedding")
    val cents = Similarity.kmeansCentroids(corpus, k = 2, iters = 5)
    val got = Similarity.clusterBalancedSample(corpus, cents, quota = 10)
      .as[(Long, Long)].collect()
    val byCell = got.groupBy(_._2).view.mapValues(_.length).toMap
    assert(byCell.values.forall(_ <= 10), s"per-cell quota is a hard cap: $byCell")
    assert(got.length === 20, s"two true modes ⇒ both cells filled: $byCell")
    // trained cells must separate the modes: each selected cell is pure
    val parity = got.groupBy(_._2).view.mapValues(_.map(_._1 % 2).distinct.length).toMap
    assert(parity.values.forall(_ == 1), s"each trained cell holds one mode: $parity")
  }

  test("signLshPairRecall: exact dups are structural; documented defaults and knob direction hold") {
    assert(Similarity.signLshPairRecall(1.0, 24, 8) === 1.0, "θ=0 collides in every table")
    val atDefaults = Similarity.signLshPairRecall(0.95, 24, 8)
    assert(atDefaults > 0.40 && atDefaults < 0.60, s"documented ~0.49, got $atDefaults")
    assert(Similarity.signLshPairRecall(0.95, 16, 16) > 0.95,
      "the recommended tail-recall config clears 0.95")
    assert(Similarity.signLshPairRecall(0.95, 24, 16) > atDefaults, "more tables ⇒ more recall")
  }

  test("fuzzy dedup: edit distance rejects the block move that shingle Jaccard forgives") {
    // B = A with its halves swapped: every interior 3-shingle survives
    // (only the seam changes), so shingle Jaccard stays high — but the
    // text reads in a different order and the edit distance is ~half
    // the document. C = A with ONE token substituted: a true near-copy,
    // small edit distance. Fuzzy dedup must keep (A,C) and reject (A,B).
    val toks = (1 to 40).map(i => s"tk$i")
    val a = toks.mkString(" ")
    val b = (toks.drop(20) ++ toks.take(20)).mkString(" ")
    val c = toks.updated(7, "sub").mkString(" ")
    val docs = Seq((1L, a), (2L, b), (3L, c)).toDF("doc_id", "text")
    val jacPairs = Dedup.jaccardPairs(docs).select("doc_a", "doc_b")
      .as[(Long, Long)].collect().toSet
    assert(jacPairs.contains((1L, 2L)), "Jaccard alone accepts the block move")
    val fuzzy = Dedup.editNearDupPairs(docs, maxEdits = 15L)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(fuzzy.contains((1L, 3L)), "one-token edit passes the edit gate")
    assert(!fuzzy.contains((1L, 2L)), "block move fails the edit gate")
  }

  test("clustered SemDeDup keeps one representative per component where greedy keeps two") {
    // Edges a–c and b–c with NO a–b edge (c is the bisector of two
    // vectors 32° apart; cos 16° ≈ 0.961 ≥ 0.95, cos 32° ≈ 0.848 < 0.95):
    //  - the greedy pairwise rule drops the higher id of each pair →
    //    drops only c, keeping BOTH a and b from one semantic group;
    //  - component clustering keeps exactly min(a) per group.
    // Exact pair source (tiny corpus) so the test pins the PRUNE RULES,
    // not LSH recall on inexact neighbors.
    def unit(theta: Double): Seq[Float] =
      (Seq(math.cos(theta).toFloat, math.sin(theta).toFloat) ++ Seq.fill(62)(0f))
    val t = math.toRadians(16.0)
    val corpus = Seq(
      (1L, unit(0.0)), (2L, unit(2 * t)), (3L, unit(t))
    ).toDF("vec_id", "embedding")
    val e = corpus.select(col("vec_id"), col("embedding"),
      sqrt(Similarity.dot(col("embedding"), col("embedding"))).as("nrm"))
    val pairs = e.alias("a").join(e.alias("b"), col("a.vec_id") < col("b.vec_id"))
      .withColumn("sim",
        Similarity.dot(col("a.embedding"), col("b.embedding")) / (col("a.nrm") * col("b.nrm")))
      .filter(col("sim") >= 0.95)
      .select(col("a.vec_id").as("doc_a"), col("b.vec_id").as("doc_b"))
    assert(pairs.as[(Long, Long)].collect().toSet === Set((1L, 3L), (2L, 3L)))
    val greedySurvivors = corpus
      .join(pairs.select(col("doc_b").as("vec_id")).distinct(), Seq("vec_id"), "left_anti")
      .select("vec_id").as[Long].collect().toSet
    assert(greedySurvivors === Set(1L, 2L), "greedy keeps both chain endpoints")
    val clustered = Dedup.connectedComponents(pairs)
    val clusteredSurvivors = corpus
      .join(clustered.filter(col("component") =!= col("doc_id"))
        .select(col("doc_id").as("vec_id")), Seq("vec_id"), "left_anti")
      .select("vec_id").as[Long].collect().toSet
    assert(clusteredSurvivors === Set(1L), "clustering keeps one representative per component")
  }

  test("sign-LSH hot-bucket cap: a 10⁴-copy mega cluster neither DNFs nor disappears silently") {
    // A real crawl's duplicate CLUSTER (10⁴+ copies of one error page)
    // collides into ONE bucket per table — C(10⁴,2) ≈ 5·10⁷ candidate
    // pairs × 8 tables through the self-join if unguarded, the same
    // blow-up class that DNF'd the IVF variant at sf10. With the cap:
    //  - the run completes (bounded per-bucket work),
    //  - the cluster contributes NO pairs (oversized in EVERY table —
    //    exact copies collide everywhere),
    //  - but it is NOT silent: oversizedEmbeddingBuckets surfaces the
    //    bucket in each of the 8 tables,
    //  - while a small cluster under the cap is still fully recovered.
    val base = embs.select("vec_id", "embedding")
    def clusterOf(srcId: Long, copies: Int, idBase: Long) = {
      val seed = base.filter(col("vec_id") === srcId).select("embedding").limit(1)
      spark.range(copies.toLong).crossJoin(broadcast(seed))
        .select((col("id") + idBase).as("vec_id"), col("embedding"))
    }
    val ids = base.select("vec_id").as[Long].collect().sorted
    val mega = clusterOf(ids(0), 10000, 2000000L)
    val small = clusterOf(ids(1), 30, 3000000L)
    val corpus = base.unionByName(mega).unionByName(small)
    val pairs = Similarity.nearDupPairsLsh(corpus)
      .select("vec_a", "vec_b").as[(Long, Long)].collect()
    val megaIds = (0 until 10000).map(i => 2000000L + i).toSet + ids(0)
    assert(!pairs.exists(p => megaIds(p._1) || megaIds(p._2)),
      "capped mega-cluster bucket must contribute no pairs")
    // small cluster: 30 copies + the original = C(31,2) pairs, all exact
    val smallIds = (0 until 30).map(i => 3000000L + i).toSet + ids(1)
    val smallPairs = pairs.filter(p => smallIds(p._1) && smallIds(p._2))
    assert(smallPairs.length === 31 * 30 / 2,
      s"under-cap cluster fully recovered, got ${smallPairs.length}")
    val audit = Similarity.oversizedEmbeddingBuckets(corpus)
      .as[(Int, Long, Long)].collect()
    assert(audit.length === 8, s"the mega bucket surfaces once per table: $audit")
    assert(audit.forall(_._3 >= 10001L), s"audit reports the cluster population: $audit")
    assert(audit.map(_._1).toSet === (0 until 8).toSet, "one oversized bucket per table")
  }

  test("sign-LSH candidate volume stays probability-bounded on the clean corpus") {
    // No pair in the raw fixture reaches the threshold, so EVERY
    // candidate the bands surface is background noise — the expected
    // rate is tables·C(n,2)/2^planes ≪ C(n,2). Allow 100× headroom over
    // the expectation; the all-pairs count (~200k at sf0.001) would
    // fail it by orders of magnitude, so this pins the candidate join
    // as banded, not all-pairs.
    val n = embs.count().toDouble
    val expectedBackground = 8.0 * n * (n - 1) / 2.0 / math.pow(2.0, 24)
    val candidates = Similarity.nearDupPairsLsh(embs, threshold = -1.0).count().toDouble
    assert(candidates <= math.max(expectedBackground * 100, 50.0),
      s"candidate volume $candidates vs background expectation $expectedBackground")
  }

  test("decontamination measures containment of the eval doc, not Jaccard") {
    // eval doc 10 is fully contained in train doc 1 (tiny Jaccard — the
    // train page is much longer); eval doc 20 shares nothing.
    val train = Seq(
      (1L, ("lorem ipsum dolor sit amet " * 20) + "the secret eval question text here"),
      (2L, "completely unrelated train page about something else entirely")
    ).toDF("doc_id", "text")
    val eval = Seq(
      (10L, "the secret eval question text here"),
      (20L, "nothing in common with any training page at all")
    ).toDF("doc_id", "text")
    val got = Dedup.decontamPairs(train, eval)
      .select("eval_doc", "train_doc", "overlap")
      .as[(Long, Long, Double)].collect().toSet
    assert(got == Set((10L, 1L, 1.0)), s"got $got")
    val report = Dedup.decontamReport(train, eval)
      .as[(Long, Long, Double)].collect().toSet
    assert(report == Set((10L, 1L, 1.0)), s"got $report")
  }

  test("decontamination boilerplate cap drops only too-common shingles") {
    // "header text repeated on every page" appears in all 3 train docs;
    // the genuine leak shingles appear in exactly one. With maxTrainDf=2
    // the boilerplate-only eval doc 11 falls below threshold while the
    // genuine leak (eval 10 ⊂ train 1) keeps overlap 1.0.
    val boiler = "standard header text repeated on every page"
    val train = Seq(
      (1L, s"$boiler the secret eval question text here"),
      (2L, s"$boiler unrelated body one"),
      (3L, s"$boiler unrelated body two")
    ).toDF("doc_id", "text")
    val eval = Seq(
      (10L, "the secret eval question text here"),
      (11L, boiler)
    ).toDF("doc_id", "text")
    val uncapped = Dedup.decontamPairs(train, eval)
      .select("eval_doc").as[Long].collect().toSet
    assert(uncapped == Set(10L, 11L), s"got $uncapped")
    val capped = Dedup.decontamPairs(train, eval, maxTrainDf = 2L)
      .select("eval_doc", "train_doc", "overlap")
      .as[(Long, Long, Double)].collect().toSet
    assert(capped == Set((10L, 1L, 1.0)), s"got $capped")
  }

  test("decontamination cap survives a pathological hot bucket without a window") {
    // One boilerplate shingle planted in EVERY train doc (df = 500) while
    // each genuine leak shingle has df = 1. Uncapped, the boilerplate
    // alone fans the shingle join out 500 × |eval| rows; capped it
    // vanishes before the join and only the honest pair survives. The
    // registered ext20 lanes run exactly this guarded shape.
    val boiler = "standard header text repeated on every page"
    val train = spark.range(1, 501)
      .select(col("id").as("doc_id"),
        concat(lit(s"$boiler filler body "), col("id"),
          when(col("id") === 1, lit(" the secret eval question text here"))
            .otherwise(lit(""))).as("text"))
    val eval = Seq(
      (1000L, "the secret eval question text here"),
      (1001L, boiler)).toDF("doc_id", "text")
    val capped = Dedup.decontamPairs(train, eval, maxTrainDf = 100L)
    // plan guard: the hot-shingle filter must be the groupBy + anti-join
    // shape, never a count-over-shingle window (that funnels the whole
    // hot bucket through one task — the skew the cap exists to remove).
    // The shingler's own lead() windows are keyed by doc_id and fine;
    // what must not appear is a window PARTITIONED BY the shingle.
    val plan = capped.queryExecution.executedPlan.toString
    assert(!plan.contains("windowspecdefinition(shingle"),
      s"guard planned a count-over-shingle window:\n$plan")
    val got = capped.select("eval_doc", "train_doc", "overlap")
      .as[(Long, Long, Double)].collect().toSet
    assert(got == Set((1000L, 1L, 1.0)), s"got $got")
  }

  test("line dedup removes cross-doc boilerplate lines, keeps order, and keeps emptied docs") {
    val banner = "accept cookies to continue"
    val docs = Seq(
      (1L, s"unique alpha body\n$banner\nunique alpha tail"),
      (2L, s"$banner\nunique beta body"),
      (3L, banner), // fully boilerplate — must come back as an empty row
      (4L, "repeated inside\nrepeated inside\nonly here") // within-doc repeat, df = 1 → kept
    ).toDF("doc_id", "text")
    val got = Dedup.lineDedup(docs, maxDf = 2L)
      .as[(Long, String, Long, Long)].collect().map(r => r._1 -> r).toMap
    assert(got(1L) === ((1L, "unique alpha body\nunique alpha tail", 3L, 1L)), s"${got(1L)}")
    assert(got(2L) === ((2L, "unique beta body", 2L, 1L)), s"${got(2L)}")
    assert(got(3L) === ((3L, "", 1L, 1L)), s"${got(3L)}")
    assert(got(4L) === ((4L, "repeated inside\nrepeated inside\nonly here", 3L, 0L)),
      s"within-doc repetition is NOT boilerplate (df counts distinct docs): ${got(4L)}")
  }

  test("token-window segmentation covers every token; lineDedup round-trips an untouched corpus") {
    // all-unique corpus: nothing removed, reassembly must reproduce the
    // window join of the original text exactly
    val docs = spark.range(0, 50)
      .select(col("id").as("doc_id"),
        concat_ws(" ", lit("w"), col("id"), lit("x"), col("id") + 1, lit("y"),
          col("id") + 2, lit("z"), col("id") % 7, lit("tail"), col("id")).as("text"))
    val out = Dedup.lineDedup(docs, maxDf = 2L,
      seg = graft.ops.TextOps.tokenWindowLines(4), joinSep = "\n")
    assert(out.filter(col("n_lines_removed") =!= 0L).isEmpty)
    val bad = out.join(docs.select(col("doc_id"), col("text").as("orig")), "doc_id")
      .filter(regexp_replace(col("text"), "\n", " ") =!= col("orig"))
    assert(bad.isEmpty, "reassembled windows lost or reordered tokens")
  }

  test("novelty: verbatim re-read scores 0, unseen text 1, mixtures the exact fraction") {
    val ref = Seq((1L, "alpha beta gamma delta epsilon")).toDF("doc_id", "text")
    val eval = Seq(
      (10L, "alpha beta gamma delta epsilon"), // all 3 shingles seen → 0
      (11L, "zeta eta theta iota kappa"),      // all 3 unseen → 1
      // "beta gamma delta" seen; other 3 of 4 shingles unseen → 3/4
      (12L, "x beta gamma delta y z")
    ).toDF("doc_id", "text")
    val got = Dedup.noveltyScores(ref, eval)
      .as[(Long, Long, Long, Double)].collect().map(r => r._1 -> r).toMap
    assert(got(10L) === ((10L, 3L, 3L, 0.0)), s"${got(10L)}")
    assert(got(11L) === ((11L, 3L, 0L, 1.0)), s"${got(11L)}")
    assert(got(12L) === ((12L, 4L, 1L, 0.75)), s"${got(12L)}")
  }

  test("bloom decontam equals exact decontam on the fixture split (no false negatives)") {
    val train = docs.filter(col("doc_id") % 5 =!= 0)
    val eval = docs.filter(col("doc_id") % 5 === 0)
    val exact = Dedup.decontamPairs(train, eval, maxTrainDf = 200L)
      .as[(Long, Long, Double)].collect().toSet
    val bloomed = Dedup.decontamPairsBloom(train, eval, maxTrainDf = 200L,
        numBits = 1 << 16, numHashes = 5)
      .as[(Long, Long, Double)].collect().toSet
    assert(exact.nonEmpty, "fixture split produced no contamination pairs — test is vacuous")
    assert(bloomed == exact, s"bloom path diverged: missing=${exact -- bloomed} extra=${bloomed -- exact}")
  }

  test("bloom prefilter drops nearly all train shingles of a disjoint corpus") {
    // Disjoint vocabularies: every train shingle is absent from the eval
    // set, so only Bloom false positives survive the probe. At k=5,
    // m=2^16 bits and n ≈ 3·10³ inserted shingles the fp rate is ~1e-5 —
    // assert a generous < 1% bound, and that the pair result is empty.
    val train = spark.range(0, 1000)
      .select(col("id").as("doc_id"),
        concat_ws(" ", lit("alpha"), col("id"), lit("beta"), col("id") + 1,
          lit("gamma"), col("id") + 2, lit("delta"), col("id") % 97).as("text"))
    val eval = spark.range(0, 500)
      .select((col("id") + 10000).as("doc_id"),
        concat_ws(" ", lit("omega"), col("id"), lit("psi"), col("id") + 1,
          lit("chi"), col("id") + 2, lit("phi"), col("id") % 89).as("text"))
    val invE = graft.ops.TextOps.shingleRows(eval)
    val bloom = Dedup.bloomBuild(invE, "shingle", 1 << 16, 5)
    val invT = graft.ops.TextOps.shingleRows(train)
    val total = invT.count()
    val passed = invT.filter(Dedup.mightContain(bloom, 5, col("shingle"))).count()
    assert(total > 3000L, s"expected a substantial train shingle set, got $total")
    assert(passed.toDouble / total < 0.01,
      s"prefilter passed $passed of $total disjoint shingles — fp rate too high")
    assert(Dedup.decontamPairsBloom(train, eval).isEmpty)
  }

  test("bloom probe stays inside whole-stage codegen (no UDF, no fallback expression)") {
    val eval = docs.filter(col("doc_id") % 5 === 0)
    val invE = graft.ops.TextOps.shingleRows(eval)
    val bloom = Dedup.bloomBuild(invE, "shingle", 1 << 16, 5)
    val probe = graft.ops.TextOps.shingleRows(docs.filter(col("doc_id") % 5 =!= 0))
      .filter(Dedup.mightContain(bloom, 5, col("shingle")))
    probe.collect() // finalize the AQE plan before reading it
    val plan = probe.queryExecution.executedPlan.toString
    // codegen stages render as "*(n) Operator" in the final plan string
    assert(plan.contains("*("), s"probe fell out of codegen:\n$plan")
    assert(!plan.toLowerCase.contains("batchevalpython") && !plan.contains("ScalaUDF"),
      s"probe used a UDF:\n$plan")
  }
}
