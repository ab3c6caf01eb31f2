package graft

import graft.ops.QualityFunnel
import org.apache.spark.sql.functions._

/** EXT36 quality funnel: planted one-rule-killers pin each rule's
  * definition and the sequential (first-failing-rule) semantics; the
  * fixture test pins the ablation-table invariants the oracle's hash
  * can't articulate on its own. */
class QualityFunnelSpec extends SparkSpec {
  import spark.implicits._

  // One doc per failure mode, plus one clean survivor:
  //  10: 5 tokens — killed by len.
  //  11: 30 tokens, 27 of them "the" — survives len (30), killed by rep
  //      (distinct 4 → ratio 26/30 > 0.65).
  //  12: 25 distinct non-stopword tokens — survives len+rep, killed by
  //      stop (0 stopwords).
  //  13: survives everything — half its tokens are "the" (the planted
  //      corpus's dominant unigram, boosted by doc 11), which lifts the
  //      mean log-prob over the −3.43 LM gate while 15/26 distinct
  //      tokens keep the repetition ratio under 0.65.
  private val planted = Seq(
    (10L, "w1 w2 w3 w4 w5"),
    (11L, ("the " * 27).trim + " alpha beta gamma"),
    (12L, (1 to 25).map(i => s"tok$i").mkString(" ")),
    (13L, "the quick the fox the lazy the dog the bird the tree " +
      "the barn the morning the evening the meadow the river the stone"))
    .toDF("doc_id", "text")

  test("each rule kills exactly its planted document; the clean doc survives") {
    val flags = QualityFunnel.filterFlags(planted)
      .as[(Long, Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5, r._6))).toMap
    assert(flags(10L)._1 === 0L, "len rule kills the 5-token doc")
    assert(flags(11L) === ((1L, 0L, 1L, 1L, 0L)), "rep rule kills the chant doc")
    assert(flags(12L)._1 === 1L)
    assert(flags(12L)._2 === 1L)
    assert(flags(12L)._3 === 0L, "stop rule kills the stopword-free doc")
    assert(flags(13L) === ((1L, 1L, 1L, 1L, 1L)), "clean doc passes all four")
  }

  test("funnel rows chain (n_out(k) = n_in(k+1)) and count first failures only") {
    val funnel = QualityFunnel.filterFunnel(planted)
      .orderBy("step")
      .as[(Long, String, Long, Long, Long)].collect()
    assert(funnel.map(_._2).toSeq === QualityFunnel.Rules)
    assert(funnel.head._3 === 4L, "n_in of the first rule is the corpus size")
    funnel.foreach { case (_, rule, nIn, nFail, nOut) =>
      assert(nIn - nFail === nOut, s"$rule row is internally consistent")
    }
    funnel.sliding(2).foreach { case Array(a, b) =>
      assert(a._5 === b._3, s"${a._2}→${b._2} chains")
    }
    // doc 10 fails len AND stop AND rep, but must count only against len
    assert(funnel(0)._4 === 1L)
    assert(funnel(1)._4 === 1L)
    assert(funnel(2)._4 === 1L)
    assert(funnel(3)._5 === 1L, "exactly the clean doc survives")
  }

  test("relaxation savings count only single-rule failures") {
    val flags = QualityFunnel.filterFlags(planted)
      .as[(Long, Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> Seq(r._2, r._3, r._4, r._5)).toMap
    val got = QualityFunnel.relaxationSavings(planted)
      .as[(String, Long)].collect().toMap
    QualityFunnel.Rules.zipWithIndex.foreach { case (rule, i) =>
      val expected = flags.values.count(f => f(i) == 0L && f.zipWithIndex
        .forall { case (v, j) => j == i || v == 1L })
      assert(got(rule) === expected.toLong, s"$rule counts exactly its sole failures")
    }
    // doc 10 fails len+stop(+lm): relaxing any ONE rule cannot save it,
    // so it must appear in no count
    assert(flags(10L).count(_ == 0L) > 1, "fixture premise: doc 10 is a multi-failure")
  }

  test("a NULL-text document still gets a verdict (all-fail), never vanishes") {
    // NULL text explodes to zero tokens, so the LM aggregate has no row
    // for it — an inner flags⋈lm join would silently drop the document
    // from the flags AND from the funnel's n (neither passed nor failed).
    val withNull = planted.unionByName(
      Seq((99L, Option.empty[String])).toDF("doc_id", "text"))
    val flags = QualityFunnel.filterFlags(withNull)
    assert(flags.count() === 5L, "every input document gets a verdict row")
    val r99 = flags.filter($"doc_id" === 99L)
      .as[(Long, Long, Long, Long, Long, Long)].head()
    assert(r99 === ((99L, 0L, 0L, 0L, 0L, 0L)), "NULL text fails every gate, as 0 not NULL")
    val funnel = QualityFunnel.filterFunnel(withNull)
      .orderBy("step").as[(Long, String, Long, Long, Long)].collect()
    assert(funnel.head._3 === 5L, "funnel n_in counts the NULL-text doc")
  }

  test("fixture: flags and funnel agree; every rule is non-vacuous") {
    val docs = Tables.documents(spark, sf("sf0.001"))
    val flags = QualityFunnel.filterFlags(docs).cache()
    val funnel = QualityFunnel.filterFunnel(docs)
      .orderBy("step").as[(Long, String, Long, Long, Long)].collect()
    assert(funnel.head._3 === flags.count())
    val survivors = flags.filter($"pass_all" === 1L).count()
    assert(funnel.last._5 === survivors, "funnel tail equals the pass_all count")
    assert(survivors > 0L, "thresholds must not kill the whole corpus")
    funnel.foreach { case (_, rule, _, nFail, _) =>
      assert(nFail > 0L, s"rule $rule never fires on the fixture — vacuous gate")
    }
    flags.unpersist()
  }
}
