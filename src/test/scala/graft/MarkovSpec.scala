package graft

import graft.ops.Markov
import org.apache.spark.sql.functions._

/** Markov removal-effect attribution laws on a hand corpus. */
class MarkovSpec extends SparkSpec {
  import spark.implicits._

  private def ev(rows: (Long, Long, Long, String)*) =
    rows.toDF("user_id", "ts", "event_id", "event_type")

  test("transitions: start/conv/null structure and first-conversion truncation") {
    val m = Markov.transitions(ev(
      (1L, 10L, 1L, "click"), (1L, 20L, 2L, "purchase"),
      (1L, 30L, 3L, "view"), // after the conversion — must be ignored
      (2L, 10L, 4L, "view"), (2L, 20L, 5L, "purchase"),
      (3L, 10L, 6L, "view")))
      .as[(String, String, Long)].collect().map { case (s, d, n) => (s, d) -> n }.toMap
    assert(m === Map(
      ("start", "click") -> 1L, ("start", "view") -> 2L,
      ("click", "conv") -> 1L, ("view", "conv") -> 1L, ("view", "null") -> 1L))
  }

  test("removal effects match the closed form on a hand chain") {
    val trans = Seq(
      ("start", "click", 1L), ("start", "view", 2L),
      ("click", "conv", 1L), ("view", "conv", 1L), ("view", "null", 1L))
      .toDF("src", "dst", "n")
    val got = Markov.removalEffects(trans)
      .select("channel", "p_base", "removal_effect", "share")
      .as[(String, Double, Double, Double)].collect().map(r => r._1 -> r).toMap
    // p_base = 1/3·1 + 2/3·1/2 = 2/3; removing either channel leaves 1/3
    assert(math.abs(got("click")._2 - 2.0 / 3) < 1e-12)
    assert(math.abs(got("click")._3 - 0.5) < 1e-12)
    assert(math.abs(got("view")._3 - 0.5) < 1e-12)
    assert(math.abs(got("click")._4 - 0.5) < 1e-12 && math.abs(got("view")._4 - 0.5) < 1e-12)
  }

  test("lane shares are a probability vector over the fixture channels") {
    val lane = SparkEntry.queries("an23_markov_attribution")(spark, sf("sf0.001"))
      .select("channel", "share", "removal_effect")
      .as[(String, Double, Double)].collect()
    assert(lane.map(_._1).sorted.toSeq == Seq("click", "error", "signup", "view"))
    assert(math.abs(lane.map(_._2).sum - 1.0) < 1e-6)
    assert(lane.forall(_._3 >= 0.0))
  }
}
