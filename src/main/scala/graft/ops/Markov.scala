package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Markov-chain multi-touch attribution (removal effects) — the
  * data-driven upgrade of position/decay heuristics (Anderl et al.
  * 2014's framework, public): model each user's channel path as a
  * first-order Markov chain with absorbing `conv`/`null` states, and
  * credit each channel by how much the chain's conversion probability
  * drops when that channel is removed (transitions into it redirect to
  * `null`).
  *
  * Scale split: path → transition extraction is the DATA-scale pass —
  * per-user windows with deterministic (ts, event_id) tie-breaks (the
  * an18/ext6 per-entity shape; partitions bounded by user activity) —
  * and everything after runs on the STATE-scale transition matrix
  * (|channels| + 3 rows squared), which collects to the driver under
  * the model-bounded contract (Pq/ext52's rule). The absorption
  * probability uses k fixed power iterations, mirroring the oracle's
  * unrolled CTEs.
  */
object Markov {

  /** Per-user ordered paths → absorbing-chain transition counts.
    *
    * Path rules (deterministic in any engine): events order by
    * (ts, event_id); `purchase` maps to the absorbing `conv`; a user's
    * path TRUNCATES after its first conversion (later events start no
    * new journey in this model); a virtual `start` precedes the first
    * event; a path with no conversion ends with an explicit
    * `last channel → null` absorption. */
  def transitions(events: DataFrame): DataFrame = {
    val ord = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val st = events
      .select(col("user_id"), col("ts"), col("event_id"),
        when(col("event_type") === "purchase", lit("conv"))
          .otherwise(col("event_type")).as("state"))
      .withColumn("pc",
        count(when(col("state") === "conv", 1))
          .over(ord.rowsBetween(Window.unboundedPreceding, -1)))
      .filter(coalesce(col("pc"), lit(0L)) === 0L)
    val steps = st
      .withColumn("src", coalesce(lag(col("state"), 1).over(ord), lit("start")))
      .select(col("src"), col("state").as("dst"))
    val tails = st
      .withColumn("rn", row_number().over(
        Window.partitionBy("user_id").orderBy(col("ts").desc, col("event_id").desc)))
      .filter(col("rn") === 1 && col("state") =!= "conv")
      .select(col("state").as("src"), lit("null").as("dst"))
    steps.union(tails).groupBy("src", "dst").agg(count(lit(1)).as("n"))
  }

  /** Removal-effect attribution over [[transitions]] counts: per
    * channel, the base-vs-removed conversion probability from `start`
    * (k-iteration absorption), the removal effect 1 − p_rem/p_base,
    * and the normalized attribution share. Driver math on the
    * state-scale matrix; returns one row per non-absorbing channel. */
  def removalEffects(trans: DataFrame, iterations: Int = 6): DataFrame = {
    val spark = trans.sparkSession
    import spark.implicits._
    val counts = trans.select("src", "dst", "n").as[(String, String, Long)].collect()
    val rowSum = counts.groupBy(_._1).view.mapValues(_.map(_._3).sum.toDouble).toMap
    // probabilities once; removal redirects PROBABILITY MASS (dst=c → null)
    val probs = counts.map { case (s, d, n) => (s, d, n / rowSum(s)) }

    def absorb(p: Seq[(String, String, Double)]): Double = {
      val states = (p.map(_._1) ++ p.map(_._2)).distinct.sorted
      val bySrc = p.groupBy(_._1).view
        .mapValues(_.sortBy(_._2).map { case (_, d, v) => (d, v) }).toMap
      var cur = states.map(s => s -> (if (s == "conv") 1.0 else 0.0)).toMap
      for (_ <- 1 to iterations) {
        cur = states.map { s =>
          s -> (s match {
            case "conv" => 1.0
            case "null" => 0.0
            case _ => bySrc.get(s).fold(0.0)(_.map { case (d, v) => v * cur(d) }.sum)
          })
        }.toMap
      }
      cur.getOrElse("start", 0.0)
    }

    val base = absorb(probs.toSeq)
    val channels = probs.map(_._1).filter(s => s != "start" && s != "conv" && s != "null")
      .distinct.sorted
    val out = channels.map { c =>
      val redirected = probs.toSeq
        .filter(_._1 != c)
        .map { case (s, d, v) => (s, if (d == c) "null" else d, v) }
        .groupBy(t => (t._1, t._2)).view.mapValues(_.map(_._3).sum).toSeq
        .map { case ((s, d), v) => (s, d, v) }
      val rem = absorb(redirected)
      val effect = 1.0 - rem / base
      (c, base, rem, effect)
    }
    val total = out.map(_._4).sum
    out.toSeq.map { case (c, b, r, e) => (c, b, r, e, e / total) }
      .toDF("channel", "p_base", "p_removed", "removal_effect", "share")
  }
}
