package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Explicit skew-salting for fact⋈dim equi-joins.
  *
  * AQE's skew-join splitting (`spark.sql.adaptive.skewJoin`) already
  * handles a hot key INSIDE a sort-merge join at runtime, and that is the
  * first line of defense — but it only fires on the join patterns AQE can
  * rewrite (post-shuffle SMJ stages). Two places it cannot help:
  *
  *  - a broadcast-hash join whose STREAMED side is skewed feeding a later
  *    keyed operation (the skew survives into the next shuffle);
  *  - a hot fact key whose partition also overflows a single task's spill
  *    budget before AQE's runtime stats exist (first shuffle of the job).
  *
  * Salting removes the hot key structurally: the fact side sprays each row
  * into one of `salt` sub-keys, the dim side is replicated `salt`× so every
  * sub-key still finds its dim row, and the join key becomes (key, salt) —
  * a key that is `salt`× finer, so the hottest partition shrinks by `salt`×
  * at the cost of `salt`× more dim rows through the shuffle (or broadcast).
  * The join RESULT is identical for any spray function, so correctness
  * never depends on the salt — the oracle for j10 pins that.
  *
  * Scale guidance: salt = ceil(hot-key rows / healthy-partition rows);
  * replicating the dim is only sane when |dim| × salt stays far below the
  * fact side (the usual case — dims are small). For dim tables too large to
  * replicate, split the hot keys out instead (filter → broadcast the hot
  * subset, union with the unsalted remainder).
  */
object Skew {

  /** Inner/left equi-join of a skewed `facts` side against a small `dim`
    * side on using-column `key`, salted `salt`×. The spray hashes the
    * row's VALUES (all fact columns), never a physical row id: a
    * `monotonically_increasing_id`-style spray is not stable under task
    * retry (a recomputed map partition re-numbers rows, and an
    * INDETERMINATE stage forces Spark to roll back and re-run every
    * downstream task on fetch failure), while a value hash assigns the
    * same row the same sub-key on every attempt. The spray never
    * influences the result either way — every (key, s) fact row meets
    * the replicated dim row (key, s) — the choice only affects retry
    * cost and spread quality. Caveat: exact duplicate fact rows share a
    * sub-key; remove exact dups first (keepFirst) if the hot key is
    * dominated by identical rows. */
  def saltedJoin(
      facts: DataFrame,
      dim: DataFrame,
      key: String,
      salt: Int = 16,
      joinType: String = "inner"): DataFrame = {
    require(salt >= 1, s"salt must be ≥ 1, got $salt")
    require(Seq("inner", "left", "left_outer").contains(joinType),
      s"salting replicates the DIM side only — join type '$joinType' would " +
        "duplicate dim-preserved rows (use inner/left, or salt the other side)")
    require(!facts.columns.contains("__salt") && !dim.columns.contains("__salt"),
      "input already carries a __salt column — it would be silently " +
        "overwritten and dropped; rename it first")
    val sprayed = facts.withColumn("__salt",
      pmod(xxhash64(facts.columns.map(col).toSeq: _*), lit(salt.toLong)).cast("int"))
    val replicated = dim.withColumn("__salt",
      explode(array((0 until salt).map(lit): _*)))
    sprayed.join(replicated, Seq(key, "__salt"), joinType).drop("__salt")
  }
}
