package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Keyed table diff — the migration-validation primitive: after a
  * rewrite, backfill, or engine swap, classify every key as
  * added / removed / changed / unchanged between two snapshots of "the
  * same" table. (The reference validates by eyeballing row counts; at
  * lake scale the diff IS the validation artifact.)
  *
  * Plan shape: project each side to (keys, struct(non-key columns)),
  * ONE full-outer shuffle join on the key — both sides hash-partitioned
  * by it, the minimum any keyed comparison can do (a full outer cannot
  * broadcast) — then a null-safe struct comparison. The struct packing
  * means the comparison cost is one column regardless of width, and
  * `<=>` treats NULL fields as equal to NULL fields, so nullable columns
  * don't misreport as changed.
  */
object Diff {

  /** One row per key present in either side, with `change` ∈
    * {added, removed, changed, unchanged} (relative to `left` as the
    * "before" snapshot). CONTRACT: keys unique per side — "this key's
    * row changed" is ill-posed under duplicates, and a full-table
    * uniqueness pre-check would double the op's cost, so duplicates are
    * the caller's responsibility (they surface as multiplied join rows,
    * same as any keyed join). */
  def diffTables(left: DataFrame, right: DataFrame, keys: Seq[String]): DataFrame = {
    require(keys.nonEmpty, "diff needs at least one key column")
    require(
      left.columns.sorted.sameElements(right.columns.sorted),
      s"schemas differ: ${left.columns.mkString(",")} vs ${right.columns.mkString(",")}")
    val nonKeys = left.columns.filterNot(keys.contains).toSeq
    require(nonKeys.nonEmpty, "diff needs at least one non-key column to compare")
    Seq("__l", "__r").foreach(c =>
      require(!left.columns.contains(c), s"tables must not carry the reserved $c column"))
    def packed(df: DataFrame, as: String) =
      df.select(keys.map(col) :+ struct(nonKeys.map(col): _*).as(as): _*)
    packed(left, "__l")
      .join(packed(right, "__r"), keys, "full_outer")
      .select(
        keys.map(col) :+
          when(col("__r").isNull, "removed")
            .when(col("__l").isNull, "added")
            .when(col("__l") <=> col("__r"), "unchanged")
            .otherwise("changed")
            .as("change"): _*)
  }
}
