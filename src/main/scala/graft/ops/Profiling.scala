package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** One-pass column profiling — the ANALYZE/data-quality primitive every
  * ingest gate runs before accepting a drop: row count, per-column null
  * count, distinct count, and min/max, computed in a SINGLE scan of the
  * input (one global aggregate), then unpivoted to one row per column.
  *
  * Numeric and string columns surface min/max in separate TYPED columns
  * (`min_num`/`max_num` vs `min_str`/`max_str`): casting numerics to
  * string for a shared column would make the profile depend on the
  * engine's float-formatting rules — typed min/max are exact values and
  * hash-compare across engines.
  *
  * Scale note: the distinct counts default to EXACT `count(distinct)`,
  * which Spark plans as one Expand ×(k columns) over the scan — still a
  * single pass over the data, but k× the aggregate input. At lake scale
  * flip `exact = false` for HyperLogLog++ (`approx_count_distinct`, one
  * sketch per column, no Expand) — same shape the an13 sketch lane
  * persists. */
object Profiling {

  def profile(
      df: DataFrame,
      numCols: Seq[String],
      strCols: Seq[String],
      exact: Boolean = true): DataFrame = {
    val all = numCols ++ strCols
    require(all.nonEmpty, "profile needs at least one column")
    require(all.distinct.size == all.size,
      s"duplicate columns across numCols/strCols would collide on their " +
        s"aggregate aliases: ${all.diff(all.distinct).distinct.mkString(", ")}")
    def nd(c: String): Column =
      if (exact) countDistinct(col(c)) else approx_count_distinct(col(c))
    val aggs =
      all.flatMap { c =>
        Seq(
          // coalesce: SUM over ZERO rows is NULL, and an empty drop is
          // exactly what an ingest gate profiles — n_nulls must read 0
          // there, not NULL
          coalesce(sum(when(col(c).isNull, 1L).otherwise(0L)), lit(0L)).as(s"${c}__nulls"),
          nd(c).as(s"${c}__nd"))
      } ++
        numCols.flatMap { c =>
          Seq(min(col(c)).cast("double").as(s"${c}__min"),
            max(col(c)).cast("double").as(s"${c}__max"))
        } ++
        strCols.flatMap { c =>
          Seq(min(col(c)).as(s"${c}__min"), max(col(c)).as(s"${c}__max"))
        }
    val one = df.agg(count(lit(1)).as("n_rows"), aggs: _*)
    val rows = numCols.map { c =>
      struct(lit(c).as("col_name"), col("n_rows"),
        col(s"${c}__nulls").as("n_nulls"), col(s"${c}__nd").as("n_distinct"),
        col(s"${c}__min").as("min_num"), col(s"${c}__max").as("max_num"),
        lit(null).cast("string").as("min_str"), lit(null).cast("string").as("max_str"))
    } ++ strCols.map { c =>
      struct(lit(c).as("col_name"), col("n_rows"),
        col(s"${c}__nulls").as("n_nulls"), col(s"${c}__nd").as("n_distinct"),
        lit(null).cast("double").as("min_num"), lit(null).cast("double").as("max_num"),
        col(s"${c}__min").as("min_str"), col(s"${c}__max").as("max_str"))
    }
    one.select(explode(array(rows: _*)).as("p")).select("p.*")
  }
}
