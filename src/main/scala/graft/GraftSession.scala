package graft

import org.apache.spark.sql.SparkSession

/** One place for session config so engine, tests, Verify and Bench all run
  * under identical semantics:
  *
  *  - `spark.sql.ansi.enabled=false`: float division by zero yields NULL,
  *    matching the DuckDB oracle and the reference's pandas inf/NaN → 0
  *    cleanup (reference channel_reporter.py:114–118; SURVEY.md F8 maps it
  *    to `coalesce(x/y, 0)`).
  *  - `spark.sql.legacy.parquet.nanosAsLong=true`: kept for fixture
  *    generations whose `events.ts` is Parquet TIMESTAMP(NANOS) (Spark
  *    has no native nanos type; the conf surfaces it as epoch-nanos
  *    LongType). Current fixtures carry plain `timestamp[us]`, which
  *    reads as TIMESTAMP_NTZ — `Tables.normalizeTs` converts either
  *    physical type to the engine's canonical epoch-nanos LongType with
  *    integer arithmetic only, so the conf is a no-op there but keeps
  *    old-style files readable.
  *  - UTC session timezone, so date/time string formatting matches the
  *    oracle byte-for-byte.
  *  - `spark.sql.shuffle.partitions` sized to the local core count, not the
  *    200 default; on a real cluster this is tuned to executor count and
  *    AQE coalesces post-shuffle partitions either way.
  */
object GraftSession {
  def cpus: String = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")

  def build(appName: String): SparkSession = {
    val spark = SparkSession
      .builder()
      .master(s"local[$cpus]")
      .appName(appName)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.GraftExtensions.register(spark)
    spark
  }

  /** Apply the same SQL-conf semantics to an externally created session
    * (e.g. the ScalaTest shared session). */
  def tune(spark: SparkSession): SparkSession = {
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.ansi.enabled", "false")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    graft.functions.GraftExtensions.register(spark)
    spark
  }
}
