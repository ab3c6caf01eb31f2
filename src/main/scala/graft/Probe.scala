package graft
import org.apache.spark.sql.SparkSession

/** Throwaway environment probe (removed once findings are recorded). */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    ev.printSchema()
    import org.apache.spark.sql.functions._
    ev.withColumn("ts2", timestamp_micros(col("ts") / lit(1000L) cast "long"))
      .select("event_id", "ts", "ts2").show(3, false)
    spark.conf.set("spark.sql.ansi.enabled", "false")
    spark.sql("select 1.5/0.0 as a, cast(0.0/0.0 as double) as b").show()
    spark.sql("select round(0.1234565, 6) r1, round(cast(2.5 as double),0) r2").show()
    spark.stop()
  }
}
