package graft

import graft.ops.Chunking
import org.apache.spark.sql.functions._

/** Chunking — the distributed global sequence (two-pass rank) and the
  * zero-sequence arithmetic chunker. The rank must equal a plain
  * row_number over the global key order on ANY input partitioning, with
  * no window and no single-partition exchange anywhere in its plan. */
class ChunkingSpec extends SparkSpec {

  import spark.implicits._

  test("globalRank equals row_number over the global key order") {
    // adversarial layout: keys arrive hashed across 13 partitions in
    // pseudo-random order, with gaps and negative values
    val keys = (1 to 5000).map(i => (i * 2654435761L) % 100003L - 50000L).distinct
    val df = keys.toDF("k").repartition(13)
    val got = Chunking.globalRank(df, "k", numPartitions = 7)
      .as[(Long, Long)].collect().toMap
    val expected = keys.sorted.zipWithIndex.map { case (k, i) => k -> (i + 1L) }.toMap
    assert(got === expected)
  }

  test("globalRank survives empty input and fewer rows than partitions") {
    val empty = Chunking.globalRank(Seq.empty[Long].toDF("k"), "k")
    assert(empty.columns.contains("rn") && empty.count() === 0)
    val one = Chunking.globalRank(Seq(42L).toDF("k"), "k", numPartitions = 32)
      .as[(Long, Long)].collect().toSeq
    assert(one === Seq((42L, 1L)))
  }

  test("globalRank plans no window and no single-partition exchange") {
    val df = Chunking.globalRank(spark.range(1000).toDF("k"), "k", numPartitions = 8)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("windowspecdefinition"), s"rank planned a window:\n$plan")
    assert(!plan.contains("Exchange SinglePartition"),
      s"rank planned a global exchange:\n$plan")
  }

  test("globalRank rejects reserved working columns") {
    val e = intercept[IllegalArgumentException](
      Chunking.globalRank(Seq((1L, 2L)).toDF("k", "__pid"), "k"))
    assert(e.getMessage.contains("__pid"))
  }

  test("arithmeticChunks bounds the chunk count and is pure key arithmetic") {
    val df = spark.range(1000).toDF("k")
    val chunks = Chunking.arithmeticChunks(df, "k", chunkSize = 50L)
      .groupBy("chunk_id").agg(count(lit(1)).as("n"))
      .as[(Long, Long)].collect().toMap
    assert(chunks.keySet === (0L until 20L).toSet, "ceil(1000/50) = 20 chunks")
    assert(chunks.values.forall(_ === 50L), "dense keys spread uniformly under mod")
    // a chunk size above the row count degenerates to one chunk
    val single = Chunking.arithmeticChunks(df, "k", chunkSize = 5000L)
      .select("chunk_id").distinct().as[Long].collect().toSeq
    assert(single === Seq(0L))
    intercept[IllegalArgumentException](Chunking.arithmeticChunks(df, "k", 0L))
  }
}
