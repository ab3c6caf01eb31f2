package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** EXT5/multimodal — opaque-binary media columns with typed metadata, the
  * column shape a multimodal training pipeline carries (image/audio/video
  * bytes + descriptors).
  *
  * The container has no media codecs, so the decode kernel is a
  * clearly-marked deterministic STUB ([[FakeDecoder]]); everything
  * Spark-side — the binary column, the metadata struct schema, batched
  * per-partition decoding via `mapPartitions` on a typed Dataset, and the
  * derived-feature projection — is real and tested. Swapping in a real
  * decoder changes only the function body, not the plumbing or the plan
  * shape (narrow map over scan partitions; no shuffle).
  */
object Multimodal {

  /** A media row: opaque payload + typed metadata, as a training pipeline
    * would store frames/clips alongside provenance. */
  final case class MediaRow(media_id: Long, kind: String, payload: Array[Byte])

  final case class MediaFeatures(
      media_id: Long,
      kind: String,
      n_bytes: Long,
      width: Long,
      height: Long,
      n_frames: Long,
      checksum: Long)

  /** STUB decoder — stands in for an image/audio/video codec. Deterministic
    * functions of the payload bytes so tests have exact expectations. A
    * real implementation would parse the container format here. */
  object FakeDecoder {
    def decode(r: MediaRow): MediaFeatures = {
      val n = r.payload.length.toLong
      var ck = 0L
      var i = 0
      while (i < r.payload.length) { ck = (ck * 31 + (r.payload(i) & 0xff)) % 1000000007L; i += 1 }
      MediaFeatures(r.media_id, r.kind, n, n % 640 + 1, n % 480 + 1, n / 1000 + 1, ck)
    }
  }

  /** Batched per-partition decode: one decoder instance per partition (the
    * shape a real codec needs — init once, stream the batch), narrow op,
    * no shuffle. */
  def decodeFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      // real codecs would open handles here, once per partition
      it.map(FakeDecoder.decode)
    }
  }

  /** Builds a media table from `documents` (text bytes as the opaque
    * payload) — the fixture's stand-in for reading real media files. */
  def mediaFromDocuments(spark: SparkSession, docs: DataFrame): Dataset[MediaRow] = {
    import spark.implicits._
    docs.select(
      col("doc_id").as("media_id"),
      concat(lit("img/"), col("source")).as("kind"),
      encode(col("text"), "UTF-8").as("payload"))
      .as[MediaRow]
  }

  /** Frame sampling on the opaque payload: every `stride`-th byte window —
    * the plumbing shape of video frame extraction (explode over frame
    * index, slice the payload), pure column ops. */
  def sampleFrames(spark: SparkSession, docs: DataFrame, frameBytes: Int = 64, stride: Int = 4): DataFrame = {
    val media = mediaFromDocuments(spark, docs).toDF()
    media
      .withColumn("n_frames", (length(col("payload")) / lit(frameBytes)).cast("long"))
      .withColumn("frame_idx", explode(sequence(lit(0L), greatest(col("n_frames") - 1L, lit(0L)), lit(stride.toLong))))
      .select(
        col("media_id"),
        col("frame_idx"),
        col("payload").substr(lit(1) + col("frame_idx").cast("int") * frameBytes, lit(frameBytes)).as("frame"))
  }
}
