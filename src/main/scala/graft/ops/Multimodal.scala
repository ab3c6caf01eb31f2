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
    * real implementation would parse the container format here. The
    * metadata formulas live ONCE here (scalar + Column forms) — the
    * ext5_media_meta query derives from [[metaColumns]], so changing the
    * stub changes every Scala consumer in lockstep (the DuckDB oracle SQL
    * remains the one necessary second copy). */
  object FakeDecoder {
    def width(nBytes: Long): Long = nBytes % 640 + 1
    def height(nBytes: Long): Long = nBytes % 480 + 1
    def frames(nBytes: Long): Long = nBytes / 1000 + 1

    def decode(r: MediaRow): MediaFeatures = {
      val n = r.payload.length.toLong
      var ck = 0L
      var i = 0
      while (i < r.payload.length) { ck = (ck * 31 + (r.payload(i) & 0xff)) % 1000000007L; i += 1 }
      MediaFeatures(r.media_id, r.kind, n, width(n), height(n), frames(n), ck)
    }
  }

  /** Column forms of the stub metadata, over a binary `payload` column. */
  def metaColumns(payload: org.apache.spark.sql.Column): Seq[org.apache.spark.sql.Column] = {
    val n = length(payload).cast("long")
    Seq(
      n.as("n_bytes"),
      (n % 640 + 1).as("width"),
      (n % 480 + 1).as("height"),
      ((n / 1000).cast("long") + 1).as("n_frames")) // Column./ is double division
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

  final case class ResizedMedia(
      media_id: Long,
      kind: String,
      width: Long,
      height: Long,
      payload: Array[Byte])

  /** Resize to a fixed target — the normalization step in front of a
    * vision encoder, whose real contract is the OUTPUT SHAPE: every row
    * leaves with exactly targetW×targetH payload bytes regardless of
    * input size. The resample kernel is part of the [[FakeDecoder]] stub
    * (nearest-neighbor byte subsample, zero-fill for empty payloads — a
    * real codec resamples pixels here); the Spark side is the same
    * init-once-per-partition `mapPartitions` shape as [[decodeFeatures]]:
    * narrow, no shuffle, batch-friendly. */
  def resize(media: Dataset[MediaRow], targetW: Int = 32, targetH: Int = 32): Dataset[ResizedMedia] = {
    import media.sparkSession.implicits._
    val target = targetW * targetH
    media.mapPartitions { it =>
      it.map { r =>
        val n = r.payload.length
        val out = new Array[Byte](target)
        var i = 0
        while (i < target && n > 0) {
          out(i) = r.payload((i.toLong * n / target).toInt)
          i += 1
        }
        ResizedMedia(r.media_id, r.kind, targetW.toLong, targetH.toLong, out)
      }
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

  /** EXT5d — 64-bit dHash-style perceptual signature per media row. The
    * classic image dHash resamples the luminance plane to a (w+1)×h grid
    * and sets bit i when cell i is brighter than cell i+1 — robust to
    * scaling and re-encoding because it keeps only the gradient SIGNS.
    * Here the stub's "luminance plane" is the payload's character-code
    * sequence (the fixture payload is the document text; a real
    * deployment swaps decoded pixel rows in via the same mapInPandas
    * seam as [[FakeDecoder]]): 65 nearest-neighbor samples at positions
    * ⌊i·n/65⌋ — the exact [[resize]] resample rule — then bit i =
    * (sample_i > sample_{i+1}), i = 0..63.
    *
    * Everything is integer arithmetic over `ascii`/`substring`, so the
    * oracle replays the signatures exactly (same portability rule as
    * Dedup.simhash's MD5-nibble hash). Alignment sensitivity is the
    * known dHash trade: a one-char INSERTION shifts every later sample —
    * it finds re-encoded/trimmed copies, not edited ones; that's what
    * [[graft.ops.Dedup.minhashLshPairs]] is for. */
  def perceptualHash(docs: DataFrame): DataFrame = {
    val n = length(col("text")).cast("long")
    // two selects: samples materialize once each, not once per bit
    val sampled = docs.select(
      col("doc_id").as("media_id") +:
        (0 to 64).map { i =>
          val pos = (floor(n * lit(i.toDouble) / lit(65.0)).cast("long") + 1L).cast("int")
          ascii(col("text").substr(pos, lit(1))).as(s"c_$i")
        }: _*)
    val sig = (0 until 64)
      .map(b => when(col(s"c_$b") > col(s"c_${b + 1}"), lit(1L << b)).otherwise(lit(0L)))
      .reduce(_ + _)
    sampled.select(col("media_id"), sig.as("phash"))
  }

  /** EXT5d-pairs — perceptual near-dup pairs over [[perceptualHash]]
    * signatures, via the same banded-bucket hamming join as SimHash
    * ([[graft.ops.Dedup.bandedHammingPairs]]): candidates come from
    * band-key collisions (keyed equi-join — never all-pairs), then the
    * exact Hamming filter. (media_a, media_b, hamming). */
  def mediaNearDup(
      docs: DataFrame,
      maxHamming: Int = 3,
      bands: Int = 4,
      maxBucket: Int = Dedup.DefaultMaxBucket): DataFrame =
    Dedup.bandedHammingPairs(
      perceptualHash(docs), idCol = "media_id", sigCol = "phash",
      maxHamming = maxHamming, bands = bands, maxBucket = maxBucket,
      outA = "media_a", outB = "media_b")

  /** Frame sampling on the opaque payload: every `stride`-th byte window —
    * the plumbing shape of video frame extraction (explode over frame
    * index, slice the payload), pure column ops. Payloads with zero
    * complete frames yield zero rows (same contract as shingleRows for
    * short documents) — no truncated trailing frame is emitted. */
  def sampleFrames(spark: SparkSession, docs: DataFrame, frameBytes: Int = 64, stride: Int = 4): DataFrame = {
    val media = mediaFromDocuments(spark, docs).toDF()
    media
      .withColumn("n_frames", (length(col("payload")) / lit(frameBytes)).cast("long"))
      .filter(col("n_frames") > 0L)
      .withColumn("frame_idx", explode(sequence(lit(0L), col("n_frames") - 1L, lit(stride.toLong))))
      .select(
        col("media_id"),
        col("frame_idx"),
        col("payload").substr(lit(1) + col("frame_idx").cast("int") * frameBytes, lit(frameBytes)).as("frame"))
  }
}
