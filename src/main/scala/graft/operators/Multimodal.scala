package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Multimodal-column plumbing: media (image/audio/video) modeled as an
  * opaque BINARY column plus typed metadata — the schema a 100 TB
  * training-data lake uses (media bytes co-located with metadata,
  * decode deferred to batched executor-side functions).
  *
  * The container has no image/audio codecs, so the DECODE step is a
  * clearly-marked deterministic fake (`fakeDecode`) — but every
  * Spark-side piece is real and tested: the binary schema, the batched
  * mapPartitions execution shape (one "decoder init" per partition, the
  * same shape a JNI/codec binding needs), partitioning, and the typed
  * output row.
  */
object Multimodal {

  /** THE fake-decode frame-count rule (len % FramesMod + 1) — one
    * definition shared by the imperative decoder, the declarative
    * twin, and the frame sampler, so the three can never drift.
    */
  private val FramesMod = 16
  private def nFramesCol: Column = length(col("bytes")) % FramesMod + 1

  /** A media record: bytes + metadata. */
  final case class MediaRecord(media_id: Long, kind: String, bytes: Array[Byte])

  /** Decoded (fake) features. */
  final case class MediaFeatures(
    media_id: Long, kind: String, n_bytes: Long,
    width: Int, height: Int, n_frames: Int)

  /** Manufacture a media table from `documents`: the text bytes stand in
    * for encoded media (binary column, realistic sizes/skew).
    */
  def mediaTable(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(
        col("doc_id").as("media_id"),
        // deterministic modality assignment
        element_at(array(lit("image"), lit("audio"), lit("video")),
          (col("doc_id") % 3 + 1).cast("int")).as("kind"),
        encode(col("text"), "utf-8").as("bytes"))

  /** DETERMINISTIC FAKE DECODE — stands in for a real codec. A real
    * implementation would replace the body with a JNI/codec call; the
    * batching shape (iterator-in/iterator-out per partition, decoder
    * "session" initialized once per partition) is the real contract.
    */
  def fakeDecode(rec: MediaRecord): MediaFeatures = {
    val md5 = java.security.MessageDigest.getInstance("MD5")
      .digest(rec.bytes).map("%02x".format(_)).mkString
    val w = 1 + java.lang.Long.parseLong(md5.substring(0, 4), 16).toInt % 64
    val h = 1 + java.lang.Long.parseLong(md5.substring(4, 8), 16).toInt % 64
    MediaFeatures(rec.media_id, rec.kind, rec.bytes.length.toLong,
      w, h, 1 + (rec.bytes.length % FramesMod))
  }

  /** Payload-budget batch packing — the GPU-inference batching step: a
    * decode/embed service consumes media in batches bounded by BYTES
    * (device memory), not row count, so batches are packed by running
    * payload size. Per (modality) stream, records are laid out in
    * media_id order and assigned batch = floor(preceding_bytes /
    * budget) (preceding = cumulative − own) — the same deterministic
    * window-cumsum rule as p4's token packing
    * (Sampling.packSequences), applied to the binary column's length;
    * batch ids start at 0 and stay contiguous even for an oversized
    * first item. Per-modality windows partition the work: at
    * 100 TB each modality packs independently, and a batch id is
    * reproducible from the data alone (no scan order dependence).
    */
  def m4BatchPack(s: SparkSession, d: String,
                  budgetBytes: Long = 4096L): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("kind").orderBy("media_id")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    mediaTable(s, d)
      .select(col("media_id"), col("kind"),
        length(col("bytes")).cast("long").as("n_bytes"))
      .withColumn("cum_bytes", sum("n_bytes").over(w))
      // batch by PRECEDING bytes (cum − n) — the same rule as p4's
      // token packing: batch ids start at 0 and stay contiguous even
      // when a single item exceeds the budget (the old last-byte rule
      // skipped batch 0 for an oversized first item, so a consumer
      // iterating 0..max hit a hole)
      .withColumn("batch_id",
        expr(s"(cum_bytes - n_bytes) div $budgetBytes"))
      .groupBy("kind", "batch_id")
      .agg(
        count(lit(1)).as("n_items"),
        sum("n_bytes").as("batch_bytes"),
        min("media_id").as("first_id"),
        max("media_id").as("last_id"))
      .orderBy("kind", "batch_id")
  }

  /** Batched decode over partitions: the executor-side pattern for real
    * codecs (init once per partition, stream records through).
    */
  def decodeFeatures(media: DataFrame): DataFrame = {
    val s = media.sparkSession
    import s.implicits._
    media.as[MediaRecord].mapPartitions { it =>
      // real impl: initialize decoder/codec context HERE, once per task
      it.map(fakeDecode)
    }.toDF()
  }

  /** Frame sampling: emit one row per sampled frame (every `step`-th
    * frame of the fake-decoded frame count) — the explode-shaped
    * operator a video pipeline runs before per-frame feature
    * extraction. Real generator semantics (explode/sequence); only the
    * frame COUNT comes from the fake decode.
    */
  def sampleFrames(s: SparkSession, d: String, step: Int = 4,
                   maxMediaId: Long = 50L): DataFrame =
    mediaTable(s, d)
      .filter(col("media_id") < maxMediaId)
      .select(
        col("media_id"), col("kind"),
        explode(sequence(lit(0),
          nFramesCol - 1, lit(step))).as("frame_idx"))
      .orderBy("media_id", "frame_idx")

  /** Resized (fake) media metadata. */
  final case class ResizedMedia(
    media_id: Long, kind: String, width: Int, height: Int,
    new_width: Int, new_height: Int, n_bytes: Long, new_n_bytes: Long)

  /** DETERMINISTIC FAKE RESIZE — scale-to-fit a target×target box,
    * never upscaling. All arithmetic is integer-exact (w·target div
    * max(w,h,target)), so the spec is engine-portable; the byte count
    * scales by the integer area ratio. A real implementation replaces
    * the body with the scaler call; the contract (metadata in, scaled
    * metadata + bytes out) is what the pipeline schema depends on.
    */
  def fakeResize(f: MediaFeatures, target: Int = 32): ResizedMedia = {
    val den = math.max(math.max(f.width, f.height), target)
    val nw = math.max(1, f.width * target / den)
    val nh = math.max(1, f.height * target / den)
    ResizedMedia(f.media_id, f.kind, f.width, f.height, nw, nh, f.n_bytes,
      math.max(1L, f.n_bytes * (nw.toLong * nh) / (f.width.toLong * f.height)))
  }

  /** Batched resize over partitions — decode + resize fused in one
    * executor pass (one codec/scaler init per task, the same shape as
    * decodeFeatures; a real pipeline never materializes decoded frames
    * between the two steps).
    */
  def resizeMedia(media: DataFrame, target: Int = 32): DataFrame = {
    val s = media.sparkSession
    import s.implicits._
    media.as[MediaRecord].mapPartitions { it =>
      // real impl: initialize decoder + scaler HERE, once per task
      it.map(r => fakeResize(fakeDecode(r), target))
    }.toDF()
  }

  /** Declarative twin of decode+resize — the oracle-checkable query
    * (pure codegen'd expressions, integer-exact throughout) and the
    * cross-check for the mapPartitions path.
    */
  def resizeSpecSql(s: SparkSession, d: String, target: Int = 32): DataFrame =
    mediaFeaturesSql(s, d)
      .select(col("media_id"), col("kind"), col("width"), col("height"),
        col("n_bytes"))
      .withColumn("den",
        greatest(col("width"), col("height"), lit(target)))
      .withColumn("new_width",
        greatest(lit(1), expr(s"CAST(width AS BIGINT) * $target div den"))
          .cast("int"))
      .withColumn("new_height",
        greatest(lit(1), expr(s"CAST(height AS BIGINT) * $target div den"))
          .cast("int"))
      .withColumn("new_n_bytes",
        greatest(lit(1L),
          expr("n_bytes * (CAST(new_width AS BIGINT) * new_height) div " +
            "(CAST(width AS BIGINT) * height)")))
      .select("media_id", "kind", "width", "height", "new_width",
        "new_height", "n_bytes", "new_n_bytes")
      .orderBy("media_id")

  /** Declarative twin of the fake decode — same features computed as
    * pure Catalyst expressions over the binary column (codegen'd, no
    * JVM object churn); used as the oracle-checkable query and as the
    * cross-check for the mapPartitions path.
    */
  def mediaFeaturesSql(s: SparkSession, d: String): DataFrame =
    mediaTable(s, d)
      .select(
        col("media_id"), col("kind"),
        length(col("bytes")).cast("long").as("n_bytes"),
        (conv(substring(md5(col("bytes")), 1, 4), 16, 10).cast("long") % 64 + 1)
          .cast("int").as("width"),
        (conv(substring(md5(col("bytes")), 5, 4), 16, 10).cast("long") % 64 + 1)
          .cast("int").as("height"),
        nFramesCol.cast("int").as("n_frames"))
      .orderBy("media_id")
}
