package graft.pipeline

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** One decoded media row. Decode itself is STUBBED (no image/audio libs in
  * this container — see `FakeDecoder`); everything Spark-side (schema, typed
  * Dataset plumbing, per-partition batch shape, partitioning) is real.
  */
case class MediaMeta(
    doc_id: Long,
    byte_len: Long,
    format: String,
    width: Int,
    height: Int,
    n_frames: Int)

case class MediaRow(doc_id: Long, media: Array[Byte], meta_format: String)

/** Multimodal columns: image/audio/video as opaque `binary` columns with
  * typed metadata, processed per-partition (the Scala analog of
  * `mapInPandas` — one iterator pass per partition, batch-shaped, no
  * per-row scheduling overhead).
  *
  * At 100 TB the binary payloads dominate I/O: the design keeps them in
  * their own column (parquet stores them contiguously), prunes them out of
  * every query that only needs metadata, and partitions by doc id so a
  * decode stage is embarrassingly parallel with no shuffle.
  */
object Multimodal {

  /** STUB decoder — deterministic fake standing in for libjpeg/ffmpeg-style
    * decoding. Derives plausible metadata purely from the bytes so tests are
    * reproducible; swap this object for a real codec binding in production.
    */
  object FakeDecoder {
    def decode(bytes: Array[Byte], format: String): (Int, Int, Int) = {
      val n = bytes.length
      val head = bytes.take(8).map(_ & 0xff).sum
      val width = 16 + (n % 640)
      val height = 16 + (head % 480)
      val frames = format match {
        case "video" => 1 + (n % 120)
        case "audio" => 1 + (n % 48000)
        case _ => 1
      }
      (width, height, frames)
    }
  }

  /** Attach a binary media column (here synthesized from text — the test
    * tables carry no real blobs) plus a format tag. In production this is
    * the ingest schema itself.
    */
  def withMediaColumn(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(
      col(idCol).cast("long").as("doc_id"),
      encode(col(textCol), "UTF-8").as("media"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (col(idCol) % 3 + 1).cast("int")).as("meta_format"))

  /** Decode/feature-extract stage: per-partition iterator pass over the typed
    * Dataset (the `mapInPandas` batch shape), emitting typed metadata only —
    * the binary column is dropped as early as possible so downstream stages
    * never shuffle payload bytes.
    */
  def decodeMeta(media: Dataset[MediaRow]): Dataset[MediaMeta] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.map { row =>
        val (w, h, f) = FakeDecoder.decode(row.media, row.meta_format)
        MediaMeta(row.doc_id, row.media.length.toLong, row.meta_format, w, h, f)
      }
    }
  }

  /** Feature-extraction stage: media bytes → embedding vector, per-partition
    * (the shape of a real CLIP/MFCC encoder pass: model broadcast once, one
    * iterator sweep, no shuffle). The encoder itself is STUBBED with a
    * deterministic byte-histogram projection so the downstream contract —
    * (doc_id, array<float>) flowing into Similarity/Dedup ANN operators —
    * is real and testable without codec/model libs.
    */
  def extractEmbeddings(media: Dataset[MediaRow], dim: Int = 64): DataFrame = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.map { row =>
        val v = new Array[Float](dim)
        var i = 0
        while (i < row.media.length) {
          v(((row.media(i) & 0xff) * 31 + i) % dim) += 1.0f
          i += 1
        }
        val norm = math.sqrt(v.map(x => x.toDouble * x).sum).toFloat max 1e-6f
        (row.doc_id, v.map(_ / norm))
      }
    }.toDF("doc_id", "embedding")
  }

  /** Resize planner: aspect-preserving target dimensions inside a
    * maxW × maxH box, never upscaling. PURE INTEGER arithmetic (the binding
    * side is decided by cross-multiplication, the scaled side by integer
    * division) — no floats, so the plan is bit-identical on any engine and
    * any partitioning. This is the real pre-decode planning step of an image
    * pipeline: it runs on the O(rows) metadata frame and the binary payloads
    * are never touched, so at 100 TB it costs one metadata scan.
    */
  def resizePlan(meta: DataFrame, maxW: Int, maxH: Int): DataFrame = {
    val w = col("width").cast("long")
    val h = col("height").cast("long")
    val fits = w <= maxW && h <= maxH
    // width binds ⇔ w/h ≥ maxW/maxH ⇔ w·maxH ≥ h·maxW (exact, no division)
    val widthBinds = w * maxH >= h * maxW
    meta.select(
      col("doc_id"), col("width"), col("height"),
      when(fits, w)
        .when(widthBinds, lit(maxW.toLong))
        .otherwise(greatest(lit(1L), expr(s"(CAST(width AS BIGINT) * $maxH) div CAST(height AS BIGINT)")))
        .cast("int").as("out_w"),
      when(fits, h)
        .when(widthBinds, greatest(lit(1L), expr(s"(CAST(height AS BIGINT) * $maxW) div CAST(width AS BIGINT)")))
        .otherwise(lit(maxH.toLong))
        .cast("int").as("out_h"))
  }

  /** Frame-sample stub for video rows: deterministic frame indices (every
    * `stride`-th frame), the partition-parallel shape of real frame
    * extraction.
    */
  def sampleFrameIndices(meta: Dataset[MediaMeta], stride: Int): DataFrame = {
    val df = meta.toDF()
    df.filter(col("format") === "video")
      .select(col("doc_id"), col("n_frames"),
        sequence(lit(0), col("n_frames") - 1, lit(stride)).as("frame_idx"))
  }
}
