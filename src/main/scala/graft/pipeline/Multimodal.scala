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

/** One really-decoded image row: dimensions plus per-channel pixel sums,
  * all derived from the decoded pixel data (not from the byte stream).
  */
case class ImageStats(
    doc_id: Long,
    width: Int,
    height: Int,
    n_px: Long,
    r_sum: Long,
    g_sum: Long,
    b_sum: Long)

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

  // ImageIO writes a disk cache file per encode/decode by default; decode
  // runs inside executor tasks, so keep it purely in-memory.
  javax.imageio.ImageIO.setUseCache(false)

  /** Deterministic synthetic PNG keyed on the doc id — REAL image bytes
    * (JDK `javax.imageio`, no external codec lib) with a pixel pattern whose
    * channel sums have closed forms, so a SQL oracle can pin stats computed
    * from the actual decoded pixels:
    *   a = id mod 256, w = 16 + id mod 17, h = 16 + (id*7) mod 13
    *   r(x,y) = (a+x) mod 256,  g = 255 − r,  b(x,y) = (a+y) mod 256
    * With w,h ≤ 32 the (a+·) sequence wraps past 256 at most once, so
    *   Σr = h·(w·a + w(w−1)/2 − 256·max(0, a+w−256)),  Σg = 255·w·h − Σr,
    *   Σb = w·(h·a + h(h−1)/2 − 256·max(0, a+h−256)).
    */
  def synthesizePng(docId: Long): Array[Byte] = {
    val a = (docId % 256).toInt
    val w = (16 + docId % 17).toInt
    val h = (16 + (docId * 7) % 13).toInt
    val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      val b = (a + y) % 256
      var x = 0
      while (x < w) {
        val r = (a + x) % 256
        img.setRGB(x, y, (r << 16) | ((255 - r) << 8) | b)
        x += 1
      }
      y += 1
    }
    val out = new java.io.ByteArrayOutputStream(1024)
    javax.imageio.ImageIO.write(img, "png", out)
    out.toByteArray
  }

  /** REAL image decode: `ImageIO.read` over the binary column, per-partition
    * (model-broadcast batch shape — one iterator sweep, no shuffle, binary
    * payload dropped as soon as the stats are extracted). PNG/BMP/GIF decode
    * ships with the JDK; bytes no reader recognizes fall back to the
    * deterministic [[FakeDecoder]] so the stage is total. At 100 TB decode is
    * embarrassingly parallel: cost scales with payload bytes per partition
    * and the output is O(rows) of fixed-width stats.
    */
  def decodeImage(media: Dataset[MediaRow]): Dataset[ImageStats] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.map { row =>
        val img =
          try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(row.media))
          catch { case _: java.io.IOException => null }
        if (img != null) {
          val w = img.getWidth
          val h = img.getHeight
          var rs = 0L; var gs = 0L; var bs = 0L
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              val rgb = img.getRGB(x, y)
              rs += (rgb >> 16) & 0xff
              gs += (rgb >> 8) & 0xff
              bs += rgb & 0xff
              x += 1
            }
            y += 1
          }
          ImageStats(row.doc_id, w, h, w.toLong * h, rs, gs, bs)
        } else {
          // non-image payload: deterministic stub keeps the stage total
          val (w, h, _) = FakeDecoder.decode(row.media, row.meta_format)
          ImageStats(row.doc_id, w, h, w.toLong * h, -1L, -1L, -1L)
        }
      }
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
