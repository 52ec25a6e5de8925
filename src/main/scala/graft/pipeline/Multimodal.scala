package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
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

/** One really-decoded audio row: format facts from the container header plus
  * sample statistics computed from the decoded PCM frames themselves.
  */
case class AudioStats(
    doc_id: Long,
    sample_rate: Int,
    n_samples: Long,
    sum_samples: Long,
    peak_abs: Int,
    duration_us: Long)

/** One fixed-width analysis frame of really-decoded audio: per-frame sample
  * aggregates from the decoded PCM (see [[Multimodal.decodeAudioFrames]]).
  */
case class AudioFrame(
    doc_id: Long,
    frame_idx: Int,
    n_samples: Long,
    sum_samples: Long,
    peak_abs: Int)

/** One really-decoded video frame: per-frame pixel channel sums from the
  * decoded raster (see [[Multimodal.decodeVideoFrames]]).
  */
case class FrameStats(
    doc_id: Long,
    frame_idx: Int,
    width: Int,
    height: Int,
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
    gradientPng(a, w, h)
  }

  /** Deterministic synthetic JPEG keyed on the doc id — the same gradient
    * raster as [[synthesizePng]] but LOSSY-encoded via the JDK's built-in
    * JPEG writer. Dimensions survive the round trip exactly (pinned by the
    * mm_decode_jpeg oracle's closed forms); channel sums do NOT (DCT
    * quantization), so they are pinned at spec level against a checked-in
    * byte fixture instead — PipelineSpec demonstrates the JDK decoder is
    * bit-stable on this platform, the round-8 verdict's precondition for
    * treating JDK JPEG as a real (non-stub) codec path.
    */
  def synthesizeJpeg(docId: Long): Array[Byte] = {
    val a = (docId % 256).toInt
    val w = (16 + docId % 17).toInt
    val h = (16 + (docId * 7) % 13).toInt
    val out = new java.io.ByteArrayOutputStream(1024)
    javax.imageio.ImageIO.write(gradientRaster(a, w, h), "jpg", out)
    out.toByteArray
  }

  /** The shared gradient raster (see [[synthesizePng]] for its closed-form
    * channel sums), encoded as a real PNG via JDK ImageIO.
    */
  private def gradientPng(a: Int, w: Int, h: Int): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(1024)
    javax.imageio.ImageIO.write(gradientRaster(a, w, h), "png", out)
    out.toByteArray
  }

  private def gradientRaster(a: Int, w: Int, h: Int): java.awt.image.BufferedImage = {
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
    img
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

  /** 64-bit perceptual average-hash over REAL decoded pixels: the raster is
    * mean-pooled onto an 8×8 grid (cell (cy,cx) covers
    * y ∈ [⌊cy·h/8⌋, ⌊(cy+1)·h/8⌋) × the analogous x range — i.e. pixel
    * (x,y) lands in cell (y·8 div h, x·8 div w)), and bit cy·8+cx is set
    * iff the cell's luminance exceeds the image's mean luminance. Luminance
    * is the integer proxy 2r+b and the mean test is cross-multiplied
    * (cell_sum · n_px > total_sum · cell_px), so the hash is an EXACT
    * integer function of the pixels — replayable by any engine, no float
    * rounding. Undecodable payloads hash to 0 with decoded=false.
    * Embarrassingly parallel; O(rows) × 8 bytes out.
    */
  /** The 8×8 average-hash of a decoded raster — the shared core of
    * [[averageHash]] and [[videoFrameHashes]].
    */
  private def ahashOf(img: java.awt.image.BufferedImage): Long = {
    val w = img.getWidth
    val h = img.getHeight
    val cellSum = Array.ofDim[Long](8, 8)
    val cellPx = Array.ofDim[Long](8, 8)
    var total = 0L
    var y = 0
    while (y < h) {
      val cy = y * 8 / h
      var x = 0
      while (x < w) {
        val rgb = img.getRGB(x, y)
        val lum = 2L * ((rgb >> 16) & 0xff) + (rgb & 0xff)
        val cx = x * 8 / w
        cellSum(cy)(cx) += lum
        cellPx(cy)(cx) += 1
        total += lum
        x += 1
      }
      y += 1
    }
    val nPx = w.toLong * h
    var hash = 0L
    var cy = 0
    while (cy < 8) {
      var cx = 0
      while (cx < 8) {
        if (cellSum(cy)(cx) * nPx > total * cellPx(cy)(cx))
          hash |= 1L << (cy * 8 + cx)
        cx += 1
      }
      cy += 1
    }
    hash
  }

  def averageHash(media: Dataset[MediaRow]): DataFrame = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.map { row =>
        val img =
          try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(row.media))
          catch { case _: java.io.IOException => null }
        if (img == null) (row.doc_id, 0L, false)
        else (row.doc_id, ahashOf(img), true)
      }
    }.toDF("doc_id", "ahash", "decoded")
  }

  /** Per-frame perceptual hashes of a video container — the frame-level
    * near-dup/scene-change primitive: every stride-th frame is REALLY
    * decoded (others skipped in O(1) via the length prefix) and reduced to
    * its 8 bytes of [[ahashOf]] fingerprint. Corrupt containers emit the
    * (-1, 0) sentinel row, keeping the stage total.
    */
  def videoFrameHashes(media: Dataset[MediaRow], stride: Int): DataFrame = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.flatMap { row =>
        try {
          val bb = java.nio.ByteBuffer.wrap(row.media)
            .order(java.nio.ByteOrder.LITTLE_ENDIAN)
          if (row.media.length < 8) throw new java.io.IOException("short")
          val m = new Array[Byte](4); bb.get(m)
          if (new String(m, "US-ASCII") != "GFV1")
            throw new java.io.IOException("bad magic")
          val nFrames = bb.getInt
          val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Int, Long)]
          var f = 0
          while (f < nFrames) {
            val len = bb.getInt
            if (f % stride != 0) {
              bb.position(bb.position() + len)
            } else {
              val frame = new Array[Byte](len)
              bb.get(frame)
              val img = javax.imageio.ImageIO.read(
                new java.io.ByteArrayInputStream(frame))
              if (img == null) throw new java.io.IOException("undecodable frame")
              out += ((row.doc_id, f, ahashOf(img)))
            }
            f += 1
          }
          out.iterator
        } catch {
          case _: java.io.IOException | _: RuntimeException =>
            Iterator.single((row.doc_id, -1, 0L))
        }
      }
    }.toDF("doc_id", "frame_idx", "ahash")
  }

  /** Deterministic synthetic WAV keyed on the doc id — REAL audio bytes:
    * a canonical 44-byte RIFF/PCM header (mono, 8 kHz, 16-bit LE) followed
    * by a sample ramp whose statistics have closed forms:
    *   a = id mod 256,  n = 64 + id mod 97,  s(i) = ((a+i) mod 256 − 128)·256
    * With n ≤ 160 the (a+i) sequence wraps past 256 at most once, so with
    *   S8 = n·a + n(n−1)/2 − 256·max(0, a+n−256)
    *   max8 = (a+n−1 ≥ 256) ? 255 : a+n−1,  min8 = (a+n−1 ≥ 256) ? 0 : a
    * the decoded stats are Σs = 256·(S8 − 128n) and
    * peak = 256·max(|max8−128|, |min8−128|) — a SQL oracle can pin the
    * encode→decode round trip without ever parsing a WAV.
    */
  def synthesizeWav(docId: Long): Array[Byte] = {
    val a = (docId % 256).toInt
    val n = (64 + docId % 97).toInt
    val dataSize = n * 2
    val bb = java.nio.ByteBuffer.allocate(44 + dataSize)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataSize)
      .put("WAVE".getBytes("US-ASCII"))
    bb.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(1) // PCM, mono
      .putInt(8000).putInt(16000) // sample rate, byte rate
      .putShort(2).putShort(16) // block align, bits per sample
    bb.put("data".getBytes("US-ASCII")).putInt(dataSize)
    var i = 0
    while (i < n) {
      bb.putShort(((((a + i) % 256) - 128) * 256).toShort)
      i += 1
    }
    bb.array()
  }

  /** REAL audio decode: `javax.sound.sampled.AudioSystem` (the JDK's own
    * WAV/AIFF/AU codec — no external lib) parses the container and hands
    * back PCM frames; the stats are computed from the decoded samples, not
    * the byte stream. Per-partition iterator pass, payload dropped once the
    * O(1) stats are out — at 100 TB the stage is embarrassingly parallel
    * and its output is O(rows). Bytes no reader recognizes fall back to the
    * deterministic [[FakeDecoder]] (sentinel −1 stats) so the stage is total.
    */
  def decodeAudio(media: Dataset[MediaRow]): Dataset[AudioStats] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.map { row =>
        try {
          val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
            new java.io.ByteArrayInputStream(row.media))
          val fmt = ais.getFormat
          val pcm = ais.readAllBytes()
          val bb = java.nio.ByteBuffer.wrap(pcm).order(
            if (fmt.isBigEndian) java.nio.ByteOrder.BIG_ENDIAN
            else java.nio.ByteOrder.LITTLE_ENDIAN)
          var sum = 0L
          var peak = 0
          var cnt = 0L
          while (bb.remaining() >= 2) {
            val s = bb.getShort.toInt
            sum += s
            if (math.abs(s) > peak) peak = math.abs(s)
            cnt += 1
          }
          val rate = fmt.getSampleRate.toInt
          val framesPerChannel = cnt / fmt.getChannels
          AudioStats(row.doc_id, rate, cnt, sum, peak,
            framesPerChannel * 1000000L / rate)
        } catch {
          // RuntimeException too: a corrupt-but-RIFF-tagged header can
          // surface as e.g. NegativeArraySizeException from the JDK parser
          case _: javax.sound.sampled.UnsupportedAudioFileException |
              _: java.io.IOException | _: RuntimeException =>
            val (_, _, f) = FakeDecoder.decode(row.media, row.meta_format)
            AudioStats(row.doc_id, -1, f.toLong, -1L, -1, -1L)
        }
      }
    }
  }

  /** Windowed audio analysis over REALLY-decoded PCM: the stream is cut
    * into fixed `frameLen`-sample frames (the short-time windowing under
    * every spectral/energy front-end — MFCC, VAD, loudness), each frame
    * aggregated to count/sum/peak. One decode, one pass, O(frames) output
    * rows per doc; the last frame may be short. Unrecognized bytes fall
    * back to one sentinel row (frame_idx −1) so the stage is total.
    */
  def decodeAudioFrames(media: Dataset[MediaRow], frameLen: Int): Dataset[AudioFrame] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.flatMap { row =>
        try {
          val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
            new java.io.ByteArrayInputStream(row.media))
          val fmt = ais.getFormat
          val pcm = ais.readAllBytes()
          val bb = java.nio.ByteBuffer.wrap(pcm).order(
            if (fmt.isBigEndian) java.nio.ByteOrder.BIG_ENDIAN
            else java.nio.ByteOrder.LITTLE_ENDIAN)
          val out = scala.collection.mutable.ArrayBuffer.empty[AudioFrame]
          var j = 0
          var cnt = 0L
          var sum = 0L
          var peak = 0
          while (bb.remaining() >= 2) {
            val s = bb.getShort.toInt
            sum += s
            if (math.abs(s) > peak) peak = math.abs(s)
            cnt += 1
            if (cnt == frameLen) {
              out += AudioFrame(row.doc_id, j, cnt, sum, peak)
              j += 1; cnt = 0L; sum = 0L; peak = 0
            }
          }
          if (cnt > 0) out += AudioFrame(row.doc_id, j, cnt, sum, peak)
          out.iterator
        } catch {
          case _: javax.sound.sampled.UnsupportedAudioFileException |
              _: java.io.IOException | _: RuntimeException =>
            Iterator.single(AudioFrame(row.doc_id, -1, -1L, -1L, -1))
        }
      }
    }
  }

  /** Deterministic synthetic video keyed on the doc id: a length-prefixed
    * container ("GFV1" magic, LE frame count, then [LE byte-length | REAL
    * PNG bytes] per frame) holding 3 + id mod 5 frames; frame f is the
    * [[synthesizePng]] gradient with phase a_f = (id + 11·f) mod 256 at the
    * doc's fixed w×h. Length prefixes are the point: a strided reader seeks
    * past unsampled frames in O(1) without decoding them — the property
    * real containers (MP4 stbl, MKV Cues) provide with index boxes.
    */
  def synthesizeVideo(docId: Long): Array[Byte] = {
    val w = (16 + docId % 17).toInt
    val h = (16 + (docId * 7) % 13).toInt
    val nFrames = (3 + docId % 5).toInt
    val frames = (0 until nFrames).map { f =>
      gradientPng(((docId + 11L * f) % 256).toInt, w, h)
    }
    val bb = java.nio.ByteBuffer
      .allocate(8 + frames.map(_.length + 4).sum)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("GFV1".getBytes("US-ASCII")).putInt(nFrames)
    frames.foreach { fr => bb.putInt(fr.length).put(fr) }
    bb.array()
  }

  /** REAL strided frame decode over the video container: every `stride`-th
    * frame is ImageIO-decoded to per-channel pixel sums; frames between
    * sample points are SKIPPED via their length prefix — decode cost is
    * O(sampled frames), not O(frames), which is the whole economics of
    * frame sampling at 100 TB. Rows that don't carry the container magic
    * fall back to one deterministic [[FakeDecoder]] sentinel row.
    */
  def decodeVideoFrames(media: Dataset[MediaRow], stride: Int): Dataset[FrameStats] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.flatMap { row =>
        // parse EAGERLY inside the guard: a well-magicked but corrupt
        // container (truncated frame, unreadable image) must fall back to
        // the sentinel row, not throw from a lazily-consumed iterator
        // downstream of this try
        try {
          val bb = java.nio.ByteBuffer.wrap(row.media)
            .order(java.nio.ByteOrder.LITTLE_ENDIAN)
          if (row.media.length < 8) throw new java.io.IOException("short")
          val m = new Array[Byte](4); bb.get(m)
          if (new String(m, "US-ASCII") != "GFV1")
            throw new java.io.IOException("bad magic")
          val nFrames = bb.getInt
          val out = scala.collection.mutable.ArrayBuffer.empty[FrameStats]
          var f = 0
          while (f < nFrames) {
            val len = bb.getInt
            if (f % stride != 0) {
              bb.position(bb.position() + len) // O(1) skip, no decode
            } else {
              val frame = new Array[Byte](len)
              bb.get(frame)
              val img = javax.imageio.ImageIO.read(
                new java.io.ByteArrayInputStream(frame))
              if (img == null) throw new java.io.IOException("undecodable frame")
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
              out += FrameStats(row.doc_id, f, w, h, rs, gs, bs)
            }
            f += 1
          }
          out.iterator
        } catch {
          case _: java.io.IOException | _: RuntimeException =>
            val (w, h, _) = FakeDecoder.decode(row.media, row.meta_format)
            Iterator.single(FrameStats(row.doc_id, -1, w, h, -1L, -1L, -1L))
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

  // ── persisted perceptual-hash index ────────────────────────────────────
  //
  // The media pipeline's maintained dedup state: (doc_id, ahash) at 8
  // bytes/doc, amortizing the DECODE stage — the expensive pass the index
  // exists so nothing ever repeats. It rides the shared
  // [[graft.store.VersionedDocTable]] backbone (the single-table form of
  // the engine-wide VersionedDir CAS): a crash mid-mutation leaves the
  // committed version byte-identical (losing this index means re-decoding
  // the corpus — at 100 TB of media, the worst re-run in the engine),
  // racing appends rerun instead of losing updates, deletes are O(batch)
  // tombstones applied at read, and the maintenance triple folds drift on
  // the operator's schedule. Layout under the root: `hashes/` (doc_id,
  // ahash) plus an optional `deletes/` tombstone table, one claim.

  private val PhashTable = "hashes"

  /** Build the index: decode every payload once, persist the 8-byte/doc
    * fingerprints as a fresh committed version.
    */
  def buildPhashIndex(media: Dataset[MediaRow], path: String): Unit =
    graft.store.VersionedDocTable.build(
      averageHash(media).select("doc_id", "ahash"), path, PhashTable)

  /** O(batch) incremental maintenance: decode ONLY the new payloads and
    * commit their hashes beside the hardlink-adopted prior table — the old
    * corpus is never re-decoded. Doc ids must be new (the
    * keep-one-copy-of-every-row contract all persisted indexes share).
    */
  def appendToPhashIndex(batch: Dataset[MediaRow], path: String): Unit =
    graft.store.VersionedDocTable.append(
      averageHash(batch).select("doc_id", "ahash"), path, PhashTable)

  /** O(batch) DELETION maintenance: tombstones only — no payload is ever
    * re-decoded and the hash table is never rewritten; [[readPhashIndex]]
    * applies the tombstones as one anti-join and [[compactPhashIndex]]
    * folds them on the operator's schedule.
    */
  def deleteFromPhashIndex(deletedDocs: DataFrame, id: Column,
      path: String): Unit =
    graft.store.VersionedDocTable.delete(deletedDocs, id, path, PhashTable)

  /** Read the committed index: (doc_id, ahash) of the SURVIVORS — one
    * consistent snapshot, tombstones applied as a single anti-join.
    */
  def readPhashIndex(spark: SparkSession, path: String): DataFrame =
    graft.store.VersionedDocTable.read(spark, path, PhashTable)

  /** Operational snapshot — O(files) footer/dir metadata, no Spark job;
    * see [[graft.store.VersionedDocTable.stats]].
    */
  final case class PhashStats(docCount: Long, tombstoneCount: Long,
      hashFiles: Int, deleteFiles: Int, version: Long) {
    def deletedFraction: Double =
      if (docCount <= 0) 0.0 else tombstoneCount.toDouble / docCount
  }

  def phashStats(spark: SparkSession, path: String): PhashStats = {
    val s = graft.store.VersionedDocTable.stats(spark, path, PhashTable)
    PhashStats(s.rowCount, s.tombstoneCount, s.dataFiles, s.deleteFiles,
      s.version)
  }

  /** Rewrite the index minus its tombstones, coalesced back to
    * `targetFiles` parts — a rebuild over the survivors WITHOUT decoding
    * anything (16 bytes/row; raise `targetFiles` past ~10⁹ docs).
    */
  def compactPhashIndex(spark: SparkSession, path: String, outPath: String,
      targetFiles: Int = 8): Unit =
    graft.store.VersionedDocTable.compact(spark, path, outPath, PhashTable,
      targetFiles)

  /** The maintenance policy (deleted-fraction / file-count gates, enforced
    * converging knobs — see [[graft.store.VersionedDocTable.maintainIfNeeded]]):
    * no-op on a healthy index, so call it unconditionally after ingest.
    */
  def phashMaintainIfNeeded(spark: SparkSession, path: String,
      outPath: String = null, maxDeletedFraction: Double = 0.2,
      maxHashFiles: Int = 64, targetFiles: Int = 8): Boolean =
    graft.store.VersionedDocTable.maintainIfNeeded(spark, path, PhashTable,
      outPath, maxDeletedFraction, maxHashFiles, targetFiles, rowsPerKey = 1)
}
