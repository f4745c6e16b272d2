package graft.llm

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing for training-data pipelines: media travels
  * as opaque `binary` columns with typed metadata; decode / feature
  * extraction runs as a per-partition batch map (the Scala analogue of
  * `mapInPandas` — one JVM-side batch loop per partition, vectorizable).
  *
  * The IMAGE path is real: payloads carrying a PNG/JPEG/GIF/BMP magic are
  * decoded with the JDK's `javax.imageio`, features come from actual
  * pixels, and resize rescales + re-encodes. The AUDIO path is real for
  * RIFF/WAVE payloads: `javax.sound.sampled` decodes PCM frames, features
  * come from the actual waveform, and [[resampleAudio]] linearly resamples
  * and re-encodes a real WAV. Video codecs are NOT available in this
  * container, so video payloads (and non-WAV audio) fall through to a
  * deterministic fake (content-derived); everything around the kernel —
  * schema, batching, partition sizing, output shape — is identical for
  * both paths, so swapping in a real video codec is a one-function change.
  */
object Multimodal {

  // executor-side: never spill ImageIO's read buffer to temp files
  javax.imageio.ImageIO.setUseCache(false)

  /** Cheap magic-byte sniff deciding whether a payload enters the real
    * image decoder: PNG / JPEG / GIF / BMP — the formats the JDK's
    * imageio ships readers for. Everything else (audio, video, digest
    * fakes) takes the deterministic stub path. */
  private[llm] def looksLikeImage(b: Array[Byte]): Boolean =
    b != null && b.length >= 4 && (
      (b(0) == 0x89.toByte && b(1) == 'P' && b(2) == 'N' && b(3) == 'G') ||
      (b(0) == 0xff.toByte && b(1) == 0xd8.toByte && b(2) == 0xff.toByte) ||
      (b(0) == 'G' && b(1) == 'I' && b(2) == 'F') ||
      (b(0) == 'B' && b(1) == 'M'))

  /** Real image decode via the JDK codec. None = the payload claims an
    * image magic but does not parse (truncated/corrupt) — a real decode
    * FAILURE, surfaced as decode_ok=false downstream. */
  private[llm] def decodeImage(content: Array[Byte]): Option[java.awt.image.BufferedImage] =
    try Option(javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(content)))
    catch {
      // JDK readers throw RuntimeExceptions (IllegalArgument, AIOOBE,
      // NegativeArraySize...) on malformed headers, not just IOException;
      // any parse failure is decode_ok=false, never a job abort — a
      // web-corpus pipeline meets malformed media routinely
      case scala.util.control.NonFatal(_) => None
    }

  /** RIFF/WAVE magic sniff — the container format the JDK ships a real
    * decoder for (`javax.sound.sampled`). */
  private[llm] def looksLikeWav(b: Array[Byte]): Boolean =
    b != null && b.length >= 12 &&
      b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F' &&
      b(8) == 'W' && b(9) == 'A' && b(10) == 'V' && b(11) == 'E'

  /** Decoded waveform: samples downmixed to mono in [-1, 1] plus source
    * format facts. */
  private[graft] final case class Waveform(
      samples: Array[Float], sampleRate: Float, channels: Int)

  /** Real audio decode via the JDK codec: any encoding the JDK can convert
    * to 16-bit signed PCM (PCM, A-law, mu-law, float WAV). None = the
    * payload claims a WAV magic but does not parse — a real decode
    * FAILURE, surfaced as decode_ok=false downstream. */
  private[graft] def decodeAudio(content: Array[Byte]): Option[Waveform] =
    try {
      val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(content))
      try {
        val src = in.getFormat
        val ch = src.getChannels
        val target = new javax.sound.sampled.AudioFormat(
          javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED,
          src.getSampleRate, 16, ch, ch * 2, src.getSampleRate, false)
        val pcm = javax.sound.sampled.AudioSystem.getAudioInputStream(target, in)
        val bytes = pcm.readAllBytes()
        val nFrames = bytes.length / (2 * ch)
        if (nFrames == 0) None
        else {
          val mono = new Array[Float](nFrames)
          var f = 0
          while (f < nFrames) {
            var s = 0.0f
            var c = 0
            while (c < ch) {
              val i = (f * ch + c) * 2
              // little-endian 16-bit signed
              s += ((bytes(i) & 0xff) | (bytes(i + 1) << 8)).toShort / 32768.0f
              c += 1
            }
            mono(f) = s / ch
            f += 1
          }
          Some(Waveform(mono, src.getSampleRate, ch))
        }
      } finally in.close()
    } catch {
      // same contract as decodeImage: hostile/truncated media is a clean
      // per-row failure, never a job abort
      case scala.util.control.NonFatal(_) => None
    }

  /** ISO-BMFF (MP4/MOV) sniff: box 0 is `ftyp`. The container STRUCTURE
    * is parseable without any codec — boxes are length-prefixed — so
    * video metadata (duration, dimensions, track count) can be probed for
    * real even though frame decode needs codecs this container lacks. */
  private[llm] def looksLikeMp4(b: Array[Byte]): Boolean =
    b != null && b.length >= 12 &&
      b(4) == 'f' && b(5) == 't' && b(6) == 'y' && b(7) == 'p'

  /** Container facts probed from real MP4 box structure. */
  private[graft] final case class VideoInfo(
      durationMs: Long, width: Int, height: Int, tracks: Int, brand: String)

  private def be32(b: Array[Byte], o: Int): Long =
    ((b(o) & 0xffL) << 24) | ((b(o + 1) & 0xffL) << 16) |
      ((b(o + 2) & 0xffL) << 8) | (b(o + 3) & 0xffL)

  private def be64(b: Array[Byte], o: Int): Long =
    (be32(b, o) << 32) | be32(b, o + 4)

  private def boxType(b: Array[Byte], o: Int): String =
    new String(b, o + 4, 4, "ISO-8859-1")

  /** Walk the sibling boxes in [from, to), invoking f(start, end, type)
    * per box. Malformed sizes terminate the walk (caller treats a missing
    * required box as a probe failure). */
  private def walkBoxes(b: Array[Byte], from: Int, to: Int)(
      f: (Int, Int, String) => Unit): Unit = {
    var off = from
    var continue = true
    while (continue && off + 8 <= to) {
      var size = be32(b, off)
      var hdr = 8L
      if (size == 1 && off + 16 <= to) { size = be64(b, off + 8); hdr = 16 }
      else if (size == 0) size = (to - off).toLong // box extends to end
      if (size < hdr || off + size > to) continue = false
      else {
        f(off, off + size.toInt, boxType(b, off))
        off += size.toInt
      }
    }
  }

  /** Real MP4/ISO-BMFF container probe: `moov/mvhd` gives timescale +
    * duration, `moov/trak/tkhd` gives track dimensions (16.16 fixed
    * point; audio tracks carry 0x0). None = the payload claims an ftyp
    * magic but the moov structure does not parse — a real probe FAILURE,
    * surfaced as probe_ok=false downstream. */
  private[graft] def probeVideo(content: Array[Byte]): Option[VideoInfo] =
    try {
      val b = content
      val brand = new String(b, 8, 4, "ISO-8859-1")
      var durMs = -1L
      var w = 0; var h = 0; var tracks = 0
      walkBoxes(b, 0, b.length) { (s0, e0, t0) =>
        if (t0 == "moov") walkBoxes(b, s0 + 8, e0) { (s1, e1, t1) =>
          if (t1 == "mvhd") {
            val v = b(s1 + 8) & 0xff
            val (scale, dur) =
              if (v == 1) (be32(b, s1 + 28), be64(b, s1 + 32))
              else (be32(b, s1 + 20), be32(b, s1 + 24))
            if (scale > 0) durMs = dur * 1000 / scale
          } else if (t1 == "trak") {
            tracks += 1
            walkBoxes(b, s1 + 8, e1) { (s2, _, t2) =>
              if (t2 == "tkhd") {
                val v = b(s2 + 8) & 0xff
                val wOff = if (v == 1) s2 + 96 else s2 + 84
                val tw = (be32(b, wOff) >> 16).toInt
                val th = (be32(b, wOff + 4) >> 16).toInt
                if (tw > w) w = tw
                if (th > h) h = th
              }
            }
          }
        }
      }
      if (durMs < 0) None // no parseable moov/mvhd: not a probe-able MP4
      else Some(VideoInfo(durMs, w, h, tracks, brand))
    } catch { case scala.util.control.NonFatal(_) => None }

  /** Typed media row: the canonical wide-table layout. Partition by
    * (modality, shard) at scale so decode stages are pruned per modality;
    * keep blobs under the parquet row-group target (~128 MB). */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("modality", StringType, nullable = false), // image|audio|video
    StructField("content", BinaryType),                    // opaque payload
    StructField("mime", StringType),
    StructField("width", IntegerType),                     // image/video
    StructField("height", IntegerType),
    StructField("duration_ms", LongType),                  // audio/video
    StructField("caption", StringType)))

  /** The one mediaSchema projection both fake-corpus builders share:
    * id-derived modality/dims/duration, sha256-digest-bytes content
    * (a fixed 64-byte payload, bit-reproducible in SQL). */
  private def mediaProjection(df: DataFrame, id: org.apache.spark.sql.Column,
                              hashSrc: org.apache.spark.sql.Column,
                              caption: org.apache.spark.sql.Column): DataFrame =
    df.select(
      id.as("media_id"),
      element_at(typedLit(Seq("image", "audio", "video")),
        (id % 3 + 1).cast("int")).as("modality"),
      sha2(hashSrc, 256).cast("binary").as("content"),
      lit("application/octet-stream").as("mime"),
      (id % 640 + 32).cast("int").as("width"),
      (id % 480 + 32).cast("int").as("height"),
      (id % 30000 + 1000).as("duration_ms"),
      caption.as("caption"))

  /** Deterministic fake corpus: blob bytes derived from media_id so tests
    * are reproducible without real media files. */
  def syntheticMedia(spark: SparkSession, n: Int): DataFrame =
    mediaProjection(spark.range(n.toLong).toDF(), col("id"),
      col("id").cast("string"), concat(lit("caption "), col("id")))

  /** Media table derived from the documents corpus: a data-driven variant
    * of [[syntheticMedia]] for oracle-gated tests. Content is the UTF-8
    * bytes of the text's sha256 hex digest, so the deterministic
    * decode/resize kernels round-trip exactly through a DuckDB oracle. */
  def fromDocuments(docs: DataFrame): DataFrame =
    mediaProjection(docs, col("doc_id"), col("text"), col("text"))

  val featureSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("modality", StringType),
    StructField("feature", ArrayType(FloatType)),  // embedding-shaped
    StructField("decode_ok", BooleanType)))

  /** Decode kernel. Image payloads (magic-sniffed) decode for REAL via
    * the JDK codec and the 8-dim feature comes from actual pixels:
    * `[meanR, meanG, meanB, meanLuma, stdLuma, aspect, log2 w, log2 h]`
    * (channel means in [0,1], Rec.601 luma, aspect = w/h). WAV payloads
    * decode for REAL via `javax.sound.sampled` and the feature comes from
    * the actual waveform: `[durationSec, log2 sampleRate, channels,
    * meanAbs, rms, peak, zeroCrossRate, log2 frames]`. A payload claiming
    * an image/WAV magic that fails to parse is a decode FAILURE
    * (None -> decode_ok=false). Everything else (video — no codec in this
    * container — and digest fakes) takes the deterministic
    * byte-projection stub, same shape. */
  private[llm] def decodeKernel(content: Array[Byte]): Option[Array[Float]] = {
    if (content == null || content.isEmpty) None
    else if (looksLikeImage(content)) decodeImage(content).map(imageFeature)
    else if (looksLikeWav(content)) decodeAudio(content).map(audioFeature)
    else {
      val out = new Array[Float](8)
      var i = 0
      while (i < content.length) {
        out(i % 8) += (content(i) & 0xff) / 255.0f
        i += 1
      }
      val n = math.max(1, content.length / 8)
      Some(out.map(_ / n))
    }
  }

  private def imageFeature(img: java.awt.image.BufferedImage): Array[Float] = {
    val w = img.getWidth; val h = img.getHeight
    var r = 0.0; var g = 0.0; var b = 0.0; var l = 0.0; var l2 = 0.0
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val p = img.getRGB(x, y)
        val pr = ((p >> 16) & 0xff) / 255.0
        val pg = ((p >> 8) & 0xff) / 255.0
        val pb = (p & 0xff) / 255.0
        val pl = 0.299 * pr + 0.587 * pg + 0.114 * pb
        r += pr; g += pg; b += pb; l += pl; l2 += pl * pl
        x += 1
      }
      y += 1
    }
    val n = (w * h).toDouble
    val meanL = l / n
    Array(
      (r / n).toFloat, (g / n).toFloat, (b / n).toFloat, meanL.toFloat,
      math.sqrt(math.max(0.0, l2 / n - meanL * meanL)).toFloat,
      (w.toDouble / h).toFloat,
      (math.log(w.toDouble) / math.log(2)).toFloat,
      (math.log(h.toDouble) / math.log(2)).toFloat)
  }

  private def audioFeature(wf: Waveform): Array[Float] = {
    val n = wf.samples.length
    var sumAbs = 0.0; var sum2 = 0.0; var peak = 0.0; var zc = 0
    var i = 0
    while (i < n) {
      val v = wf.samples(i).toDouble
      val a = math.abs(v)
      sumAbs += a; sum2 += v * v
      if (a > peak) peak = a
      if (i > 0 && (v > 0) != (wf.samples(i - 1) > 0)) zc += 1
      i += 1
    }
    Array(
      (n / wf.sampleRate.toDouble).toFloat,
      (math.log(wf.sampleRate.toDouble) / math.log(2)).toFloat,
      wf.channels.toFloat,
      (sumAbs / n).toFloat,
      math.sqrt(sum2 / n).toFloat,
      peak.toFloat,
      (zc.toDouble / n).toFloat,
      (math.log(n.toDouble) / math.log(2)).toFloat)
  }

  /** Feature extraction over the media table: per-partition batch loop
    * (constant memory per partition, blobs never collected). At scale,
    * `repartition` first so each task holds ~targetPartitionBytes of
    * blobs; the stage is a pure map — no shuffle. */
  def extractFeatures(media: DataFrame): DataFrame = {
    val schema = media.schema
    val idIdx = schema.fieldIndex("media_id")
    val modIdx = schema.fieldIndex("modality")
    val cIdx = schema.fieldIndex("content")
    media.mapPartitions { it =>
      it.map { row =>
        val feat = decodeKernel(row.getAs[Array[Byte]](cIdx))
        Row(row.getLong(idIdx), row.getString(modIdx),
          feat.orNull, feat.isDefined)
      }
    }(Encoders.row(featureSchema))
  }

  val resizedSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("content", BinaryType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("resize_ok", BooleanType)))

  /** Resize kernel. Image payloads decode for REAL, rescale to exactly
    * (targetW, targetH) — the square-fill shape vision-training pipelines
    * use; aspect changes are the caller's policy — with bilinear
    * interpolation, and re-encode as PNG. An image-magic payload that
    * fails to parse is a resize FAILURE (None -> resize_ok=false).
    * Non-image payloads keep the deterministic (content, dims)-derived
    * fake so the plumbing is testable without audio/video codecs. */
  private[llm] def resizeKernel(content: Array[Byte], w: Int, h: Int): Option[Array[Byte]] =
    if (content == null || content.isEmpty) None
    else if (looksLikeImage(content)) decodeImage(content).flatMap { img =>
      val scaled = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      val gfx = scaled.createGraphics()
      try {
        gfx.setRenderingHint(
          java.awt.RenderingHints.KEY_INTERPOLATION,
          java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
        gfx.drawImage(img, 0, 0, w, h, null)
      } finally gfx.dispose()
      val bos = new java.io.ByteArrayOutputStream()
      if (javax.imageio.ImageIO.write(scaled, "png", bos)) Some(bos.toByteArray)
      else None
    }
    else {
      val out = new Array[Byte](math.min(content.length, 64))
      var i = 0
      while (i < out.length) {
        out(i) = (content(i) ^ (w * 31 + h)).toByte
        i += 1
      }
      Some(out)
    }

  /** Image resize stage over the media table: per-partition batch map,
    * image rows only (partition pruning when the table is partitioned by
    * modality). */
  def resizeImages(media: DataFrame, targetW: Int, targetH: Int): DataFrame = {
    val images = media.filter(col("modality") === "image")
    val schema = images.schema
    val idIdx = schema.fieldIndex("media_id")
    val cIdx = schema.fieldIndex("content")
    images.mapPartitions { it =>
      it.map { row =>
        val r = resizeKernel(row.getAs[Array[Byte]](cIdx), targetW, targetH)
        Row(row.getLong(idIdx), r.orNull, targetW, targetH, r.isDefined)
      }
    }(Encoders.row(resizedSchema))
  }

  val resampledSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("content", BinaryType),
    StructField("sample_rate", IntegerType),
    StructField("resample_ok", BooleanType)))

  /** Resample kernel. WAV payloads decode for REAL, linearly interpolate
    * the mono waveform to `targetHz`, and re-encode as a real 16-bit PCM
    * mono WAV (the fixed-rate mono shape audio-training pipelines feed
    * their tokenizers). A WAV-magic payload that fails to parse is a
    * resample FAILURE (None -> resample_ok=false). Non-WAV payloads keep
    * a deterministic (content, rate)-derived fake so the plumbing is
    * testable without more codecs. */
  private[graft] def resampleKernel(content: Array[Byte], targetHz: Int): Option[Array[Byte]] =
    if (content == null || content.isEmpty || targetHz <= 0) None
    else if (looksLikeWav(content)) decodeAudio(content).flatMap { wf =>
      val ratio = wf.sampleRate.toDouble / targetHz
      val outN = math.max(1, math.ceil(wf.samples.length / ratio).toInt)
      val out = new Array[Byte](outN * 2)
      var i = 0
      while (i < outN) {
        val pos = i * ratio
        val i0 = math.min(pos.toInt, wf.samples.length - 1)
        val i1 = math.min(i0 + 1, wf.samples.length - 1)
        val frac = pos - i0
        val v = wf.samples(i0) * (1.0 - frac) + wf.samples(i1) * frac
        val s = math.max(-32768L, math.min(32767L, math.round(v * 32767.0))).toInt
        out(i * 2) = (s & 0xff).toByte
        out(i * 2 + 1) = ((s >> 8) & 0xff).toByte
        i += 1
      }
      val fmt = new javax.sound.sampled.AudioFormat(
        targetHz.toFloat, 16, 1, true, false)
      val ais = new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(out), fmt, outN.toLong)
      val bos = new java.io.ByteArrayOutputStream()
      try {
        javax.sound.sampled.AudioSystem.write(
          ais, javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
        Some(bos.toByteArray)
      } catch { case scala.util.control.NonFatal(_) => None }
    }
    else {
      val out = new Array[Byte](math.min(content.length, 64))
      var i = 0
      while (i < out.length) {
        out(i) = (content(i) ^ (targetHz * 7)).toByte
        i += 1
      }
      Some(out)
    }

  /** Audio resample stage over the media table: per-partition batch map,
    * audio rows only (partition pruning when the table is partitioned by
    * modality). */
  def resampleAudio(media: DataFrame, targetHz: Int): DataFrame = {
    val audio = media.filter(col("modality") === "audio")
    val schema = audio.schema
    val idIdx = schema.fieldIndex("media_id")
    val cIdx = schema.fieldIndex("content")
    audio.mapPartitions { it =>
      it.map { row =>
        val r = resampleKernel(row.getAs[Array[Byte]](cIdx), targetHz)
        Row(row.getLong(idIdx), r.orNull, targetHz, r.isDefined)
      }
    }(Encoders.row(resampledSchema))
  }

  val vadSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("n_frames", IntegerType),
    StructField("n_voiced", IntegerType),
    StructField("voiced_ratio", DoubleType),
    StructField("max_run", IntegerType),
    StructField("vad_ok", BooleanType)))

  /** Energy VAD over one payload: real WAVs decode via javax.sound (the
    * [[decodeAudio]] path), digest fakes read each byte as a centered
    * 8-bit sample — the same real-codec-or-deterministic-fake split as
    * every other kernel here. Only FULL frames count (the tail partial
    * frame is dropped from frames AND from the global rms, one
    * universe); a frame is voiced when its rms exceeds
    * `thr x global rms`. Both comparison operands are pre-rounded to 9
    * decimals so the predicate is stable across engines: the oracle's
    * avg() accumulation order differs from this sequential loop, and a
    * borderline frame (|frms - thr*grms| within a few ulps) must not
    * flip between DuckDB builds. Returns (n_frames, n_voiced, ratio,
    * max_run). */
  private def rnd9(x: Double): Double =
    BigDecimal(x).setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble

  private[llm] def vadKernel(content: Array[Byte], frame: Int,
                             thr: Double): Option[(Int, Int, Double, Int)] = {
    val samples: Option[Array[Float]] =
      if (content == null || content.isEmpty) None
      else if (looksLikeWav(content)) decodeAudio(content).map(_.samples)
      else Some(content.map(b => (((b & 0xff) - 128) / 128.0f)))
    samples.flatMap { s =>
      val nf = s.length / frame
      if (nf == 0) None
      else {
        val n = nf * frame
        var g = 0.0
        var i = 0
        while (i < n) { g += s(i).toDouble * s(i); i += 1 }
        val grms = math.sqrt(g / n)
        val gate = rnd9(thr * grms)
        var voiced = 0; var run = 0; var maxRun = 0
        var f = 0
        while (f < nf) {
          var e = 0.0
          var j = f * frame
          while (j < (f + 1) * frame) { e += s(j).toDouble * s(j); j += 1 }
          if (rnd9(math.sqrt(e / frame)) > gate) {
            voiced += 1; run += 1; if (run > maxRun) maxRun = run
          } else run = 0
          f += 1
        }
        Some((nf, voiced, voiced.toDouble / nf, maxRun))
      }
    }
  }

  /** Voice-activity report over the audio rows — the speech-data
    * curation signal ("how much of this clip is actually speech / how
    * long is the longest utterance"); clips with near-zero voiced
    * ratio are silence or hum and get dropped before transcription
    * cost. Pure per-partition map over audio rows, frame energies only
    * (no payload ever leaves the task).
    *
    * Output: media_id, n_frames, n_voiced, voiced_ratio, max_run
    * (longest consecutive voiced frames), vad_ok (false = decode
    * failure or shorter than one frame). */
  def vadAudio(media: DataFrame, frame: Int = 400,
               thresholdFrac: Double = 0.5): DataFrame = {
    require(frame > 0 && thresholdFrac >= 0)
    val audio = media.filter(col("modality") === "audio")
    val schema = audio.schema
    val idIdx = schema.fieldIndex("media_id")
    val cIdx = schema.fieldIndex("content")
    audio.mapPartitions { it =>
      it.map { row =>
        vadKernel(row.getAs[Array[Byte]](cIdx), frame, thresholdFrac) match {
          case Some((nf, nv, ratio, mr)) =>
            Row(row.getLong(idIdx), nf, nv, ratio, mr, true)
          case None =>
            Row(row.getLong(idIdx), null, null, null, null, false)
        }
      }
    }(Encoders.row(vadSchema))
  }

  val audioFrameSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("frame_idx", IntegerType, nullable = false),
    StructField("rms", DoubleType, nullable = false),
    StructField("zcr", DoubleType, nullable = false)))

  /** Per-frame audio features: RMS energy and zero-crossing rate — the
    * two cheapest speech/music/noise discriminators (high-ZCR+low-RMS =
    * fricatives or hiss, low-ZCR+high-RMS = voiced speech or tones),
    * feeding clip-level curation upstream of any expensive model. Same
    * decode split as [[vadKernel]] (real WAV via javax.sound, digest
    * fakes as centered 8-bit samples), same full-frames-only universe.
    * A crossing is a strict sign-bit change (`v < 0` flips between
    * adjacent samples — zeros count as non-negative, the convention the
    * oracle replays with a lag window); zcr = crossings / (frame − 1).
    * Undecodable or sub-frame payloads emit no rows (the vad_ok=false
    * report already exists on [[vadAudio]]).
    *
    * Pure per-partition flatMap, frame-scale output, payloads never
    * leave the task. Output: media_id, frame_idx, `rms`, `zcr`
    * (both rounded 9, the mm kernel convention). */
  def audioFrameFeatures(media: DataFrame, frame: Int = 400): DataFrame = {
    require(frame >= 2)
    val audio = media.filter(col("modality") === "audio")
    val schema = audio.schema
    val idIdx = schema.fieldIndex("media_id")
    val cIdx = schema.fieldIndex("content")
    audio.mapPartitions { it =>
      it.flatMap { row =>
        val content = row.getAs[Array[Byte]](cIdx)
        val samples: Option[Array[Float]] =
          if (content == null || content.isEmpty) None
          else if (looksLikeWav(content)) decodeAudio(content).map(_.samples)
          else Some(content.map(b => (((b & 0xff) - 128) / 128.0f)))
        samples.toSeq.flatMap { s =>
          val nf = s.length / frame
          (0 until nf).map { f =>
            var e = 0.0; var crossings = 0
            var j = f * frame
            while (j < (f + 1) * frame) {
              e += s(j).toDouble * s(j)
              if (j > f * frame && ((s(j) < 0) != (s(j - 1) < 0)))
                crossings += 1
              j += 1
            }
            Row(row.getLong(idIdx), f, rnd9(math.sqrt(e / frame)),
              rnd9(crossings.toDouble / (frame - 1)))
          }
        }
      }
    }(Encoders.row(audioFrameSchema))
  }

  val probedSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("duration_ms", LongType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("tracks", IntegerType),
    StructField("brand", StringType),
    StructField("probe_ok", BooleanType)))

  /** Video metadata probe stage: MP4 payloads (ftyp-sniffed) parse the
    * REAL box structure — duration from `mvhd`, dimensions from `tkhd` —
    * and an MP4 that fails to parse is a probe FAILURE
    * (probe_ok=false). Non-MP4 payloads (no parseable container in this
    * container-less test corpus) pass the declared metadata columns
    * through as a deterministic fake, brand='fake'. Pure per-partition
    * map, video rows only. */
  def probeVideos(media: DataFrame): DataFrame = {
    val video = media.filter(col("modality") === "video")
    val schema = video.schema
    val idIdx = schema.fieldIndex("media_id")
    val cIdx = schema.fieldIndex("content")
    val wIdx = schema.fieldIndex("width")
    val hIdx = schema.fieldIndex("height")
    val dIdx = schema.fieldIndex("duration_ms")
    video.mapPartitions { it =>
      it.map { row =>
        val content = row.getAs[Array[Byte]](cIdx)
        if (looksLikeMp4(content)) probeVideo(content) match {
          case Some(v) => Row(row.getLong(idIdx), v.durationMs,
            v.width, v.height, v.tracks, v.brand, true)
          case None => Row(row.getLong(idIdx), null, null, null, null, null, false)
        }
        else if (looksLikeAvi(content)) parseAvi(content) match {
          case Some(a) => Row(row.getLong(idIdx),
            a.frames.size.toLong * a.usPerFrame / 1000,
            a.width, a.height, math.max(a.streams, 1), "AVI ", true)
          case None => Row(row.getLong(idIdx), null, null, null, null, null, false)
        }
        else Row(row.getLong(idIdx),
          if (row.isNullAt(dIdx)) null else row.getLong(dIdx),
          if (row.isNullAt(wIdx)) null else row.getInt(wIdx),
          if (row.isNullAt(hIdx)) null else row.getInt(hIdx),
          1, "fake", true)
      }
    }(Encoders.row(probedSchema))
  }

  /** Frame-sampling plan for video rows: expands each video into
    * `fps`-spaced frame REFERENCES (no decode; offsets only) — the shape
    * a downstream batch decoder consumes. Pure column math. */
  def sampleFrames(media: DataFrame, everyMs: Long = 1000L): DataFrame =
    media.filter(col("modality") === "video" && col("duration_ms") > 0)
      // zero/negative durations yield no frames; without the guard,
      // sequence(0, -1, everyMs) rejects the whole job at runtime
      .select(col("media_id"), col("duration_ms"),
        explode(sequence(lit(0L), col("duration_ms") - 1, lit(everyMs)))
          .as("frame_offset_ms"))

  // --- AVI / MJPEG: the one video container the JDK can really decode ----

  /** RIFF/AVI magic sniff. MJPEG-in-AVI frames are plain JPEGs, so the
    * JDK image codec makes frame extraction REAL for this container —
    * the same move as WAV for audio. */
  private[llm] def looksLikeAvi(b: Array[Byte]): Boolean =
    b != null && b.length >= 12 &&
      b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F' &&
      b(8) == 'A' && b(9) == 'V' && b(10) == 'I' && b(11) == ' '

  private def le32(b: Array[Byte], o: Int): Long =
    (b(o) & 0xffL) | ((b(o + 1) & 0xffL) << 8) |
      ((b(o + 2) & 0xffL) << 16) | ((b(o + 3) & 0xffL) << 24)

  private def riffId(b: Array[Byte], o: Int): String =
    new String(b, o, 4, "ISO-8859-1")

  /** Walk sibling RIFF chunks in [from, to): f(id, dataStart, dataEnd).
    * Chunk data pads to even length; malformed sizes end the walk. */
  private def walkRiff(b: Array[Byte], from: Int, to: Int)(
      f: (String, Int, Int) => Unit): Unit = {
    var off = from
    var continue = true
    while (continue && off + 8 <= to) {
      val size = le32(b, off + 4)
      if (size < 0 || off + 8 + size > to) continue = false
      else {
        f(riffId(b, off), off + 8, off + 8 + size.toInt)
        off += 8 + size.toInt + (size & 1).toInt
      }
    }
  }

  /** Parsed AVI container: `avih` facts + the (offset, length) of every
    * video frame chunk (`##dc`/`##db`) in the `movi` list. */
  private[graft] final case class AviInfo(
      usPerFrame: Long, totalFrames: Int, width: Int, height: Int,
      streams: Int, frames: Seq[(Int, Int)])

  /** Real AVI container parse: LIST(hdrl)/avih for timing + dimensions,
    * LIST(movi) for the frame chunk directory. None = the payload claims
    * a RIFF-AVI magic but the structure does not parse. */
  private[graft] def parseAvi(content: Array[Byte]): Option[AviInfo] =
    try {
      val b = content
      var usPerFrame = 0L; var total = 0; var w = 0; var h = 0
      var streams = 0
      var sawHdr = false
      val frames = Seq.newBuilder[(Int, Int)]
      // frame chunks may sit directly in movi OR inside LIST('rec ')
      // interleave groups (the VfW/ffmpeg layout for 1x-playback files)
      def collectFrames(from: Int, to: Int): Unit =
        walkRiff(b, from, to) { (id2, s2, e2) =>
          if (id2 == "LIST" && e2 - s2 >= 4 && riffId(b, s2) == "rec ")
            collectFrames(s2 + 4, e2)
          else if (id2.length == 4 &&
            (id2.endsWith("dc") || id2.endsWith("db")))
            frames += ((s2, e2 - s2))
        }
      walkRiff(b, 12, b.length) { (id, s, e) =>
        if (id == "LIST" && e - s >= 4) riffId(b, s) match {
          case "hdrl" => walkRiff(b, s + 4, e) { (id2, s2, e2) =>
            if (id2 == "avih" && e2 - s2 >= 40) {
              usPerFrame = le32(b, s2)
              total = le32(b, s2 + 16).toInt
              streams = le32(b, s2 + 24).toInt
              w = le32(b, s2 + 32).toInt
              h = le32(b, s2 + 36).toInt
              sawHdr = true
            }
          }
          case "movi" => collectFrames(s + 4, e)
          case _ => ()
        }
      }
      if (!sawHdr) None
      else Some(AviInfo(usPerFrame, total, w, h, streams, frames.result()))
    } catch { case scala.util.control.NonFatal(_) => None }

  val decodedFrameSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("frame_index", IntegerType),
    StructField("frame", BinaryType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("decode_ok", BooleanType)))

  /** GIF87a/89a magic sniff — animated GIFs are the second multi-frame
    * container the JDK decodes natively. */
  private[llm] def looksLikeGif(b: Array[Byte]): Boolean =
    b != null && b.length >= 6 &&
      b(0) == 'G' && b(1) == 'I' && b(2) == 'F' && b(3) == '8'

  /** Decode every `everyNth` frame of an (animated) GIF via the JDK
    * reader, re-encoded as standalone PNGs. Frames are emitted as the
    * reader returns them (raw rasters; delta frames of an optimized
    * animation are NOT composited onto their predecessors). None = the
    * payload claims a GIF magic but does not parse. */
  private[llm] def gifFrames(content: Array[Byte],
                             everyNth: Int): Option[Seq[(Int, Array[Byte], Int, Int)]] = {
    val iis = javax.imageio.ImageIO.createImageInputStream(
      new java.io.ByteArrayInputStream(content))
    try {
      val readers = javax.imageio.ImageIO.getImageReaders(iis)
      if (!readers.hasNext) None
      else {
        val reader = readers.next()
        try {
          reader.setInput(iis)
          val n = reader.getNumImages(true)
          if (n <= 0) None
          else Some((0 until n).filter(_ % everyNth == 0).map { i =>
            val img = reader.read(i)
            val bos = new java.io.ByteArrayOutputStream()
            javax.imageio.ImageIO.write(img, "png", bos)
            (i, bos.toByteArray, img.getWidth, img.getHeight)
          })
        } finally reader.dispose()
      }
    } catch { case scala.util.control.NonFatal(_) => None }
    finally iis.close()
  }

  /** Frame EXTRACTION over video rows, every `everyNth` frame. MJPEG-AVI
    * payloads decode for REAL: the RIFF walk locates each `##dc` chunk,
    * the JDK codec parses it as a JPEG, and the emitted frame is the
    * chunk's own bytes with the decoder's true dimensions. Animated-GIF
    * payloads decode for REAL too (JDK GIF reader, frames re-encoded as
    * standalone PNGs). An AVI/GIF-magic payload that fails to parse (or
    * a frame the codec rejects) is a decode FAILURE row. Other video
    * payloads (no H.264/VP9 codec in the JDK) take a deterministic
    * byte-projection fake — one frame per second of duration, capped at
    * 8 — so the plumbing is oracle-gated without codecs. Per-partition
    * batch map, video rows only. */
  def decodeFrames(media: DataFrame, everyNth: Int = 1): DataFrame = {
    require(everyNth >= 1, s"everyNth must be >= 1, got $everyNth")
    val video = media.filter(col("modality") === "video")
    val schema = video.schema
    val idIdx = schema.fieldIndex("media_id")
    val cIdx = schema.fieldIndex("content")
    val wIdx = schema.fieldIndex("width")
    val hIdx = schema.fieldIndex("height")
    val dIdx = schema.fieldIndex("duration_ms")
    video.mapPartitions { it =>
      it.flatMap { row =>
        val id = row.getLong(idIdx)
        val content = row.getAs[Array[Byte]](cIdx)
        if (looksLikeAvi(content)) parseAvi(content) match {
          // a parseable header with an absent/empty movi is still a
          // decode FAILURE row — a media_id must never silently vanish
          case Some(info) if info.frames.isEmpty =>
            Seq(Row(id, 0, null, null, null, false))
          case Some(info) =>
            info.frames.zipWithIndex.collect {
              case ((off, len), i) if i % everyNth == 0 =>
                val chunk = java.util.Arrays.copyOfRange(content, off, off + len)
                decodeImage(chunk) match {
                  case Some(img) =>
                    Row(id, i, chunk, img.getWidth, img.getHeight, true)
                  case None => Row(id, i, null, null, null, false)
                }
            }
          case None => Seq(Row(id, 0, null, null, null, false))
        }
        else if (looksLikeGif(content)) gifFrames(content, everyNth) match {
          case Some(fs) => fs.map { case (i, png, w, h) =>
            Row(id, i, png, w, h, true) }
          case None => Seq(Row(id, 0, null, null, null, false))
        }
        else if (content == null || content.isEmpty)
          Seq(Row(id, 0, null, null, null, false))
        else {
          val n = if (row.isNullAt(dIdx)) 0
                  else math.min(row.getLong(dIdx) / 1000, 8L).toInt
          (0 until n).filter(_ % everyNth == 0).map { i =>
            val out = new Array[Byte](math.min(content.length, 32))
            var j = 0
            while (j < out.length) {
              out(j) = (content(j) ^ (i * 131)).toByte
              j += 1
            }
            Row(id, i, out,
              if (row.isNullAt(wIdx)) null else row.getInt(wIdx),
              if (row.isNullAt(hIdx)) null else row.getInt(hIdx), true)
          }
        }
      }
    }(Encoders.row(decodedFrameSchema))
  }

  // --- Perceptual hashing (image near-duplicate detection) ----------------

  val dhashSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("dhash", LongType),
    StructField("hash_ok", BooleanType)))

  /** 64-bit difference hash (dHash) of an image payload: decode for
    * REAL, bilinear-resize to 9×8 grayscale, and emit one bit per
    * horizontally-adjacent luma comparison. Robust to re-encoding,
    * resizing, and small edits — the standard cheap perceptual signature
    * for image dedup at corpus scale. Non-image payloads (no codec in
    * the JDK, or digest fakes) take the md5-60-bit byte hash — a
    * deterministic, oracle-replicable stand-in under which only exact
    * byte duplicates collide (the right degradation for a content-
    * addressed fake). None = an image-magic payload that fails to
    * decode. */
  private[graft] def dHashKernel(content: Array[Byte]): Option[Long] =
    if (content == null || content.isEmpty) None
    else if (looksLikeImage(content)) decodeImage(content).map { img =>
      val scaled = new java.awt.image.BufferedImage(
        9, 8, java.awt.image.BufferedImage.TYPE_INT_RGB)
      val gfx = scaled.createGraphics()
      try {
        gfx.setRenderingHint(
          java.awt.RenderingHints.KEY_INTERPOLATION,
          java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
        gfx.drawImage(img, 0, 0, 9, 8, null)
      } finally gfx.dispose()
      var h = 0L
      var bit = 0
      var y = 0
      while (y < 8) {
        var x = 0
        while (x < 8) {
          def luma(px: Int): Double = {
            val p = scaled.getRGB(px, y)
            0.299 * ((p >> 16) & 0xff) + 0.587 * ((p >> 8) & 0xff) +
              0.114 * (p & 0xff)
          }
          if (luma(x) < luma(x + 1)) h |= (1L << bit)
          bit += 1
          x += 1
        }
        y += 1
      }
      h
    }
    else {
      // md5-60-bit of the raw bytes: the Dedup.md5Hash60 twin, so the
      // fake path is bit-for-bit replicable by a SQL oracle
      val d = java.security.MessageDigest.getInstance("MD5").digest(content)
      val hex = d.map(b => f"${b & 0xff}%02x").mkString
      Some(java.lang.Long.parseLong(hex.substring(0, 15), 16))
    }

  /** Perceptual-hash stage over the media table: image rows only,
    * per-partition batch map (same shape as [[extractFeatures]]). */
  def dHash(media: DataFrame): DataFrame = {
    val images = media.filter(col("modality") === "image")
    val schema = images.schema
    val idIdx = schema.fieldIndex("media_id")
    val cIdx = schema.fieldIndex("content")
    images.mapPartitions { it =>
      it.map { row =>
        val h = dHashKernel(row.getAs[Array[Byte]](cIdx))
        Row(row.getLong(idIdx), h.map(Long.box).orNull, h.isDefined)
      }
    }(Encoders.row(dhashSchema))
  }

  /** Image near-duplicate pairs: dHash + [[Dedup.hammingNearDup]]'s
    * exact banded pigeonhole join — candidates only ever form on shared
    * 16-bit bands, never all-pairs, so the shape survives a billion
    * images. Output: (a, b, hamming). */
  def imageNearDup(media: DataFrame, maxDist: Int = 3): DataFrame =
    Dedup.hammingNearDup(
      dHash(media).filter(col("hash_ok")),
      maxDist, hashCol = "dhash", idCol = "media_id")

  val videoFrameHashSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("frame_ms", LongType, nullable = false),
    StructField("fhash", LongType, nullable = false)))

  /** Per-frame perceptual hashes for video rows — the signature stage of
    * video dedup. MJPEG-AVI payloads hash REAL frames (container parse →
    * JDK JPEG decode → [[dHashKernel]] gradient hash); digest fakes hash
    * `md5₆₀(hex ":" offset_ms)` per sampled offset (`everyMs` grid over
    * `duration_ms`) — the [[graft.llm.Dedup.md5Hash60]] construction, so
    * the fake path replays bit-for-bit in a SQL oracle. Pure
    * per-partition flatMap; payloads never leave the task. */
  def videoFrameHashes(media: DataFrame, everyMs: Long = 1000L): DataFrame = {
    require(everyMs > 0)
    val video = media.filter(col("modality") === "video")
    val schema = video.schema
    val idIdx = schema.fieldIndex("media_id")
    val cIdx = schema.fieldIndex("content")
    val dIdx = schema.fieldIndex("duration_ms")
    video.mapPartitions { it =>
      it.flatMap { row =>
        val content = row.getAs[Array[Byte]](cIdx)
        val id = row.getLong(idIdx)
        if (looksLikeAvi(content)) {
          parseAvi(content).toSeq.flatMap { avi =>
            avi.frames.zipWithIndex.flatMap { case ((off, len), i) =>
              val jpeg = java.util.Arrays.copyOfRange(content, off, off + len)
              dHashKernel(jpeg).map(h =>
                Row(id, i * avi.usPerFrame / 1000, h))
            }
          }
        } else if (content == null || content.isEmpty ||
            row.isNullAt(dIdx)) Seq.empty
        else {
          val hex = new String(content,
            java.nio.charset.StandardCharsets.UTF_8)
          val dur = row.getLong(dIdx)
          (0L until dur by everyMs).map { ms =>
            val d = java.security.MessageDigest.getInstance("MD5")
              .digest(s"$hex:$ms".getBytes("UTF-8"))
            val h = d.map(b => f"${b & 0xff}%02x").mkString
            Row(id, ms, java.lang.Long.parseLong(h.substring(0, 15), 16))
          }
        }
      }
    }(Encoders.row(videoFrameHashSchema))
  }

  /** Video near-duplicate pairs: two videos sharing at least `minShared`
    * distinct frame hashes (re-encodes, clips, replicas share frames; a
    * Hamming-tolerant variant would route each frame hash through
    * [[Dedup.hammingNearDup]] instead of the exact join). Candidates form
    * ONLY on shared frame-hash buckets — never all-pairs — and a
    * degenerate hash owned by more than `maxBucket` videos is dropped
    * before pairing (the boilerplate valve every banding path here has:
    * black frames and title cards would otherwise pair everything).
    *
    * Output: (a, b, n_shared) with a < b. */
  def videoNearDup(media: DataFrame, everyMs: Long = 1000L,
                   minShared: Int = 2, maxBucket: Int = 1000): DataFrame = {
    require(minShared >= 1 && maxBucket >= 2)
    val f = videoFrameHashes(media, everyMs)
      .select(col("media_id"), col("fhash")).distinct()
    val safe = f.join(
      f.groupBy(col("fhash")).agg(count(lit(1)).as("__owners"))
        .filter(col("__owners") <= maxBucket)
        .select(col("fhash")),
      "fhash")
    safe.select(col("fhash"), col("media_id").as("a"))
      .join(safe.select(col("fhash"), col("media_id").as("b")), "fhash")
      .filter(col("a") < col("b"))
      .groupBy(col("a"), col("b"))
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
  }
}
