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

  /** Decoded features per media item. */
  case class MediaFeatures(id: Long, format: String, n_frames: Int,
                           features: Array[Float])

  /** One-time media-lake fixture: payloads derived deterministically from
    * documents — REAL PPM/PNG/BMP/WAV/AVI(MJPEG) encodings for every
    * row. Written as parquet so the read path is an ordinary
    * binary-column scan. */
  def mediaFixture(s: SparkSession, sfDir: String): String =
    graft.tables.Fixtures.cached("media4", "media.parquet", sfDir) { dir =>
      import s.implicits._
      Tables.documents(s, sfDir)
        .select(col("doc_id"), col("text")).as[(Long, String)]
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
    s.read.parquet(mediaFixture(s, d))

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
    val gray = Array.tabulate(w * h)(i => bytes(i % bytes.length))
    JpegRow(id, w, h, JpegCodec.encodeJpegGray(w, h, gray, dcOnly = true))
  }

  /** One-time JPEG-lake fixture over the mp4-slot documents (id%5==3)
    * — the docs whose main-lake row is the video stub get a REAL
    * compressed decode here. */
  def jpegFixture(s: SparkSession, sfDir: String): String =
    graft.tables.Fixtures.cached("mediajpeg1", "media_jpeg.parquet", sfDir) { dir =>
      import s.implicits._
      Tables.documents(s, sfDir)
        .select(col("doc_id"), col("text")).as[(Long, String)]
        .filter(_._1 % 5 == 3)
        .map { case (id, text) => mkJpegRow(id, text) }
        .write.mode("overwrite").parquet(dir.toString)
    }()

  def syntheticJpegs(s: SparkSession, d: String): DataFrame =
    s.read.parquet(jpegFixture(s, d))

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

  /** Shared ppm → pooled-features kernel: single source of truth for BOTH
    * ingest routes (parquet media lake and binaryFile directory), so the
    * MultimodalSpec equality between them can't be satisfied by two
    * coincidentally-equal copies. */
  def ppmFeatures(id: Long, bytes: Array[Byte], poolFactor: Int): MediaFeatures = {
    val (w, h, px) = MediaCodecs.decodePpm(bytes)
    MediaFeatures(id, "ppm", 1, meanPool(px, w, h, poolFactor))
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
            val (w, h, px) = MediaCodecs.decodeBmp(m.payload)
            MediaFeatures(m.id, m.format, 1, meanPool(px, w, h, poolFactor))
          case "png" => // REAL compressed decode: CRC + inflate + unfilter
            val (w, h, px) = MediaCodecs.decodePng(m.payload)
            MediaFeatures(m.id, m.format, 1, meanPool(px, w, h, poolFactor))
          case "wav" =>
            val (_, samples) = MediaCodecs.decodeWav(m.payload)
            MediaFeatures(m.id, m.format, 1,
              MediaCodecs.poolAudio(samples, 16))
          case "avi" => // REAL video: RIFF walk + per-frame baseline JPEG
            val (w, h, jpegs) = MediaCodecs.decodeAviMjpeg(m.payload)
            val kept = sampleFrames(jpegs.length, stride = 2)
            val feats = kept.toArray.flatMap { f =>
              val (_, _, gray) = JpegCodec.decodeJpegGray(jpegs(f))
              meanPool(gray.map(b => (b & 0xff) / 255.0f), w, h, poolFactor)
            }
            MediaFeatures(m.id, m.format, kept.size, feats)
          case _ => // no-pure-JVM-route formats (e.g. H.264): documented stub
            val px = decodeStub(m.payload, m.width, m.height)
            MediaFeatures(m.id, m.format, 1,
              meanPool(px, m.width, m.height, poolFactor))
        }
      }
    }
  }

  /** Rows-only query: full multimodal pipeline over the media lake —
    * schema + batch plumbing + real ppm/wav decode exercised end-to-end;
    * per-row feature checksum makes regressions visible in the dump. */
  def multimodalFeatures(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val media = syntheticMedia(s, d).as[MediaRow]
    extractFeatures(media).toDF()
      .select(col("id"), col("format"), col("n_frames"),
        size(col("features")).as("n_features"),
        round(aggregate(col("features"), lit(0.0),
          (a, x) => a + x.cast("double")), 2).as("checksum"))
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
          (a, x) => a + x.cast("double")), 2).as("checksum"))
      .orderBy("id")
  }

  val queries: Map[String, Q] = Map(
    "q_multimodal_features" -> multimodalFeatures _,
    "q_multimodal_binfile"  -> multimodalBinaryFiles _,
  )
  val oracle: Map[String, String] = Map.empty
}
