package graft.llm

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Perceptual image hashing (dHash) over the media lake + banded
  * hamming near-dup pairs — image-level dedup, the multimodal sibling
  * of the SimHash text rung (reference has no image ops; this is the
  * training-data-pipeline extension surface, SURVEY §2B).
  *
  * The hash is the classic difference hash (dHash): downscale to a
  * 9×8 luma grid, emit one bit per horizontally adjacent cell pair
  * (left mean > right mean), 8×8 = 64 bits. Two deliberate choices
  * make it ORACLE-ABLE — the first hash-verified path through the
  * real binary decoders:
  *
  *  - INTEGER luma (299r + 587g + 114b — Rec.601 ×1000): no float
  *    enters the pipeline, so DuckDB can recompute the hash bit-exactly
  *    from first principles (the media fixture's payloads are
  *    deterministic byte cycles of document text, so the oracle
  *    re-derives every pixel with `ord(substr(text, …))` arithmetic and
  *    proves the WHOLE decode path: PPM token grammar, BMP bottom-up
  *    row order, BGR swap, 4-byte row padding, and since round 9 the
  *    full PNG chain — chunk CRCs, zlib inflate, all five scanline
  *    filters — any decode bug scrambles block sums and flips hash
  *    bits).
  *  - CROSS-SCALED block comparison (S_a·C_b > S_b·C_a instead of
  *    means): division never happens, block sizes may differ by ±1
  *    pixel, and the comparison stays in exact BIGINT range
  *    (S ≤ 255000·|block| ≈ 2^25, S·C ≈ 2^31).
  *
  * Scale shape: decode+hash is one `mapPartitions` pass over the media
  * scan (binary codec — the documented no-Catalyst-expression-exists
  * case, same as the feature extractor), no shuffle before the
  * presentation sort. Near-dup pairs are banded-LSH (16 disjoint 4-bit
  * bands): hamming ≤ 15 < 16 bands ⇒ pigeonhole guarantees a shared
  * exact band, so the band-equality join is a COMPLETE candidate
  * generator — never all-pairs — and the all-pairs DuckDB oracle
  * re-proves that completeness at every gate run.
  */
object ImageHash {
  type Q = (SparkSession, String) => DataFrame

  val GridW = 9 // 9 columns → 8 horizontal comparisons per row
  val GridH = 8

  /** 64-bit integer dHash of an interleaved-RGB image. Pure integer:
    * bit(gy, c) = luma-sum cross-scaled compare of blocks (gy,c) and
    * (gy,c+1); bit index = gy*8 + c. */
  def dhash64(w: Int, h: Int, rgb: Array[Byte]): Long = {
    require(rgb.length == 3 * w * h, s"rgb length ${rgb.length} != 3*$w*$h")
    val s = Array.ofDim[Long](GridH, GridW)
    val c = Array.ofDim[Long](GridH, GridW)
    var p = 0
    val n = w * h
    while (p < n) {
      val x = p % w
      val y = p / w
      val gx = x * GridW / w
      val gy = y * GridH / h
      val lum = 299L * (rgb(3 * p) & 0xff) +
        587L * (rgb(3 * p + 1) & 0xff) +
        114L * (rgb(3 * p + 2) & 0xff)
      s(gy)(gx) += lum
      c(gy)(gx) += 1
      p += 1
    }
    var hash = 0L
    var gy = 0
    while (gy < GridH) {
      var col = 0
      while (col < GridW - 1) {
        if (s(gy)(col) * c(gy)(col + 1) > s(gy)(col + 1) * c(gy)(col))
          hash |= 1L << (gy * 8 + col)
        col += 1
      }
      gy += 1
    }
    hash
  }

  /** Per-image hash table over the media lake's real image formats:
    * (id, format, w, h, phash). Decode errors are NOT caught — a
    * corrupt payload must surface, not silently hash to garbage. */
  def phashTable(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Multimodal.syntheticMedia(s, d).as[Multimodal.MediaRow]
      .filter(col("format").isin("ppm", "bmp", "png"))
      .mapPartitions { rows =>
        rows.map { m =>
          val (w, h, rgb) = m.format match {
            case "ppm" => MediaCodecs.decodePpmRgb(m.payload)
            case "png" => MediaCodecs.decodePngRgb(m.payload)
            case _     => MediaCodecs.decodeBmpRgb(m.payload)
          }
          (m.id, m.format, w, h, dhash64(w, h, rgb))
        }
      }
      .toDF("id", "format", "w", "h", "phash")
  }

  /** Banded-LSH near-dup pairs over a (id, phash) frame. Completeness:
    * a pair at hamming ≤ maxHamming differs in ≤ maxHamming bands, so
    * with maxHamming < 64/bandBits bands at least one band is untouched
    * and the equality join finds the pair (Manku et al., WWW'07 — the
    * same argument as the SimHash text rung). Shuffle is keyed on
    * (band, value): linear in corpus size, never all-pairs; the exact
    * hamming check runs on candidates only. */
  def nearDupPairs(hashes: DataFrame, maxHamming: Int,
                   bandBits: Int = 4): DataFrame = {
    require(64 % bandBits == 0, "bandBits must divide 64")
    val bands = 64 / bandBits
    require(maxHamming < bands,
      s"banding complete only for maxHamming < $bands")
    val mask = (1L << bandBits) - 1
    val banded = hashes.select(col("id"), col("phash"),
        explode(sequence(lit(0), lit(bands - 1))).as("band"))
      // arithmetic shiftright sign-extends on negative hashes; the
      // band mask keeps only the intended low bits
      .withColumn("bval", expr(s"(phash >> (band * $bandBits)) & $mask"))
    val a = banded.select(col("id").as("id1"), col("phash").as("h1"),
      col("band"), col("bval"))
    val b = banded.select(col("id").as("id2"), col("phash").as("h2"),
      col("band"), col("bval"))
    a.join(b, Seq("band", "bval"))
      .filter(col("id1") < col("id2"))
      .select("id1", "id2", "h1", "h2").distinct()
      .withColumn("hamming", bit_count(expr("h1 ^ h2")).cast("int"))
      .filter(col("hamming") <= maxHamming)
      .select("id1", "id2", "hamming")
  }

  // ---------------------------------------------------------- queries --

  def phashQ(s: SparkSession, d: String): DataFrame =
    phashTable(s, d).orderBy("id")

  def nearDupQ(s: SparkSession, d: String): DataFrame =
    nearDupPairs(phashTable(s, d).select("id", "phash"), maxHamming = 15)
      .orderBy("id1", "id2")

  /** The PNG decode path proven standalone (beyond its phash rows):
    * per-image integer luma total over ALL pixels of the decoded PNG.
    * Any bug anywhere in the chunk walk, CRC check, zlib inflate, or
    * any of the five filter reconstructions changes some pixel and
    * therefore the BIGINT sum — and the DuckDB oracle rebuilds every
    * pixel from the fixture's text-byte contract without parsing PNG
    * at all, so the two sides share no code. */
  def pngDecodeQ(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Multimodal.syntheticMedia(s, d).as[Multimodal.MediaRow]
      .filter(col("format") === "png")
      .mapPartitions { rows =>
        rows.map { m =>
          val (w, h, rgb) = MediaCodecs.decodePngRgb(m.payload)
          var lum = 0L
          var p = 0
          val n = w * h
          while (p < n) {
            lum += 299L * (rgb(3 * p) & 0xff) +
              587L * (rgb(3 * p + 1) & 0xff) +
              114L * (rgb(3 * p + 2) & 0xff)
            p += 1
          }
          (m.id, w, h, lum)
        }
      }
      .toDF("id", "w", "h", "lum_sum")
      .orderBy("id")
  }

  /** The baseline-JPEG decode path proven the same way PNG is: per-image
    * integer luma total over every decoded pixel. The fixture encodes
    * DC-ONLY grayscale streams (Multimodal.mkJpegRow), whose decode is
    * EXACT integer arithmetic — so any bug in the marker walk, DHT
    * canonical-code build, Huffman DECODE, DC EXTEND/prediction, EOB
    * handling, dequant, or IDCT shifts some block's flat value and the
    * BIGINT sum — while the DuckDB oracle rebuilds every pixel from the
    * text-byte contract with no JPEG parsing at all. The lossy full-DCT
    * path has nothing bit-exact to pin and is spec-gated instead
    * (JpegCodecSpec round-trip error bounds). */
  def jpegDecodeQ(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Multimodal.syntheticJpegs(s, d).as[Multimodal.JpegRow]
      .mapPartitions { rows =>
        rows.map { m =>
          val (w, h, gray) = JpegCodec.decodeJpegGray(m.payload)
          var lum = 0L
          var p = 0
          while (p < w * h) { lum += gray(p) & 0xff; p += 1 }
          (m.id, w, h, lum)
        }
      }
      .toDF("id", "w", "h", "lum_sum")
      .orderBy("id")
  }

  /** The VIDEO decode path proven end-to-end: RIFF/AVI container walk →
    * per-frame baseline-JPEG decode → per-video luma total over EVERY
    * pixel of EVERY frame. The fixture's frames are DC-only streams
    * cycling one continuous text-byte sequence across frames
    * (Multimodal.mkRow avi case), so the DuckDB oracle extends the jpeg
    * block arithmetic by a frame axis — no container or JPEG parsing on
    * the oracle side. Any bug in the chunk walk (sizes, word alignment,
    * movi nesting) or in any frame's entropy decode shifts the sum. */
  def videoDecodeQ(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Multimodal.syntheticMedia(s, d).as[Multimodal.MediaRow]
      .filter(col("format") === "avi")
      .mapPartitions { rows =>
        rows.map { m =>
          val (w, h, jpegs) = MediaCodecs.decodeAviMjpeg(m.payload)
          var lum = 0L
          jpegs.foreach { fr =>
            val (fw, fh, gray) = JpegCodec.decodeJpegGray(fr)
            require(fw == w && fh == h, s"avi ${m.id}: frame dims drift")
            var p = 0
            while (p < fw * fh) { lum += gray(p) & 0xff; p += 1 }
          }
          (m.id, w, h, jpegs.length, lum)
        }
      }
      .toDF("id", "w", "h", "n_frames", "lum_sum")
      .orderBy("id")
  }

  val queries: Map[String, Q] = Map(
    "q_multimodal_phash"   -> phashQ _,
    "q_multimodal_neardup" -> nearDupQ _,
    "q_multimodal_png"     -> pngDecodeQ _,
    "q_multimodal_jpeg"    -> jpegDecodeQ _,
    "q_multimodal_video"   -> videoDecodeQ _,
  )

  // The oracle re-derives every pixel from the document text (the
  // fixture's payload contract: rgb byte i = text byte i % len) and
  // recomputes the hash independently — decode + hash proven bit-exact.
  // Bit 63 cannot be built as 1<<63 in DuckDB (signed overflow); it is
  // added as the BIGINT minimum, which is the same two's-complement
  // value Scala's 1L<<63 produces.
  private val phashCte =
    """WITH img AS (
         SELECT doc_id AS id,
                CASE WHEN doc_id % 5 = 0 THEN 'ppm'
                     WHEN doc_id % 5 = 1 THEN 'png'
                     ELSE 'bmp' END AS format,
                CAST(doc_id % 64 + 16 AS INT) AS w,
                CAST(doc_id % 32 + 16 AS INT) AS h,
                text, length(text) AS len
         FROM documents WHERE doc_id % 5 IN (0, 1, 4)),
       px AS (
         SELECT id, format, w, h,
                CAST((p % w) * 9 // w AS INT) AS gx,
                CAST((p // w) * 8 // h AS INT) AS gy,
                299 * ord(substr(text, CAST((3*p)   % len AS INT) + 1, 1))
              + 587 * ord(substr(text, CAST((3*p+1) % len AS INT) + 1, 1))
              + 114 * ord(substr(text, CAST((3*p+2) % len AS INT) + 1, 1))
                AS lum
         FROM img, LATERAL (SELECT unnest(range(0, CAST(w AS BIGINT) * h)) AS p)),
       blocks AS (
         SELECT id, format, w, h, gy, gx,
                SUM(lum) AS s, COUNT(*) AS c
         FROM px GROUP BY id, format, w, h, gy, gx),
       bits AS (
         SELECT a.id, a.format, a.w, a.h, a.gy, a.gx,
                CASE WHEN a.s * b.c > b.s * a.c THEN 1 ELSE 0 END AS bit
         FROM blocks a
         JOIN blocks b ON a.id = b.id AND a.gy = b.gy AND b.gx = a.gx + 1
         WHERE a.gx < 8),
       ph AS (
         SELECT id, format, w, h,
                CAST(SUM(CASE
                  WHEN bit = 1 AND gy*8+gx = 63 THEN -9223372036854775807 - 1
                  WHEN bit = 1 THEN (CAST(1 AS BIGINT) << CAST(gy*8+gx AS INT))
                  ELSE 0 END) AS BIGINT) AS phash
         FROM bits GROUP BY id, format, w, h)"""

  val oracle: Map[String, String] = Map(
    "q_multimodal_phash" ->
      (phashCte + "\n SELECT id, format, w, h, phash FROM ph ORDER BY id"),
    "q_multimodal_neardup" ->
      (phashCte +
        """
        SELECT a.id AS id1, b.id AS id2,
               CAST(bit_count(xor(a.phash, b.phash)) AS INT) AS hamming
        FROM ph a JOIN ph b ON a.id < b.id
        WHERE bit_count(xor(a.phash, b.phash)) <= 15
        ORDER BY id1, id2"""),
    // PNG-only decode proof: integer luma total per image, pixels
    // rebuilt from the text-byte contract with no PNG parsing at all
    "q_multimodal_png" ->
      """WITH img AS (
           SELECT doc_id AS id,
                  CAST(doc_id % 64 + 16 AS INT) AS w,
                  CAST(doc_id % 32 + 16 AS INT) AS h,
                  text, length(text) AS len
           FROM documents WHERE doc_id % 5 = 1),
         px AS (
           SELECT id, w, h,
                  299 * ord(substr(text, CAST((3*p)   % len AS INT) + 1, 1))
                + 587 * ord(substr(text, CAST((3*p+1) % len AS INT) + 1, 1))
                + 114 * ord(substr(text, CAST((3*p+2) % len AS INT) + 1, 1))
                  AS lum
           FROM img, LATERAL (SELECT unnest(range(0, CAST(w AS BIGINT) * h)) AS p))
         SELECT id, w, h, CAST(SUM(lum) AS BIGINT) AS lum_sum
         FROM px GROUP BY id, w, h ORDER BY id""",
    // JPEG decode proof: the DC-only fixture contract makes every 8×8
    // block decode to the flat integer 2·trunc((Σblock−8128)/128)+128
    // (JpegCodec scaladoc: Q(0,0)=16, IDCT of DC-only is flat DC/8 —
    // no rounding anywhere), and DuckDB's // truncates toward zero
    // exactly like the encoder's Scala division. Pixels are rebuilt
    // from the text-byte cycle with no JPEG parsing at all.
    "q_multimodal_jpeg" ->
      """WITH img AS (
           SELECT doc_id AS id,
                  CAST((doc_id % 8 + 2) * 8 AS INT) AS w,
                  CAST((doc_id % 4 + 2) * 8 AS INT) AS h,
                  text, length(text) AS len
           FROM documents WHERE doc_id % 5 = 3),
         px AS (
           SELECT id, w, h,
                  (p // w) // 8 AS gy, (p % w) // 8 AS gx,
                  ord(substr(text, CAST(p % len AS INT) + 1, 1)) AS g
           FROM img, LATERAL (SELECT unnest(range(0, CAST(w AS BIGINT) * h)) AS p)),
         blocks AS (
           SELECT id, w, h, gy, gx,
                  64 * (2 * ((SUM(g) - 8128) // 128) + 128) AS block_lum
           FROM px GROUP BY id, w, h, gy, gx)
         SELECT id, w, h, CAST(SUM(block_lum) AS BIGINT) AS lum_sum
         FROM blocks GROUP BY id, w, h ORDER BY id""",
    // VIDEO decode proof: the jpeg block arithmetic extended by a frame
    // axis — frame f's gray byte i is text byte ((f*w*h + i) % len),
    // every frame a DC-only block grid. No AVI or JPEG parsing here.
    "q_multimodal_video" ->
      """WITH img AS (
           SELECT doc_id AS id,
                  CAST((doc_id % 8 + 2) * 8 AS INT) AS w,
                  CAST((doc_id % 4 + 2) * 8 AS INT) AS h,
                  CAST(doc_id % 30 + 2 AS INT) AS n_frames,
                  text, length(text) AS len
           FROM documents WHERE doc_id % 5 = 3),
         px AS (
           SELECT id, w, h, n_frames,
                  p // (w * h) AS f,
                  ((p % (w * h)) // w) // 8 AS gy,
                  ((p % (w * h)) % w) // 8 AS gx,
                  ord(substr(text, CAST(p % len AS INT) + 1, 1)) AS g
           FROM img, LATERAL (SELECT unnest(range(0,
                  CAST(n_frames AS BIGINT) * w * h)) AS p)),
         blocks AS (
           SELECT id, w, h, n_frames, f, gy, gx,
                  64 * (2 * ((SUM(g) - 8128) // 128) + 128) AS block_lum
           FROM px GROUP BY id, w, h, n_frames, f, gy, gx)
         SELECT id, w, h, n_frames, CAST(SUM(block_lum) AS BIGINT) AS lum_sum
         FROM blocks GROUP BY id, w, h, n_frames ORDER BY id""",
  )
}
