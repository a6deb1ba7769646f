package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** dHash kernel goldens, RGB round-trips through both binary codecs,
  * and banded near-dup completeness vs brute force. */
class ImageHashSpec extends SparkSpec {
  import spark.implicits._

  test("dhash64 golden: horizontal gradient sets every comparison bit " +
    "one way, reversed gradient the other") {
    // 18×16 image, luma strictly increasing left→right: every block's
    // mean is below its right neighbour → no bit set
    val w = 18; val h = 16
    val inc = Array.tabulate(3 * w * h) { i =>
      val p = i / 3; (p % w * 14).toByte // 0..238 by column
    }
    assert(ImageHash.dhash64(w, h, inc) === 0L)
    // decreasing left→right: all 64 comparison bits set, including bit
    // 63 — the hash is the all-ones Long, negative by two's complement
    val dec = Array.tabulate(3 * w * h) { i =>
      val p = i / 3; ((w - 1 - p % w) * 14).toByte
    }
    assert(ImageHash.dhash64(w, h, dec) === -1L)
  }

  test("dhash is invariant to the container format (ppm vs bmp of the " +
    "same pixels), and rgb round-trips both codecs incl. bmp padding") {
    // w=17 → 3w=51, not a multiple of 4: bmp rows carry real padding
    val w = 17; val h = 9
    val rgb = Array.tabulate(3 * w * h)(i => ((i * 37 + 11) % 251).toByte)
    val (pw, ph, prgb) = MediaCodecs.decodePpmRgb(MediaCodecs.encodePpm(w, h, rgb))
    val (bw, bh, brgb) = MediaCodecs.decodeBmpRgb(MediaCodecs.encodeBmp(w, h, rgb))
    assert((pw, ph) === (w, h) && (bw, bh) === (w, h))
    assert(prgb.toSeq === rgb.toSeq, "ppm rgb round-trip")
    assert(brgb.toSeq === rgb.toSeq, "bmp rgb round-trip (BGR+bottom-up+pad)")
    assert(ImageHash.dhash64(w, h, prgb) === ImageHash.dhash64(w, h, brgb))
  }

  test("banded near-dup join is complete vs brute force for hamming<=15 " +
    "and prunes far pairs, negative (bit-63) hashes included") {
    // planted cluster around an all-ones base (negative Long) and
    // around zero, plus isolated far points
    def flip(h: Long, bits: Seq[Int]): Long =
      bits.foldLeft(h)((a, b) => a ^ (1L << b))
    val hs = Seq(
      1L -> -1L,                         // all ones (bit 63 set)
      2L -> flip(-1L, 0 until 15),       // hamming 15 from id1
      3L -> flip(-1L, 10 to 25),         // hamming 16 from id1 (excluded)
      4L -> 0L,
      5L -> flip(0L, Seq(63)),           // hamming 1, crosses the sign bit
      6L -> flip(0L, 0 until 40)         // far from everything
    ).toDF("id", "phash")
    val banded = ImageHash.nearDupPairs(hs, maxHamming = 15)
      .select("id1", "id2", "hamming").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSeq.sorted
    val brute = {
      val m = Seq(1L -> -1L, 2L -> flip(-1L, 0 until 15),
        3L -> flip(-1L, 10 to 25), 4L -> 0L, 5L -> flip(0L, Seq(63)),
        6L -> flip(0L, 0 until 40))
      for {
        (i, a) <- m; (j, b) <- m if i < j
        d = java.lang.Long.bitCount(a ^ b) if d <= 15
      } yield (i, j, d)
    }.sorted
    assert(banded === brute)
    assert(banded.contains((4L, 5L, 1)), "sign-bit-crossing pair found")
    assert(!banded.exists { case (a, b, _) => (a, b) == ((1L, 3L)) },
      "hamming-16 pair excluded")
  }

  test("phash table on the sf0.001 media lake: one row per real image " +
    "format, hash stable across the two decode routes") {
    val d = "/root/testdata/sf0.001"
    val t = ImageHash.phashTable(spark, d).collect()
    assert(t.nonEmpty)
    assert(t.map(_.getString(1)).toSet === Set("ppm", "bmp"))
    // recompute one ppm row via the generic table path vs direct codec
    val row = t.find(_.getString(1) == "ppm").get
    val media = Multimodal.syntheticMedia(spark, d)
      .filter(col("id") === row.getLong(0)).collect().head
    val (w, h, rgb) = MediaCodecs.decodePpmRgb(media.getAs[Array[Byte]]("payload"))
    assert(ImageHash.dhash64(w, h, rgb) === row.getLong(4))
  }
}
