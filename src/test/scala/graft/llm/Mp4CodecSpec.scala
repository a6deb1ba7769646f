package graft.llm

import graft.SparkSpec

/** ISO BMFF mux/demux + H.264 parameter-set gates: sample-table
  * round-trips (incl. multi-sample chunk runs and the short final
  * chunk), SPS Exp-Golomb encode↔parse across a dimension grid with
  * and without frame cropping, emulation-prevention escaping, avcC
  * extraction, foreign-SPS arms (high profile / poc type 0), and the
  * loud rejections (truncated boxes, missing tables, bad NAL type). */
class Mp4CodecSpec extends SparkSpec {

  private def lcgBytes(n: Int, seed: Long): Array[Byte] = {
    var s = seed
    Array.fill(n) {
      s = s * 6364136223846793005L + 1442695040888963407L
      (s >>> 33).toByte
    }
  }

  test("mjpeg mp4 round-trips samples bit-exactly through the real " +
    "stts/stsc/stsz/stco tables (1 sample per chunk)") {
    val frames = (0 until 5).map(i => lcgBytes(40 + 7 * i, seed = i + 1))
    val t = Mp4Codec.demuxMp4(Mp4Codec.encodeMp4Mjpeg(32, 16, 10, frames))
    assert(t.codec === "jpeg")
    assert((t.width, t.height) === (32, 16))
    assert(t.samples.length === 5)
    frames.zip(t.samples).foreach { case (a, b) => assert(a.toSeq === b.toSeq) }
    assert(t.timescale === 90000L)
    assert(t.duration === 5L * 9000L)
    assert(t.avcC.isEmpty)
  }

  test("multi-sample chunk runs expand correctly (3/chunk with a short " +
    "final chunk exercises two stsc runs)") {
    val frames = (0 until 7).map(i => lcgBytes(10 + i, seed = 100 + i))
    val t = Mp4Codec.demuxMp4(
      Mp4Codec.encodeMp4Mjpeg(16, 16, 25, frames, samplesPerChunk = 3))
    assert(t.samples.length === 7)
    frames.zip(t.samples).foreach { case (a, b) => assert(a.toSeq === b.toSeq) }
  }

  test("avc1 track carries a parseable real SPS in its avcC record") {
    val samples = Seq(Array[Byte](0, 0, 0, 2, 0x65, 0x11))
    val t = Mp4Codec.demuxMp4(Mp4Codec.encodeMp4Avc(56, 24, 25, samples))
    assert(t.codec === "avc1")
    val sps = Mp4Codec.parseSps(Mp4Codec.avcCSps(t.avcC.get))
    assert((sps.profileIdc, sps.levelIdc, sps.width, sps.height)
      === ((66, 30, 56, 24)))
    assert((sps.mbWidth, sps.mbHeight) === ((4, 2)))
    assert((sps.cropRight, sps.cropBottom) === ((8, 8)))
    val nals = Mp4Codec.avccNals(t.samples.head)
    assert(nals.length === 1 && nals.head.toSeq === Seq[Byte](0x65, 0x11))
  }

  test("SPS encode↔parse round-trips across a dimension grid incl. " +
    "non-multiple-of-16 dims (frame cropping arm)") {
    for (w <- Seq(16, 24, 48, 56, 640, 1920); h <- Seq(16, 24, 40, 1080)) {
      val info = Mp4Codec.parseSps(Mp4Codec.encodeSps(w, h))
      assert(info.width === w, s"w for ${w}x$h")
      assert(info.height === h, s"h for ${w}x$h")
      assert(info.profileIdc === 66)
    }
  }

  test("emulation prevention: escape inserts 0x03 after 00 00 before " +
    "{00..03} and unescape inverts it; SPS with zero runs survives") {
    val rbsp = Array[Byte](0, 0, 0, 0, 0, 1, 0, 0, 2, 0, 0, 3, 7, 0, 0)
    val escaped = Mp4Codec.escapeRbsp(rbsp)
    // H.264 §7.4.1: 00 00 {00,01,02} must not survive escaping
    // (00 00 03 is the emulation-prevention sequence itself and is legal)
    escaped.sliding(3).foreach { t3 =>
      assert(!(t3(0) == 0 && t3(1) == 0 && (t3(2) & 0xff) <= 2),
        s"unescaped run in ${escaped.mkString(",")}")
    }
    assert(Mp4Codec.unescapeRbsp(escaped).toSeq === rbsp.toSeq)
    // a real SPS is mostly zero bits — its RBSP must already contain
    // escapes for some dims; prove decode still lands exactly
    val info = Mp4Codec.parseSps(Mp4Codec.encodeSps(4096, 2048))
    assert((info.width, info.height) === (4096, 2048))
  }

  test("foreign SPS arms parse: high profile (chroma idc, bit depths) " +
    "and pic_order_cnt_type 0 do not derail the field walk") {
    // hand-built high-profile SPS, bit-for-bit per H.264 §7.3.2.1
    val bits = new StringBuilder
    def u(v: Long, n: Int): Unit =
      bits ++= (0 until n).reverse.map(i => ((v >> i) & 1).toString).mkString
    def ue(v: Long): Unit = {
      val k = v + 1
      val z = 63 - java.lang.Long.numberOfLeadingZeros(k)
      u(0, z); u(k, z + 1)
    }
    u(100, 8); u(0, 8); u(31, 8) // profile 100, constraints, level 3.1
    ue(0)                        // sps id
    ue(1)                        // chroma_format_idc 4:2:0
    ue(0); ue(0)                 // bit depths luma/chroma -8
    u(0, 1)                      // transform bypass
    u(0, 1)                      // no scaling matrix
    ue(4)                        // log2_max_frame_num_minus4
    ue(0)                        // pic_order_cnt_type 0
    ue(4)                        //   log2_max_pic_order_cnt_lsb_minus4
    ue(2); u(0, 1)               // max refs, no gaps
    ue(19); ue(10)               // 20x11 MBs = 320x176
    u(1, 1)                      // frame_mbs_only
    u(1, 1)                      // direct_8x8
    u(0, 1)                      // no cropping
    u(0, 1)                      // no VUI
    bits += '1'                  // rbsp stop bit
    while (bits.length % 8 != 0) bits += '0'
    val rbsp = bits.toString.grouped(8)
      .map(Integer.parseInt(_, 2).toByte).toArray
    val info = Mp4Codec.parseSps(Array(0x67.toByte) ++ rbsp)
    assert((info.profileIdc, info.levelIdc, info.width, info.height)
      === ((100, 31, 320, 176)))
    // the slice-layer fields the decoder consumes came off THIS bitstream
    assert((info.log2MaxFrameNum, info.pocType, info.log2MaxPocLsb)
      === ((8, 0, 8)))
    assert((info.mbWidth, info.mbHeight, info.chromaFormatIdc)
      === ((20, 11, 1)))
  }

  test("loud rejections: truncated box, missing sample tables, bad NAL") {
    val good = Mp4Codec.encodeMp4Mjpeg(16, 16, 10, Seq(Array[Byte](1, 2, 3)))
    intercept[IllegalArgumentException] {
      Mp4Codec.demuxMp4(good.dropRight(6))
    }
    intercept[IllegalArgumentException] {
      Mp4Codec.parseSps(Array[Byte](0x68, 0))
    }
    intercept[IllegalArgumentException] {
      Mp4Codec.avcCSps(Array[Byte](0, 0))
    }
  }

  test("mkMp4Row fixture rows demux to their id formulas (both codecs, " +
    "varying chunking), matching the q_multimodal_mp4_meta oracle") {
    for (id <- Seq(3L, 8L, 13L, 18L, 23L, 28L)) {
      val text = ('a' to 'z').mkString * 20
      val row = Multimodal.mkMp4Row(id, text)
      val t = Mp4Codec.demuxMp4(row.payload)
      assert(t.codec === row.codec, s"id $id")
      assert(t.samples.length === row.n_samples, s"id $id")
      if (row.codec == "jpeg") {
        assert((t.width, t.height) === (row.width, row.height), s"id $id")
        val (w, h, _) = JpegCodec.decodeJpegGray(t.samples.head)
        assert((w, h) === (row.width, row.height), s"id $id frame dims")
      } else {
        val sps = Mp4Codec.parseSps(Mp4Codec.avcCSps(t.avcC.get))
        assert((sps.width, sps.height) === (row.width, row.height), s"id $id")
        assert((sps.profileIdc, sps.levelIdc) === (66, 30), s"id $id")
      }
    }
  }
}
