package graft.llm

import org.scalatest.funsuite.AnyFunSuite

/** The H.264 I_PCM intra subset: byte-exact round trips through the
  * real slice grammar (including crop windows and emulation
  * prevention), the avcC/AVCC sample path, and LOUD refusal of every
  * syntax outside the declared subset. */
class H264CodecSpec extends AnyFunSuite {

  private def gray(w: Int, h: Int, seed: Int): Array[Int] =
    Array.tabulate(w * h)(i => ((i * 31 + seed * 17) ^ (i >> 3)) & 0xff)

  private def rt(w: Int, h: Int, g: Array[Int]): H264Codec.Frame = {
    val sps = Mp4Codec.parseSps(Mp4Codec.encodeSps(w, h))
    val pps = H264Codec.parsePps(Mp4Codec.encodePps())
    H264Codec.decodeIdr(sps, pps, H264Codec.encodeIdrPcm(w, h, g))
  }

  test("round trip is byte-exact on mb-aligned dims; chroma carries the fill") {
    val (w, h) = (32, 16)
    val g = gray(w, h, 1)
    val f = rt(w, h, g)
    assert((f.width, f.height) == (w, h))
    assert(f.y.map(_ & 0xff).toSeq == g.toSeq)
    assert(f.cb.forall(b => (b & 0xff) == 128) && f.cb.length == w * h / 4)
    assert(f.cr.forall(b => (b & 0xff) == 128))
  }

  test("non-multiple-of-16 dims exercise the real crop window: padding " +
    "macroblock columns/rows are decoded then cropped away exactly") {
    val (w, h) = (24, 40) // mb grid 2x3 = 32x48, crop right 8 / bottom 8
    val sps = Mp4Codec.parseSps(Mp4Codec.encodeSps(w, h))
    assert((sps.mbWidth, sps.mbHeight) == (2, 3))
    assert((sps.cropRight, sps.cropBottom) == (8, 8))
    assert((sps.cropLeft, sps.cropTop) == (0, 0))
    assert((sps.log2MaxFrameNum, sps.pocType) == (4, 2))
    val g = gray(w, h, 2)
    val f = rt(w, h, g)
    assert((f.width, f.height) == (w, h))
    assert(f.y.map(_ & 0xff).toSeq == g.toSeq)
  }

  test("an all-zero frame forces real emulation prevention: the NAL " +
    "contains 00 00 03 escapes and still round-trips byte-exact") {
    val (w, h) = (16, 16)
    val g = Array.fill(w * h)(0)
    val nal = H264Codec.encodeIdrPcm(w, h, g, cbFill = 0, crFill = 0)
    val escapes = nal.sliding(3).count(s =>
      s(0) == 0 && s(1) == 0 && s(2) == 3)
    assert(escapes > 0, "zero PCM runs must be escaped (§7.4.1)")
    val sps = Mp4Codec.parseSps(Mp4Codec.encodeSps(w, h))
    val pps = H264Codec.parsePps(Mp4Codec.encodePps())
    val f = H264Codec.decodeIdr(sps, pps, nal)
    assert(f.y.forall(_ == 0) && f.cb.forall(_ == 0) && f.cr.forall(_ == 0))
  }

  test("the avcC/AVCC sample path: mux with encodeMp4Avc, demux, decode " +
    "each sample against the record's own SPS/PPS") {
    val (w, h) = (40, 24)
    val frames = (0 until 3).map(k => gray(w, h, k))
    val samples = frames.map { g =>
      val nal = H264Codec.encodeIdrPcm(w, h, g)
      Array[Byte](((nal.length >> 24) & 0xff).toByte,
        ((nal.length >> 16) & 0xff).toByte,
        ((nal.length >> 8) & 0xff).toByte,
        (nal.length & 0xff).toByte) ++ nal
    }
    val t = Mp4Codec.demuxMp4(
      Mp4Codec.encodeMp4Avc(w, h, fps = 25, samples, samplesPerChunk = 2))
    assert(t.codec == "avc1" && t.samples.length == 3)
    val rec = t.avcC.get
    frames.zipWithIndex.foreach { case (g, k) =>
      val f = H264Codec.decodeAvccSample(rec, t.samples(k))
      assert((f.width, f.height) == (w, h))
      assert(f.y.map(_ & 0xff).toSeq == g.toSeq, s"frame $k")
    }
  }

  test("parsePps recovers encodePps's declared fields") {
    val pps = H264Codec.parsePps(Mp4Codec.encodePps())
    assert(!pps.entropyCabac)
    assert(pps.picInitQp == 26)
    assert(!pps.deblockingControlPresent)
    assert(pps.numSliceGroups == 1)
  }

  test("foreign PPS flags that change slice-header syntax are honored: " +
    "bottom-field poc + redundant_pic_cnt fields parse without " +
    "misaligning the macroblock layer") {
    // hand-built PPS: CABAC off, bottom_field_poc ON, redundant ON
    val bw = new Mp4Codec.BitWriter
    bw.ue(0); bw.ue(0)   // ids
    bw.putBit(0)         // CAVLC
    bw.putBit(1)         // bottom_field_pic_order_in_frame_present
    bw.ue(0)             // one slice group
    bw.ue(0); bw.ue(0)   // ref idx defaults
    bw.putBit(0); bw.putBits(0, 2) // weighted pred/bipred
    bw.se(0); bw.se(0); bw.se(0)   // qp/qs/chroma offsets
    bw.putBit(0)         // deblocking control
    bw.putBit(0)         // constrained intra
    bw.putBit(1)         // redundant_pic_cnt_present
    val ppsNal = Array(0x68.toByte) ++ Mp4Codec.escapeRbsp(bw.trailing())
    val pps = H264Codec.parsePps(ppsNal)
    assert(pps.bottomFieldPocPresent && pps.redundantPicCntPresent)
    // poc-type-0 SPS so the bottom-field arm is actually on the path
    val spsW = new Mp4Codec.BitWriter
    spsW.putBits(66, 8); spsW.putBits(0xc0L, 8); spsW.putBits(30, 8)
    spsW.ue(0)           // sps id
    spsW.ue(0)           // log2_max_frame_num_minus4
    spsW.ue(0)           // pic_order_cnt_type 0
    spsW.ue(0)           //   log2_max_pic_order_cnt_lsb_minus4
    spsW.ue(1); spsW.putBit(0) // max refs, no gaps
    spsW.ue(0); spsW.ue(0)     // 1x1 MBs = 16x16
    spsW.putBit(1); spsW.putBit(1) // frame_mbs_only, direct_8x8
    spsW.putBit(0); spsW.putBit(0) // no crop, no vui
    val sps = Mp4Codec.parseSps(
      Array(0x67.toByte) ++ Mp4Codec.escapeRbsp(spsW.trailing()))
    assert((sps.pocType, sps.log2MaxPocLsb) == ((0, 4)))
    // slice against THAT pair: poc lsb + delta_bottom + redundant present
    val g = gray(16, 16, 9)
    val sl = new Mp4Codec.BitWriter
    sl.ue(0); sl.ue(7); sl.ue(0)   // first_mb, I, pps id
    sl.putBits(0L, 4)              // frame_num
    sl.ue(0)                       // idr_pic_id
    sl.putBits(0L, 4)              // pic_order_cnt_lsb
    sl.se(0)                       // delta_pic_order_cnt_bottom
    sl.ue(0)                       // redundant_pic_cnt
    sl.putBit(0); sl.putBit(0)     // dec_ref_pic_marking
    sl.se(0)                       // slice_qp_delta
    sl.ue(25); sl.align()          // I_PCM
    g.foreach(v => sl.putBits(v.toLong, 8))
    (0 until 128).foreach(_ => sl.putBits(128L, 8))
    val nal = Array(0x65.toByte) ++ Mp4Codec.escapeRbsp(sl.trailing())
    val f = H264Codec.decodeIdr(sps, pps, nal)
    assert(f.y.map(_ & 0xff).toSeq == g.toSeq)
  }

  test("the MP4-lake avc1 fixture rows decode to the text-byte pixel " +
    "contract the DuckDB oracle assumes") {
    val text = ('a' to 'z').mkString * 40
    val row = Multimodal.mkMp4Row(7L, text) // odd id -> avc1
    assert(row.codec == "avc1")
    val t = Mp4Codec.demuxMp4(row.payload)
    val bytes = text.getBytes("UTF-8")
    (0 until t.samples.length).foreach { k =>
      val f = H264Codec.decodeAvccSample(t.avcC.get, t.samples(k))
      assert((f.width, f.height) == ((row.width, row.height)))
      f.y.zipWithIndex.foreach { case (b, i) =>
        assert((b & 0xff) ==
          (bytes(((k.toLong * row.width * row.height + i) % bytes.length).toInt) & 0xff),
          s"sample $k pixel $i")
      }
    }
  }

  test("everything outside the subset refuses loudly, naming the clause") {
    val sps = Mp4Codec.parseSps(Mp4Codec.encodeSps(16, 16))
    val pps = H264Codec.parsePps(Mp4Codec.encodePps())
    // a predicted-macroblock slice: same header, mb_type 0 (I_4x4)
    val bw = new Mp4Codec.BitWriter
    bw.ue(0); bw.ue(7); bw.ue(0); bw.putBits(0L, 4); bw.ue(0)
    bw.putBit(0); bw.putBit(0); bw.se(0)
    bw.ue(0) // mb_type I_4x4
    val i4x4 = Array(0x65.toByte) ++ Mp4Codec.escapeRbsp(bw.trailing())
    val e = intercept[IllegalArgumentException] {
      H264Codec.decodeIdr(sps, pps, i4x4)
    }
    assert(e.getMessage.contains("I_4x4"))
    // a non-IDR NAL
    assertThrows[IllegalArgumentException] {
      H264Codec.decodeIdr(sps, pps, Array(0x41.toByte, 0x00))
    }
    // truncated PCM payload must not decode silently
    val good = H264Codec.encodeIdrPcm(16, 16, gray(16, 16, 3))
    assertThrows[Exception] {
      H264Codec.decodeIdr(sps, pps, good.take(good.length / 2))
    }
  }
}
