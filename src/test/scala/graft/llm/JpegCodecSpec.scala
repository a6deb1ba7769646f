package graft.llm

import graft.SparkSpec

/** Baseline-JPEG codec gates: the DC-only integer contract the oracle
  * is built on, full-DCT round-trip error bounds (the lossy path has
  * nothing bit-exact to pin), restart-marker machinery, byte
  * un-stuffing, color/subsampling, partial MCUs, and the loud
  * rejections (progressive, truncation). */
class JpegCodecSpec extends SparkSpec {

  /** deterministic LCG pixels — no Math.random in fixtures */
  private def lcgBytes(n: Int, seed: Long): Array[Byte] = {
    var s = seed
    Array.fill(n) {
      s = s * 6364136223846793005L + 1442695040888963407L
      (s >>> 33).toByte
    }
  }

  test("DC-only grayscale decodes to the EXACT integer contract " +
    "(2*trunc((blockSum-8128)/128)+128 flat per block)") {
    val w = 24; val h = 16
    val gray = lcgBytes(w * h, seed = 7)
    val decoded = JpegCodec.decodeJpegGray(
      JpegCodec.encodeJpegGray(w, h, gray, dcOnly = true))
    assert((decoded._1, decoded._2) === (w, h))
    val out = decoded._3
    for (by <- 0 until h / 8; bx <- 0 until w / 8) {
      var sum = 0
      for (y <- 0 until 8; x <- 0 until 8)
        sum += gray((by * 8 + y) * w + bx * 8 + x) & 0xff
      val expected = 2 * ((sum - 8128) / 128) + 128
      for (y <- 0 until 8; x <- 0 until 8)
        assert((out((by * 8 + y) * w + bx * 8 + x) & 0xff) === expected,
          s"block ($by,$bx) pixel ($y,$x)")
    }
  }

  test("full-DCT grayscale round-trip stays within uniform-quantizer " +
    "error bounds, and byte stuffing occurs and decodes across a batch") {
    var stuffed = 0
    for (seed <- 1 to 40) {
      val w = 40; val h = 24
      val gray = lcgBytes(w * h, seed)
      val enc = JpegCodec.encodeJpegGray(w, h, gray)
      // count FF00 sequences after SOS (entropy-data stuffing)
      val sos = (0 until enc.length - 1).find(i =>
        (enc(i) & 0xff) == 0xff && (enc(i + 1) & 0xff) == 0xda).get
      stuffed += (sos until enc.length - 1).count(i =>
        (enc(i) & 0xff) == 0xff && (enc(i + 1) & 0xff) == 0x00)
      val (dw, dh, out) = JpegCodec.decodeJpegGray(enc)
      assert((dw, dh) === (w, h))
      val errs = gray.indices.map(i => math.abs((gray(i) & 0xff) - (out(i) & 0xff)))
      assert(errs.max <= 32, s"seed $seed: max err ${errs.max}")
      assert(errs.sum.toDouble / errs.size <= 8.0,
        s"seed $seed: mean err ${errs.sum.toDouble / errs.size}")
    }
    // white-noise blocks make large AC values: stuffed 0xFF bytes are
    // statistically unavoidable across 40 images — if none appeared,
    // the stuffing path was never exercised and this gate is vacuous
    assert(stuffed > 0, "no byte stuffing occurred across the batch")
  }

  test("restart intervals: DRI+RSTn round-trips identically to the " +
    "unrestarted stream; a corrupted RST counter fails loudly") {
    val w = 48; val h = 16 // 12 blocks -> RSTs at every 5-block boundary
    val gray = lcgBytes(w * h, seed = 99)
    val plain = JpegCodec.decodeJpegGray(JpegCodec.encodeJpegGray(w, h, gray))
    val rst = JpegCodec.encodeJpegGray(w, h, gray, restartInterval = 5)
    val viaRst = JpegCodec.decodeJpegGray(rst)
    assert(viaRst._3.toSeq === plain._3.toSeq,
      "restart markers must not change decoded pixels")
    // corrupt the first RST marker's counter (D0 -> D5): the modulo
    // check in BitReader.restart must reject it
    val bad = rst.clone()
    val i = (0 until bad.length - 1).find(i =>
      (bad(i) & 0xff) == 0xff && (bad(i + 1) & 0xff) == 0xd0).get
    bad(i + 1) = 0xd5.toByte
    intercept[java.io.IOException] { JpegCodec.decodeJpegGray(bad) }
  }

  test("color round-trips: 4:4:4 within conversion+quantizer bounds; " +
    "4:2:0 exercises MCU interleave + upsampling on smooth content") {
    val w = 32; val h = 24
    // smooth gradients per channel: JPEG's favorable case, so bounds
    // stay tight enough to catch real decode bugs
    val rgb = Array.tabulate(3 * w * h) { i =>
      val p = i / 3; val x = p % w; val y = p / w
      (i % 3 match {
        case 0 => x * 8
        case 1 => y * 10
        case 2 => (x + y) * 4
      }).min(255).toByte
    }
    for (sub <- Seq(false, true)) {
      val (dw, dh, out) = JpegCodec.decodeJpegRgb(
        JpegCodec.encodeJpegRgb(w, h, rgb, subsample2x2 = sub))
      assert((dw, dh) === (w, h))
      val errs = rgb.indices.map(i => math.abs((rgb(i) & 0xff) - (out(i) & 0xff)))
      val bound = if (sub) 48 else 32 // chroma box-downsample adds error
      assert(errs.max <= bound, s"sub=$sub: max err ${errs.max}")
      assert(errs.sum.toDouble / errs.size <= 10.0,
        s"sub=$sub: mean err ${errs.sum.toDouble / errs.size}")
    }
  }

  test("non-multiple-of-8 dimensions: MCU padding is cropped, interior " +
    "error stays bounded") {
    val w = 21; val h = 13
    val gray = Array.tabulate(w * h)(i => ((i % w) * 11 + (i / w) * 7).min(255).toByte)
    val (dw, dh, out) = JpegCodec.decodeJpegGray(JpegCodec.encodeJpegGray(w, h, gray))
    assert((dw, dh) === (w, h))
    assert(out.length === w * h)
    val errs = gray.indices.map(i => math.abs((gray(i) & 0xff) - (out(i) & 0xff)))
    assert(errs.max <= 32, s"max err ${errs.max}")
  }

  test("loud rejections: progressive SOF2, truncated entropy stream, " +
    "missing SOI") {
    val ok = JpegCodec.encodeJpegGray(16, 16, lcgBytes(256, 5))
    val sof2 = ok.clone()
    val i = (0 until sof2.length - 1).find(i =>
      (sof2(i) & 0xff) == 0xff && (sof2(i + 1) & 0xff) == 0xc0).get
    sof2(i + 1) = 0xc2.toByte
    val e = intercept[java.io.IOException] { JpegCodec.decodeJpegGray(sof2) }
    assert(e.getMessage.contains("baseline subset"))
    intercept[java.io.IOException] {
      JpegCodec.decodeJpegGray(ok.take(ok.length - 20))
    }
    intercept[IllegalArgumentException] {
      JpegCodec.decodeJpegGray(ok.drop(2)) // SOI gone
    }
  }

  test("AVI/MJPEG container round-trip: chunk grammar, word alignment " +
    "(odd-length frames), frame order, and loud codec/structure checks") {
    val w = 16; val h = 16
    // full-DCT frames of varying content -> varying (often odd) sizes,
    // so the word-alignment padding path is really exercised
    val frames = (0 until 7).map(f =>
      JpegCodec.encodeJpegGray(w, h, lcgBytes(w * h, seed = 100 + f)))
    assert(frames.exists(_.length % 2 == 1),
      "fixture should include an odd-length frame to prove padding")
    val avi = MediaCodecs.encodeAviMjpeg(w, h, fps = 10, frames)
    val (dw, dh, out) = MediaCodecs.decodeAviMjpeg(avi)
    assert((dw, dh) === (w, h))
    assert(out.length === 7)
    out.zip(frames).zipWithIndex.foreach { case ((a, b), i) =>
      assert(a.toSeq === b.toSeq, s"frame $i bytes differ")
    }
    // decoded frames are themselves decodable and match direct decode
    out.zipWithIndex.foreach { case (fr, i) =>
      val direct = JpegCodec.decodeJpegGray(frames(i))._3
      assert(JpegCodec.decodeJpegGray(fr)._3.toSeq === direct.toSeq)
    }
    // a non-MJPG codec is refused with the codec named
    val bad = avi.clone()
    val i = (0 until bad.length - 3).find(i =>
      bad.slice(i, i + 4).map(_.toChar).mkString == "MJPG").get
    bad(i) = 'H'.toByte; bad(i + 1) = '2'.toByte
    bad(i + 2) = '6'.toByte; bad(i + 3) = '4'.toByte
    val e = intercept[IllegalArgumentException] {
      MediaCodecs.decodeAviMjpeg(bad)
    }
    assert(e.getMessage.contains("H264"), e.getMessage)
    intercept[IllegalArgumentException] {
      MediaCodecs.decodeAviMjpeg("RIFFxxxxWAVE".getBytes)
    }
  }

  test("fixture contract: mkJpegRow streams decode to the oracle's " +
    "block arithmetic over the text-byte cycle") {
    val text = "The quick brown fox jumps over the lazy dog, 0123456789!"
    val id = 3L // id%5==3 slot; w=(3%8+2)*8=40, h=(3%4+2)*8=40
    val row = Multimodal.mkJpegRow(id, text)
    assert((row.width, row.height) === (40, 40))
    val (w, h, out) = JpegCodec.decodeJpegGray(row.payload)
    assert((w, h) === (40, 40))
    val bytes = text.getBytes("UTF-8")
    var expectedLum = 0L
    for (by <- 0 until h / 8; bx <- 0 until w / 8) {
      var sum = 0
      for (y <- 0 until 8; x <- 0 until 8) {
        val p = (by * 8 + y) * w + bx * 8 + x
        sum += bytes(p % bytes.length) & 0xff
      }
      expectedLum += 64L * (2 * ((sum - 8128) / 128) + 128)
    }
    assert(out.map(_ & 0xff).map(_.toLong).sum === expectedLum)
  }
}
