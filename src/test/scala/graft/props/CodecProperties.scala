package graft.props

import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll
import graft.llm.{JpegCodec, MediaCodecs}

/** Random-input properties for the binary codecs: lossless formats
  * round-trip EXACTLY on arbitrary dimensions and content; the lossy
  * JPEG path holds its two contracts — DC-only decodes to the exact
  * integer block formula, full-DCT stays within uniform-quantizer error
  * bounds — over the whole (w, h, pixels) space, not just the fixture's
  * multiples-of-8 text cycles. */
object CodecProperties extends Properties("graft.codecs") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(25).withWorkers(1)

  private val dims: Gen[(Int, Int)] =
    Gen.zip(Gen.choose(1, 40), Gen.choose(1, 40))
  private def bytes(n: Int): Gen[Array[Byte]] =
    Gen.listOfN(n, Gen.choose(0, 255)).map(_.map(_.toByte).toArray)

  property("png round-trips exactly on random dims/content") =
    forAll(dims.flatMap { case (w, h) =>
      bytes(3 * w * h).map(b => (w, h, b)) }) { case (w, h, rgb) =>
      val (dw, dh, out) = MediaCodecs.decodePngRgb(MediaCodecs.encodePng(w, h, rgb))
      dw == w && dh == h && out.sameElements(rgb)
    }

  property("jpeg DC-only == the integer block formula on random dims " +
    "(partial blocks included via encoder edge replication)") =
    forAll(dims.flatMap { case (w, h) =>
      bytes(w * h).map(b => (w, h, b)) }) { case (w, h, gray) =>
      val (dw, dh, out) = JpegCodec.decodeJpegGray(
        JpegCodec.encodeJpegGray(w, h, gray, dcOnly = true))
      val bx = (w + 7) / 8; val by = (h + 7) / 8
      def expected(xb: Int, yb: Int): Int = {
        var sum = 0
        var i = 0
        while (i < 64) {
          val px = math.min(xb * 8 + i % 8, w - 1)
          val py = math.min(yb * 8 + i / 8, h - 1)
          sum += gray(py * w + px) & 0xff
          i += 1
        }
        val v = 2 * ((sum - 8128) / 128) + 128
        if (v < 0) 0 else if (v > 255) 255 else v
      }
      dw == w && dh == h && (0 until w * h).forall { p =>
        (out(p) & 0xff) == expected((p % w) / 8, (p / w) / 8)
      }
    }

  property("jpeg full-DCT error stays within the uniform-quantizer bound") =
    forAll(dims.flatMap { case (w, h) =>
      bytes(w * h).map(b => (w, h, b)) }) { case (w, h, gray) =>
      val (dw, dh, out) = JpegCodec.decodeJpegGray(
        JpegCodec.encodeJpegGray(w, h, gray))
      dw == w && dh == h && (0 until w * h).forall { p =>
        math.abs((gray(p) & 0xff) - (out(p) & 0xff)) <= 40
      }
    }

  property("avi container round-trips arbitrary frame batches bit-exactly") =
    forAll(Gen.zip(Gen.choose(8, 24), Gen.choose(8, 24),
      Gen.choose(1, 6), Gen.choose(0L, Long.MaxValue))) {
      case (w, h, n, seed) =>
        var s = seed
        def frame(): Array[Byte] = JpegCodec.encodeJpegGray(w, h,
          Array.fill(w * h) {
            s = s * 6364136223846793005L + 1442695040888963407L
            (s >>> 33).toByte
          })
        val frames = Seq.fill(n)(frame())
        val (dw, dh, out) = MediaCodecs.decodeAviMjpeg(
          MediaCodecs.encodeAviMjpeg(w, h, fps = 10, frames))
        dw == w && dh == h && out.length == n &&
          out.zip(frames).forall { case (a, b) => a.sameElements(b) }
    }
}
