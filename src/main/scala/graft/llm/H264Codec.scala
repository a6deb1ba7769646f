package graft.llm

import Mp4Codec.{BitReader, BitWriter, SpsInfo, escapeRbsp, unescapeRbsp}

/** H.264 / AVC (ITU-T Rec. H.264, ISO/IEC 14496-10) INTRA codec subset:
  * IDR pictures whose macroblocks are I_PCM — the standard's lossless
  * raw-macroblock mode (mb_type 25 in I slices, §7.3.5/§7.4.5), legal in
  * every profile including Constrained Baseline. Nothing here is a
  * private format: the slice layer is the real §7.3.3 slice_header
  * grammar parsed against the ACTIVE SPS/PPS (frame_num width, poc-type
  * arms, deblocking-control presence all honored), NAL payloads carry
  * real §7.4.1 emulation prevention (PCM bytes are arbitrary, so
  * 00 00 0x runs genuinely occur and must be escaped), and frame
  * cropping follows §7.4.2.1.1 (the fixture dims include non-multiples
  * of 16, so the crop window is exercised on real pixel output).
  *
  * Scope, stated exactly: the ENCODER emits I_PCM-only IDR slices
  * (4:2:0, 8-bit); the DECODER accepts CAVLC I slices whose macroblocks
  * are I_PCM and refuses everything else LOUDLY (predicted macroblock
  * types name the spec clause they'd need). Transform/prediction
  * macroblocks (CAVLC residuals, intra prediction, the integer DCT)
  * remain the documented extension point — the container, NAL,
  * parameter-set, and slice layers they'd plug into are all real and
  * spec-tested here and in [[Mp4Codec]].
  *
  * Scale posture: one encode/decode per sample inside `mapPartitions`
  * over the media lake — embarrassingly parallel, no shuffle; the codec
  * allocates only the frame planes.
  */
object H264Codec {

  /** Parsed PPS fields the slice layer consumes (§7.3.2.2) — every flag
    * that changes SLICE HEADER syntax is captured, so a foreign PPS can
    * never silently misalign the slice parse. */
  case class PpsInfo(entropyCabac: Boolean, picInitQp: Int,
                     deblockingControlPresent: Boolean,
                     numSliceGroups: Int,
                     bottomFieldPocPresent: Boolean,
                     redundantPicCntPresent: Boolean)

  def parsePps(nal: Array[Byte]): PpsInfo = {
    require(nal.nonEmpty && (nal(0) & 0x1f) == 8,
      s"not a PPS NAL (type ${if (nal.isEmpty) -1 else nal(0) & 0x1f})")
    val r = new BitReader(unescapeRbsp(nal.drop(1)))
    r.ue(); r.ue()                    // pps id, sps id
    val cabac = r.bit() == 1
    val bottomPoc = r.bit() == 1      // bottom_field_pic_order_in_frame
    val groups = r.ue().toInt + 1
    require(groups == 1, s"FMO slice groups unsupported (got $groups)")
    r.ue(); r.ue()                    // num_ref_idx defaults
    r.bit()                           // weighted_pred_flag
    r.bits(2)                         // weighted_bipred_idc
    val qp = r.se().toInt + 26        // pic_init_qp_minus26
    r.se()                            // pic_init_qs_minus26
    r.se()                            // chroma_qp_index_offset
    val deblock = r.bit() == 1
    r.bit()                           // constrained_intra_pred_flag
    val redundant = r.bit() == 1      // redundant_pic_cnt_present_flag
    PpsInfo(cabac, qp, deblock, groups, bottomPoc, redundant)
  }

  /** One decoded frame, cropped to the SPS display window: full-range
    * 8-bit luma plus the two 4:2:0 chroma planes. */
  case class Frame(width: Int, height: Int,
                   y: Array[Byte], cb: Array[Byte], cr: Array[Byte])

  /** Encode `gray(w*h)` (+ constant chroma) as one all-I_PCM IDR slice
    * NAL (type 5, nal_ref_idc 3). Macroblock padding outside the crop
    * window replicates edge pixels (any value is legal; replication keeps
    * the payload deterministic). Pair with [[Mp4Codec.encodeSps]]/
    * [[Mp4Codec.encodePps]] — the slice header below writes the syntax
    * those parameter sets declare (frame_num u(4), poc type 2, no
    * deblocking override). */
  def encodeIdrPcm(w: Int, h: Int, gray: Array[Int],
                   cbFill: Int = 128, crFill: Int = 128): Array[Byte] = {
    require(gray.length == w * h, s"gray plane must be w*h = ${w * h}")
    require(w % 2 == 0 && h % 2 == 0, "4:2:0 needs even dimensions")
    val mbW = (w + 15) / 16
    val mbH = (h + 15) / 16
    val bw = new BitWriter
    // slice_header (§7.3.3), IDR + I slice against encodeSps/encodePps
    bw.ue(0)                // first_mb_in_slice
    bw.ue(7)                // slice_type: I (all slices of the picture)
    bw.ue(0)                // pic_parameter_set_id
    bw.putBits(0L, 4)       // frame_num, u(log2_max_frame_num = 4)
    bw.ue(0)                // idr_pic_id
    //                      // poc type 2: no poc fields
    bw.putBit(0)            // dec_ref_pic_marking: no_output_of_prior_pics
    bw.putBit(0)            //                      long_term_reference_flag
    bw.se(0)                // slice_qp_delta
    // slice_data (§7.3.4, CAVLC): I slice has no mb_skip_run
    var mb = 0
    while (mb < mbW * mbH) {
      val mbX = (mb % mbW) * 16
      val mbY = (mb / mbW) * 16
      bw.ue(25)             // mb_type: I_PCM
      bw.align()            // pcm_alignment_zero_bit*
      var yy = 0
      while (yy < 16) {
        var xx = 0
        val sy = math.min(mbY + yy, h - 1)
        while (xx < 16) {
          val sx = math.min(mbX + xx, w - 1)
          bw.putBits((gray(sy * w + sx) & 0xff).toLong, 8)
          xx += 1
        }
        yy += 1
      }
      var c = 0              // pcm_sample_chroma: 64 Cb then 64 Cr
      while (c < 128) { bw.putBits(((if (c < 64) cbFill else crFill) & 0xff).toLong, 8); c += 1 }
      mb += 1
    }
    Array(0x65.toByte) ++ escapeRbsp(bw.trailing())
  }

  /** Decode one IDR slice NAL against its SPS/PPS. Accepts exactly the
    * subset documented on the object: single-slice CAVLC I pictures of
    * I_PCM macroblocks; anything else fails with the spec clause it
    * would need. Output is cropped to the SPS display window. */
  def decodeIdr(sps: SpsInfo, pps: PpsInfo, nal: Array[Byte]): Frame = {
    require(nal.nonEmpty && (nal(0) & 0x1f) == 5,
      s"not an IDR slice NAL (type ${if (nal.isEmpty) -1 else nal(0) & 0x1f})")
    require(!pps.entropyCabac, "CABAC entropy coding unsupported (§9.3)")
    require(sps.frameMbsOnly, "interlaced coding unsupported (§7.4.2.1)")
    require(sps.chromaFormatIdc == 1, "only 4:2:0 chroma supported")
    require(sps.mbWidth > 0 && sps.mbHeight > 0,
      "SPS carries no macroblock grid (parse it with Mp4Codec.parseSps)")
    val r = new BitReader(unescapeRbsp(nal.drop(1)))
    require(r.ue() == 0, "multi-slice pictures unsupported (first_mb != 0)")
    val sliceType = r.ue()
    require(sliceType % 5 == 2, s"not an I slice (slice_type $sliceType)")
    r.ue()                               // pic_parameter_set_id
    r.bits(sps.log2MaxFrameNum)          // frame_num
    r.ue()                               // idr_pic_id
    if (sps.pocType == 0) {
      r.bits(sps.log2MaxPocLsb)          // pic_order_cnt_lsb
      if (pps.bottomFieldPocPresent) r.se() // delta_pic_order_cnt_bottom
    } else if (sps.pocType == 1) {
      sys.error("poc type 1 slice fields unsupported (§7.3.3)")
    }
    if (pps.redundantPicCntPresent) r.ue() // redundant_pic_cnt
    r.bit(); r.bit()                     // dec_ref_pic_marking (IDR)
    r.se()                               // slice_qp_delta (PCM ignores QP)
    if (pps.deblockingControlPresent) {
      val idc = r.ue()
      if (idc != 1) { r.se(); r.se() }   // alpha/beta offsets
    }
    val mbW = sps.mbWidth
    val mbH = sps.mbHeight
    val fw = mbW * 16
    val fh = mbH * 16
    val y = new Array[Byte](fw * fh)
    val cb = new Array[Byte]((fw / 2) * (fh / 2))
    val cr = new Array[Byte]((fw / 2) * (fh / 2))
    var mb = 0
    while (mb < mbW * mbH) {
      val mbType = r.ue()
      require(mbType == 25,
        s"mb_type $mbType needs the prediction/transform path " +
          "(I_4x4/I_16x16, §8.3/§8.5) — outside this decoder's subset")
      r.align()
      val mbX = (mb % mbW) * 16
      val mbY = (mb / mbW) * 16
      var yy = 0
      while (yy < 16) {
        var xx = 0
        while (xx < 16) {
          y((mbY + yy) * fw + mbX + xx) = r.u8().toByte
          xx += 1
        }
        yy += 1
      }
      var p = 0
      while (p < 64) {
        cb((mbY / 2 + p / 8) * (fw / 2) + mbX / 2 + p % 8) = r.u8().toByte
        p += 1
      }
      p = 0
      while (p < 64) {
        cr((mbY / 2 + p / 8) * (fw / 2) + mbX / 2 + p % 8) = r.u8().toByte
        p += 1
      }
      mb += 1
    }
    require(r.bit() == 1, "rbsp_stop_one_bit missing after last macroblock")
    require(r.bitsLeft < 8, s"${r.bitsLeft} bits of trailing garbage")
    // crop to the display window (§7.4.2.1.1), luma units in SpsInfo
    val ow = fw - sps.cropLeft - sps.cropRight
    val oh = fh - sps.cropTop - sps.cropBottom
    val oy = new Array[Byte](ow * oh)
    var row = 0
    while (row < oh) {
      System.arraycopy(y, (sps.cropTop + row) * fw + sps.cropLeft,
        oy, row * ow, ow)
      row += 1
    }
    val ocb = new Array[Byte]((ow / 2) * (oh / 2))
    val ocr = new Array[Byte]((ow / 2) * (oh / 2))
    row = 0
    while (row < oh / 2) {
      System.arraycopy(cb, (sps.cropTop / 2 + row) * (fw / 2) + sps.cropLeft / 2,
        ocb, row * (ow / 2), ow / 2)
      System.arraycopy(cr, (sps.cropTop / 2 + row) * (fw / 2) + sps.cropLeft / 2,
        ocr, row * (ow / 2), ow / 2)
      row += 1
    }
    Frame(ow, oh, oy, ocb, ocr)
  }

  /** Decode the single IDR picture of one AVCC sample (length-prefixed
    * NALs) against an avcC record — the per-sample kernel the MP4
    * pipeline maps. Non-VCL NALs (SEI, in-band parameter sets) are
    * skipped like a real decoder's NAL dispatch; exactly one IDR slice
    * must remain. */
  def decodeAvccSample(avcC: Array[Byte], sample: Array[Byte]): Frame = {
    val sps = Mp4Codec.parseSps(Mp4Codec.avcCSps(avcC))
    val pps = parsePps(avcCPps(avcC))
    val idrs = Mp4Codec.avccNals(sample).filter(n => (n(0) & 0x1f) == 5)
    require(idrs.size == 1, s"expected exactly one IDR NAL, got ${idrs.size}")
    decodeIdr(sps, pps, idrs.head)
  }

  /** First PPS NAL out of an avcC record (ISO 14496-15 §5.3.3.1 —
    * PPS array follows the SPS array). */
  def avcCPps(rec: Array[Byte]): Array[Byte] = {
    require(rec.length >= 8 && (rec(0) & 0xff) == 1, "avcC: bad record")
    var p = 5
    val nSps = rec(p) & 0x1f; p += 1
    var i = 0
    while (i < nSps) {
      val len = ((rec(p) & 0xff) << 8) | (rec(p + 1) & 0xff)
      p += 2 + len; i += 1
    }
    val nPps = rec(p) & 0xff; p += 1
    require(nPps >= 1, "avcC: no PPS")
    val len = ((rec(p) & 0xff) << 8) | (rec(p + 1) & 0xff)
    require(p + 2 + len <= rec.length, "avcC: PPS overruns record")
    java.util.Arrays.copyOfRange(rec, p + 2, p + 2 + len)
  }
}
