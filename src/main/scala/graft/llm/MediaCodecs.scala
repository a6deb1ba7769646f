package graft.llm

import java.nio.{ByteBuffer, ByteOrder}

/** Pure-JVM media codecs for the multimodal pipeline: PPM P6 (binary RGB
  * image), BMP 24-bit BI_RGB (the little-endian/bottom-up/row-padded
  * classic), PNG 8-bit truecolor (a REAL compressed format — chunk
  * grammar + CRC32 + zlib DEFLATE via java.util.zip + all five scanline
  * filters, from the public ISO/IEC 15948 spec), WAV PCM16 (RIFF
  * audio), and — since the JpegCodec landed — MJPEG-in-AVI video (the
  * RIFF/AVI container walk below + one baseline JPEG decode per frame)
  * — all decodable without native libraries, which is exactly what
  * this container offers. Every format in the media lake now has a
  * REAL decoder; `Multimodal.decodeStub` remains only as the
  * documented extension point for formats with no pure-JVM route
  * (e.g. H.264), exercised by spec, not by fixture rows.
  */
object MediaCodecs {

  // ------------------------------------------------------------ PPM P6 --

  /** Encode w×h RGB bytes (r,g,b interleaved, len = 3wh) as PPM P6. */
  def encodePpm(w: Int, h: Int, rgb: Array[Byte]): Array[Byte] = {
    require(rgb.length == 3 * w * h, s"rgb length ${rgb.length} != 3*$w*$h")
    val header = s"P6\n$w $h\n255\n".getBytes("US-ASCII")
    val out = new Array[Byte](header.length + rgb.length)
    System.arraycopy(header, 0, out, 0, header.length)
    System.arraycopy(rgb, 0, out, header.length, rgb.length)
    out
  }

  /** Decode PPM P6 → (w, h, raw RGB bytes, r,g,b interleaved, top-down)
    * — the exact inverse of encodePpm. Handles the format's token
    * grammar: '#' comments and arbitrary whitespace between the magic,
    * dims, and maxval tokens. The luma decoder below builds on this so
    * header parsing has a single source of truth. */
  def decodePpmRgb(bytes: Array[Byte]): (Int, Int, Array[Byte]) = {
    var i = 0
    def skipWs(): Unit = {
      var go = true
      while (go && i < bytes.length) {
        val c = bytes(i).toChar
        if (c == '#') { while (i < bytes.length && bytes(i) != '\n') i += 1 }
        else if (c.isWhitespace) i += 1
        else go = false
      }
    }
    def token(): String = {
      skipWs()
      val start = i
      while (i < bytes.length && !bytes(i).toChar.isWhitespace) i += 1
      new String(bytes, start, i - start, "US-ASCII")
    }
    require(token() == "P6", "not a PPM P6 payload")
    val w = token().toInt
    val h = token().toInt
    val maxval = token().toInt
    require(maxval == 255, s"unsupported PPM maxval $maxval")
    i += 1 // exactly one whitespace byte after maxval, per spec
    val n = w * h
    require(bytes.length - i >= 3 * n, "truncated PPM payload")
    (w, h, java.util.Arrays.copyOfRange(bytes, i, i + 3 * n))
  }

  /** Decode PPM P6 → (w, h, grayscale luma in [0,1], Rec.601 weights). */
  def decodePpm(bytes: Array[Byte]): (Int, Int, Array[Float]) = {
    val (w, h, rgb) = decodePpmRgb(bytes)
    (w, h, rgbToLuma(rgb))
  }

  /** Shared Rec.601 luma kernel: interleaved RGB bytes → [0,1] floats. */
  def rgbToLuma(rgb: Array[Byte]): Array[Float] = {
    val n = rgb.length / 3
    val px = new Array[Float](n)
    var k = 0
    while (k < n) {
      val r = rgb(3 * k) & 0xff
      val g = rgb(3 * k + 1) & 0xff
      val b = rgb(3 * k + 2) & 0xff
      px(k) = (0.299f * r + 0.587f * g + 0.114f * b) / 255.0f
      k += 1
    }
    px
  }

  // --------------------------------------------------- BMP 24-bit BI_RGB --

  /** Encode w×h RGB bytes (r,g,b interleaved, len = 3wh) as a classic
    * 54-byte-header uncompressed BMP: little-endian fields, BGR byte
    * order, BOTTOM-UP row order, rows padded to 4-byte boundaries — the
    * trifecta of gotchas that makes BMP a genuinely distinct decode path
    * from PPM's top-down big-readable ASCII header. */
  def encodeBmp(w: Int, h: Int, rgb: Array[Byte]): Array[Byte] = {
    require(rgb.length == 3 * w * h, s"rgb length ${rgb.length} != 3*$w*$h")
    val rowBytes = (3 * w + 3) / 4 * 4
    val dataLen = rowBytes * h
    val buf = ByteBuffer.allocate(54 + dataLen).order(ByteOrder.LITTLE_ENDIAN)
    buf.put('B'.toByte).put('M'.toByte)
      .putInt(54 + dataLen).putShort(0).putShort(0).putInt(54)
      .putInt(40).putInt(w).putInt(h) // positive height = bottom-up
      .putShort(1).putShort(24).putInt(0).putInt(dataLen)
      .putInt(2835).putInt(2835).putInt(0).putInt(0)
    var y = h - 1
    while (y >= 0) { // file rows bottom-up
      var x = 0
      while (x < w) {
        val k = 3 * (y * w + x)
        buf.put(rgb(k + 2)).put(rgb(k + 1)).put(rgb(k)) // BGR
        x += 1
      }
      var pad = rowBytes - 3 * w
      while (pad > 0) { buf.put(0.toByte); pad -= 1 }
      y -= 1
    }
    buf.array()
  }

  /** Decode 24-bit BI_RGB BMP → (w, h, raw RGB bytes, r,g,b interleaved,
    * top-down) — the exact inverse of encodeBmp: undoes the BGR byte
    * order, the bottom-up row order, and the 4-byte row padding. */
  def decodeBmpRgb(bytes: Array[Byte]): (Int, Int, Array[Byte]) = {
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    require(bytes.length >= 54 &&
      buf.get(0) == 'B'.toByte && buf.get(1) == 'M'.toByte, "not a BMP")
    val dataOff = buf.getInt(10)
    val w = buf.getInt(18)
    val h = buf.getInt(22)
    require(h > 0, "top-down BMP (negative height) not supported")
    require(buf.getShort(28) == 24, "only 24-bit BMP supported")
    require(buf.getInt(30) == 0, "only uncompressed BI_RGB supported")
    val rowBytes = (3 * w + 3) / 4 * 4
    require(bytes.length - dataOff >= rowBytes * h, "truncated BMP payload")
    val rgb = new Array[Byte](3 * w * h)
    var y = 0
    while (y < h) {
      val fileRow = h - 1 - y // stored bottom-up
      var x = 0
      while (x < w) {
        val k = dataOff + fileRow * rowBytes + 3 * x
        val o = 3 * (y * w + x)
        rgb(o) = bytes(k + 2)     // R
        rgb(o + 1) = bytes(k + 1) // G
        rgb(o + 2) = bytes(k)     // B
        x += 1
      }
      y += 1
    }
    (w, h, rgb)
  }

  /** Decode 24-bit BI_RGB BMP → (w, h, grayscale luma in [0,1], Rec.601)
    * — same normalization as decodePpm so image features are
    * format-independent for identical pixels. */
  def decodeBmp(bytes: Array[Byte]): (Int, Int, Array[Float]) = {
    val (w, h, rgb) = decodeBmpRgb(bytes)
    (w, h, rgbToLuma(rgb))
  }

  // ------------------------------------------------- PNG truecolor RGB --

  private val PngSig =
    Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)

  private def be32(b: Array[Byte], i: Int): Int =
    ((b(i) & 0xff) << 24) | ((b(i + 1) & 0xff) << 16) |
      ((b(i + 2) & 0xff) << 8) | (b(i + 3) & 0xff)

  /** Paeth predictor (PNG spec §9.4): nearest of left/up/up-left to
    * the linear gradient p = a + b - c, ties won in that order. */
  private def paeth(a: Int, b: Int, c: Int): Int = {
    val p = a + b - c
    val pa = math.abs(p - a); val pb = math.abs(p - b); val pc = math.abs(p - c)
    if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
  }

  private def zlibDeflate(bytes: Array[Byte]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val dos = new java.util.zip.DeflaterOutputStream(bos,
      new java.util.zip.Deflater(6))
    dos.write(bytes); dos.close()
    bos.toByteArray
  }

  private def zlibInflate(raw: Array[Byte], expected: Int): Array[Byte] = {
    val inf = new java.util.zip.Inflater()
    inf.setInput(raw)
    val out = new Array[Byte](expected)
    var off = 0
    while (off < expected && !inf.finished()) {
      val n = inf.inflate(out, off, expected - off)
      if (n == 0 && inf.needsInput())
        throw new java.io.IOException("truncated PNG IDAT stream")
      off += n
    }
    inf.end()
    require(off == expected, s"PNG IDAT: $off bytes, expected $expected")
    out
  }

  /** Encode w×h RGB bytes as a PNG (public spec, ISO/IEC 15948): 8-bit
    * truecolor (color type 2), non-interlaced, one IDAT. The scanline
    * filter is `y % 5` — every filter type the spec defines (None, Sub,
    * Up, Average, Paeth) appears in any image with h ≥ 5, so a
    * round-trip through [[decodePngRgb]] exercises ALL five
    * reconstruction paths, not just the trivial one. */
  def encodePng(w: Int, h: Int, rgb: Array[Byte]): Array[Byte] = {
    require(rgb.length == 3 * w * h, s"rgb length ${rgb.length} != 3*$w*$h")
    val bpr = 3 * w
    val raw = new Array[Byte]((bpr + 1) * h)
    var y = 0
    while (y < h) {
      val ft = y % 5
      raw(y * (bpr + 1)) = ft.toByte
      var x = 0
      while (x < bpr) {
        val cur = rgb(y * bpr + x) & 0xff
        val left = if (x >= 3) rgb(y * bpr + x - 3) & 0xff else 0
        val up = if (y > 0) rgb((y - 1) * bpr + x) & 0xff else 0
        val ul = if (x >= 3 && y > 0) rgb((y - 1) * bpr + x - 3) & 0xff else 0
        val v = ft match {
          case 0 => cur
          case 1 => cur - left
          case 2 => cur - up
          case 3 => cur - (left + up) / 2
          case _ => cur - paeth(left, up, ul)
        }
        raw(y * (bpr + 1) + 1 + x) = v.toByte
        x += 1
      }
      y += 1
    }
    val ihdr = ByteBuffer.allocate(13)
      .putInt(w).putInt(h)
      .put(8.toByte)  // bit depth
      .put(2.toByte)  // color type: truecolor RGB
      .put(0.toByte).put(0.toByte).put(0.toByte) // deflate, adaptive, no interlace
      .array()
    val idat = zlibDeflate(raw)
    val out = new java.io.ByteArrayOutputStream()
    out.write(PngSig)
    def chunk(typ: String, data: Array[Byte]): Unit = {
      val t = typ.getBytes("US-ASCII")
      val hdr = ByteBuffer.allocate(4).putInt(data.length).array()
      out.write(hdr)
      out.write(t); out.write(data)
      val crc = new java.util.zip.CRC32()
      crc.update(t); crc.update(data)
      out.write(ByteBuffer.allocate(4).putInt(crc.getValue.toInt).array())
    }
    chunk("IHDR", ihdr)
    chunk("IDAT", idat)
    chunk("IEND", Array.emptyByteArray)
    out.toByteArray
  }

  /** Decode an 8-bit truecolor non-interlaced PNG → (w, h, raw RGB,
    * top-down) — the exact inverse of encodePng, but a REAL spec
    * decoder: walks the chunk list verifying every CRC, concatenates
    * multiple IDATs, inflates the zlib stream, and reconstructs all
    * five scanline filters against previously reconstructed bytes
    * (not the filtered ones — the classic unfilter bug). Ancillary
    * chunks are skipped per spec; unsupported critical features
    * (palette, alpha, 16-bit, interlace) fail loudly. */
  def decodePngRgb(bytes: Array[Byte]): (Int, Int, Array[Byte]) = {
    require(bytes.length > 8 && PngSig.indices.forall(i => bytes(i) == PngSig(i)),
      "not a PNG payload")
    var i = 8
    var w = -1; var h = -1
    var sawIhdr = false; var sawIend = false
    val idat = new java.io.ByteArrayOutputStream()
    while (!sawIend && i + 12 <= bytes.length) {
      val len = be32(bytes, i)
      require(len >= 0 && i + 12 + len <= bytes.length,
        s"truncated PNG chunk at offset $i")
      val typ = new String(bytes, i + 4, 4, "US-ASCII")
      val crc = new java.util.zip.CRC32()
      crc.update(bytes, i + 4, 4 + len)
      require(crc.getValue.toInt == be32(bytes, i + 8 + len),
        s"PNG $typ chunk CRC mismatch")
      typ match {
        case "IHDR" =>
          require(len == 13, "malformed IHDR")
          w = be32(bytes, i + 8); h = be32(bytes, i + 12)
          require(w > 0 && h > 0, s"bad PNG dims ${w}x$h")
          require(bytes(i + 16) == 8, "only 8-bit PNG supported")
          require(bytes(i + 17) == 2, "only truecolor RGB PNG supported")
          require(bytes(i + 20) == 0, "interlaced PNG not supported")
          sawIhdr = true
        case "IDAT" => idat.write(bytes, i + 8, len)
        case "IEND" => sawIend = true
        case _ => () // ancillary (tEXt/pHYs/…): skip per spec
      }
      i += 12 + len
    }
    require(sawIhdr && sawIend, "missing IHDR/IEND chunk")
    val bpr = 3 * w
    val raw = zlibInflate(idat.toByteArray, (bpr + 1) * h)
    val rgb = new Array[Byte](bpr * h)
    var y = 0
    while (y < h) {
      val ft = raw(y * (bpr + 1)) & 0xff
      require(ft <= 4, s"bad PNG filter type $ft on row $y")
      var x = 0
      while (x < bpr) {
        val f = raw(y * (bpr + 1) + 1 + x) & 0xff
        val left = if (x >= 3) rgb(y * bpr + x - 3) & 0xff else 0
        val up = if (y > 0) rgb((y - 1) * bpr + x) & 0xff else 0
        val ul = if (x >= 3 && y > 0) rgb((y - 1) * bpr + x - 3) & 0xff else 0
        val v = ft match {
          case 0 => f
          case 1 => f + left
          case 2 => f + up
          case 3 => f + (left + up) / 2
          case _ => f + paeth(left, up, ul)
        }
        rgb(y * bpr + x) = v.toByte
        x += 1
      }
      y += 1
    }
    (w, h, rgb)
  }

  /** Decode PNG → (w, h, grayscale luma in [0,1], Rec.601) — same
    * normalization as decodePpm/decodeBmp so image features are
    * format-independent for identical pixels. */
  def decodePng(bytes: Array[Byte]): (Int, Int, Array[Float]) = {
    val (w, h, rgb) = decodePngRgb(bytes)
    (w, h, rgbToLuma(rgb))
  }

  // --------------------------------------------------------- WAV PCM16 --

  /** Encode mono 16-bit PCM samples as a minimal RIFF/WAVE file. */
  def encodeWav(sampleRate: Int, samples: Array[Short]): Array[Byte] = {
    val dataLen = samples.length * 2
    val buf = ByteBuffer.allocate(44 + dataLen).order(ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1) // PCM
      .putShort(1) // mono
      .putInt(sampleRate)
      .putInt(sampleRate * 2) // byte rate
      .putShort(2) // block align
      .putShort(16) // bits per sample
      .put("data".getBytes("US-ASCII")).putInt(dataLen)
    samples.foreach(buf.putShort)
    buf.array()
  }

  /** Decode RIFF/WAVE mono PCM16 → (sampleRate, samples in [-1,1]).
    * Walks the chunk list (extra chunks like LIST are legal) to find
    * `fmt ` and `data`. */
  def decodeWav(bytes: Array[Byte]): (Int, Array[Float]) = {
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    def tag(): String = {
      val b = new Array[Byte](4); buf.get(b); new String(b, "US-ASCII")
    }
    require(tag() == "RIFF", "not a RIFF payload")
    buf.getInt // riff size
    require(tag() == "WAVE", "not a WAVE payload")
    var sampleRate = -1
    var samples: Array[Float] = null
    while (buf.remaining() >= 8 && (sampleRate < 0 || samples == null)) {
      val id = tag()
      val size = buf.getInt
      val next = buf.position() + size + (size & 1) // chunks are word-aligned
      id match {
        case "fmt " =>
          val fmt = buf.getShort
          val channels = buf.getShort
          require(fmt == 1 && channels == 1,
            s"only mono PCM supported (fmt=$fmt ch=$channels)")
          sampleRate = buf.getInt
          buf.getInt; buf.getShort
          require(buf.getShort == 16, "only 16-bit PCM supported")
        case "data" =>
          val n = size / 2
          samples = new Array[Float](n)
          var k = 0
          while (k < n) { samples(k) = buf.getShort / 32768.0f; k += 1 }
        case _ => // skip LIST/fact/...
      }
      buf.position(math.min(next, bytes.length))
    }
    require(sampleRate > 0 && samples != null, "missing fmt/data chunk")
    (sampleRate, samples)
  }

  // ------------------------------------------------------- AVI (MJPEG) --

  /** Encode pre-compressed JPEG frames as a minimal RIFF/AVI MJPEG file
    * (Microsoft's public AVI RIFF form: LIST hdrl {avih, LIST strl
    * {strh 'vids'/'MJPG', strf BITMAPINFOHEADER}} + LIST movi with one
    * '00dc' chunk per frame, word-aligned). Video in this media lake is
    * therefore container-walk + per-frame [[JpegCodec]] decode — the
    * same real-decoder standard as every other format. */
  def encodeAviMjpeg(w: Int, h: Int, fps: Int,
                     frames: Seq[Array[Byte]]): Array[Byte] = {
    require(frames.nonEmpty, "avi: at least one frame")
    val fcc = "US-ASCII"
    def chunk(id: String, body: Array[Byte]): Array[Byte] = {
      val pad = body.length & 1
      val buf = ByteBuffer.allocate(8 + body.length + pad)
        .order(ByteOrder.LITTLE_ENDIAN)
      buf.put(id.getBytes(fcc)).putInt(body.length).put(body)
      buf.array()
    }
    def list(typ: String, body: Array[Byte]): Array[Byte] =
      chunk("LIST", typ.getBytes(fcc) ++ body)

    val avih = ByteBuffer.allocate(56).order(ByteOrder.LITTLE_ENDIAN)
      .putInt(1000000 / fps) // microseconds per frame
      .putInt(0).putInt(0)
      .putInt(0x10)          // AVIF_HASINDEX off; 0x10 = AVIF_WASCAPTUREFILE (benign)
      .putInt(frames.length)
      .putInt(0).putInt(1)   // initial frames, stream count
      .putInt(frames.map(_.length).max)
      .putInt(w).putInt(h)
      .putInt(0).putInt(0).putInt(0).putInt(0)
      .array()
    val strh = ByteBuffer.allocate(56).order(ByteOrder.LITTLE_ENDIAN)
      .put("vids".getBytes(fcc)).put("MJPG".getBytes(fcc))
      .putInt(0).putShort(0).putShort(0).putInt(0)
      .putInt(1).putInt(fps) // scale, rate → fps frames/sec
      .putInt(0).putInt(frames.length)
      .putInt(frames.map(_.length).max)
      .putInt(-1) // quality: default
      .putInt(0)
      .putShort(0).putShort(0).putShort(w.toShort).putShort(h.toShort)
      .array()
    val strf = ByteBuffer.allocate(40).order(ByteOrder.LITTLE_ENDIAN)
      .putInt(40).putInt(w).putInt(h)
      .putShort(1).putShort(24)
      .put("MJPG".getBytes(fcc))
      .putInt(3 * w * h)
      .putInt(0).putInt(0).putInt(0).putInt(0)
      .array()
    val hdrl = list("hdrl",
      chunk("avih", avih) ++ list("strl", chunk("strh", strh) ++ chunk("strf", strf)))
    val movi = list("movi", frames.flatMap(f => chunk("00dc", f)).toArray)
    val body = "AVI ".getBytes(fcc) ++ hdrl ++ movi
    val out = ByteBuffer.allocate(8 + body.length).order(ByteOrder.LITTLE_ENDIAN)
    out.put("RIFF".getBytes(fcc)).putInt(body.length).put(body)
    out.array()
  }

  /** Decode a RIFF/AVI MJPEG container → (w, h, per-frame JPEG streams,
    * undecoded). Walks the real chunk grammar: header LISTs for
    * dimensions + the declared MJPG codec, LIST movi for the '00dc'
    * frame chunks (word alignment honored); an idx1 index, if present,
    * is skipped like any other unknown chunk. Frame pixel decode is the
    * caller's [[JpegCodec.decodeJpegGray]]/[[JpegCodec.decodeJpegRgb]]. */
  def decodeAviMjpeg(bytes: Array[Byte]): (Int, Int, Seq[Array[Byte]]) = {
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    def tag(): String = {
      val b = new Array[Byte](4); buf.get(b); new String(b, "US-ASCII")
    }
    require(tag() == "RIFF", "not a RIFF payload")
    buf.getInt
    require(tag() == "AVI ", "not an AVI payload")
    var w = -1; var h = -1
    var codec = ""
    val frames = scala.collection.mutable.ArrayBuffer[Array[Byte]]()
    // (end, insideMovi) stack-free walk: recurse into LISTs by looping
    // with explicit segment ends
    def walk(end: Int, inMovi: Boolean): Unit = {
      while (buf.position() + 8 <= end) {
        val id = tag()
        val size = buf.getInt
        val next = buf.position() + size + (size & 1)
        require(size >= 0 && buf.position() + size <= end,
          s"avi: chunk '$id' overruns its parent")
        id match {
          case "LIST" =>
            val typ = tag()
            walk(buf.position() + size - 4, inMovi || typ == "movi")
          case "avih" =>
            val p0 = buf.position()
            buf.position(p0 + 32); w = buf.getInt; h = buf.getInt
          case "strh" =>
            val fcc = tag()
            require(fcc == "vids", s"avi: first stream is '$fcc', not video")
            codec = tag()
          case "00dc" | "00db" if inMovi =>
            val f = new Array[Byte](size); buf.get(f)
            frames += f
          case _ => // strf/idx1/JUNK/...
        }
        buf.position(math.min(next, end))
      }
    }
    walk(bytes.length, inMovi = false)
    require(w > 0 && h > 0, "avi: missing avih header")
    require(codec == "MJPG", s"avi: codec '$codec' — only MJPG is decodable here")
    require(frames.nonEmpty, "avi: no frame chunks in LIST movi")
    (w, h, frames.toSeq)
  }

  /** 1-D mean pooling for audio: k equal windows of the sample stream. */
  def poolAudio(samples: Array[Float], k: Int): Array[Float] = {
    if (samples.isEmpty) return new Array[Float](k)
    val out = new Array[Float](k)
    val width = math.max(1, samples.length / k)
    var w = 0
    while (w < k) {
      val from = w * width
      val until = if (w == k - 1) samples.length
        else math.min(samples.length, from + width)
      var sum = 0.0f; var i = from
      while (i < until) { sum += samples(i); i += 1 }
      out(w) = if (until > from) sum / (until - from) else 0.0f
      w += 1
    }
    out
  }
}
