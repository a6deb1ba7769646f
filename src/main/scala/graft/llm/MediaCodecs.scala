package graft.llm

import java.nio.{ByteBuffer, ByteOrder}

/** Pure-JVM media codecs for the multimodal pipeline: PPM P6 (binary RGB
  * image), BMP 24-bit BI_RGB (the little-endian/bottom-up/row-padded
  * classic), and WAV PCM16 (RIFF audio) — public, header+raw-payload
  * formats decodable without native libraries, which is exactly what this
  * container offers. These make the decode stage REAL for three of the
  * five media formats; compressed formats (jpeg/mp4) keep the documented
  * deterministic stub.
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
