package graft.llm

import graft.SparkSpec

/** WAV fingerprint exactness: amplitude recovery through the float
  * sample path, and feature goldens on crafted streams. */
class AudioFpSpec extends SparkSpec {

  test("round(sample*128) recovers the fixture amplitude exactly for " +
    "every possible byte value") {
    // fixture contract: sample short = (byte-128)*256; decodeWav
    // divides by 32768 — a dyadic scale, lossless in Float
    (0 to 255).foreach { b =>
      val short = ((b - 128) * 256).toShort
      val f = short / 32768.0f
      assert(math.round(f * 128.0) === (b - 128).toLong, s"byte $b")
    }
  }

  test("fingerprint goldens on crafted streams") {
    // constant stream: no crossings, energy = n*a^2, first half exact
    val const = Array.fill(10)((-96 * 256).toShort / 32768.0f)
    assert(AudioFp.fingerprint(const) === ((10L, 0L, 10L * 96 * 96, 5L * 96 * 96)))
    // alternating ±1 around mean 0: every adjacent pair crosses
    val alt = Array.tabulate(8)(i =>
      (((if (i % 2 == 0) 1 else -1) * 256).toShort) / 32768.0f)
    val (n, mc, ssq, e1) = AudioFp.fingerprint(alt)
    assert((n, mc, ssq, e1) === ((8L, 7L, 8L, 4L)))
  }

  test("fingerprint through the real codec equals fingerprint of the " +
    "raw samples (encode/decode round trip)") {
    val samples = Array.tabulate(301)(i => (((i * 97 + 13) % 256 - 128) * 256).toShort)
    val (_, decoded) = MediaCodecs.decodeWav(MediaCodecs.encodeWav(8000, samples))
    val direct = AudioFp.fingerprint(samples.map(_ / 32768.0f))
    assert(AudioFp.fingerprint(decoded) === direct)
  }

  test("query emits one row per wav media row at sf0.001") {
    val out = AudioFp.audioFpQ(spark, "/root/testdata/sf0.001").collect()
    val wavs = Multimodal.syntheticMedia(spark, "/root/testdata/sf0.001")
      .filter(org.apache.spark.sql.functions.col("format") === "wav").count()
    assert(out.length.toLong === wavs && wavs > 0)
    // energy positive, half-energy bounded by total
    out.foreach { r =>
      assert(r.getLong(3) > 0 && r.getLong(4) <= r.getLong(3))
    }
  }
}
