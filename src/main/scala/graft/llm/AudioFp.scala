package graft.llm

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Audio fingerprinting over the media lake's WAV rows — the audio
  * sibling of q_multimodal_phash, and the piece that completes the
  * DuckDB-oracle proof across ALL THREE real binary codecs: the phash
  * pair proves PPM + BMP, this proves the RIFF/WAVE chunk walk, PCM16
  * sample decode, and amplitude scaling.
  *
  * Feature choice is deliberately integer-exact: the fixture's samples
  * are (textByte − 128)·256 shorts, and decodeWav returns short/32768
  * — a dyadic rational, exactly representable in Float — so
  * round(sample·128) recovers (textByte − 128) losslessly and every
  * feature below is pure BIGINT arithmetic the oracle re-derives from
  * the document text:
  *  - sum_sq:   Σ a_i²  (energy)
  *  - e1_half:  Σ_{i<n/2} a_i²  (energy profile — pins sample ORDER,
  *              so a chunk-walk bug that shifts the data offset fails)
  *  - mean_crossings: sign changes around the stream mean, compared
  *              cross-multiplied (a_i·n < Σa) so no division happens
  *              — the dHash trick, 1-D.
  *
  * Scale shape: one mapPartitions decode pass over the pruned media
  * scan (binary codec — no Catalyst expression exists), zero shuffles
  * before the presentation sort. */
object AudioFp {
  type Q = (SparkSession, String) => DataFrame

  /** Integer fingerprint of a PCM16 stream (amplitudes recovered as
    * round(sample·128) — exact under the fixture's ±32768/256 scale). */
  def fingerprint(samples: Array[Float]): (Long, Long, Long, Long) = {
    val n = samples.length
    val a = new Array[Long](n)
    var i = 0
    while (i < n) { a(i) = math.round(samples(i) * 128.0); i += 1 }
    var sum = 0L; var ssq = 0L; var e1 = 0L
    i = 0
    while (i < n) {
      sum += a(i); ssq += a(i) * a(i)
      if (i < n / 2) e1 += a(i) * a(i)
      i += 1
    }
    var mc = 0L
    i = 1
    while (i < n) {
      if ((a(i - 1) * n < sum) != (a(i) * n < sum)) mc += 1
      i += 1
    }
    (n.toLong, mc, ssq, e1)
  }

  def audioFpQ(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Multimodal.syntheticMedia(s, d).as[Multimodal.MediaRow]
      .filter(col("format") === "wav")
      .mapPartitions { rows =>
        rows.map { m =>
          val (_, samples) = MediaCodecs.decodeWav(m.payload)
          val (n, mc, ssq, e1) = fingerprint(samples)
          (m.id, n, mc, ssq, e1)
        }
      }
      .toDF("id", "n_samples", "mean_crossings", "sum_sq", "e1_half")
      .orderBy("id")
  }

  val queries: Map[String, Q] = Map("q_multimodal_audio_fp" -> audioFpQ _)

  // The oracle re-derives amplitude i = ord(text byte i%len) − 128 from
  // the fixture contract (wav rows: doc_id % 5 = 2, n = w·h samples)
  // and recomputes all four features with the same integer arithmetic.
  val oracle: Map[String, String] = Map(
    "q_multimodal_audio_fp" ->
      """WITH wav AS (
           SELECT doc_id AS id,
                  CAST(doc_id % 64 + 16 AS BIGINT) *
                  CAST(doc_id % 32 + 16 AS BIGINT) AS n,
                  text, length(text) AS len
           FROM documents WHERE doc_id % 5 = 2),
         amp AS (
           SELECT id, n, i,
                  CAST(ord(substr(text, CAST(i % len AS INT) + 1, 1)) - 128
                    AS BIGINT) AS a
           FROM wav, LATERAL (SELECT unnest(range(0, n)) AS i)),
         st AS (SELECT id, n, sum(a) AS s FROM amp GROUP BY id, n)
         SELECT amp.id, st.n AS n_samples,
                CAST(sum(CASE WHEN i > 0 AND
                    ((lag_a * st.n < st.s) <> (a * st.n < st.s))
                  THEN 1 ELSE 0 END) AS BIGINT) AS mean_crossings,
                CAST(sum(a * a) AS BIGINT) AS sum_sq,
                CAST(sum(CASE WHEN i < st.n // 2 THEN a * a ELSE 0 END)
                  AS BIGINT) AS e1_half
         FROM (SELECT id, n, i, a,
                      lag(a) OVER (PARTITION BY id ORDER BY i) AS lag_a
               FROM amp) amp
         JOIN st ON amp.id = st.id
         GROUP BY amp.id, st.n ORDER BY amp.id""",
  )
}
