package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Content-defined chunking gates: the shift-robustness property that
  * is the operator's whole reason to exist (vs fixed-stride chunking),
  * hash/boundary golden vs an in-memory model, and dup-pair semantics. */
class CdcSpec extends SparkSpec {
  import spark.implicits._

  /** In-memory model of the exact chunk definition (W=16, B=31,
    * M=2^20, cut where H%64==0, cut after the window, no tail cut). */
  private def modelChunks(text: String): Seq[String] = {
    val cuts = (0 to text.length - Cdc.W).filter { i =>
      var h = 0L
      (0 until Cdc.W).foreach(k => h = (h * Cdc.B + text.charAt(i + k)) % Cdc.Mask)
      h % Cdc.Divisor == 0
    }.map(_ + Cdc.W).filter(_ < text.length)
    val bl = 0 +: cuts :+ text.length
    bl.sliding(2).map { case Seq(a, b) => text.substring(a, b) }.toSeq
  }

  private def sparkChunks(texts: Seq[String]): Map[Long, Seq[String]] = {
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("cdc").toString
    df.write.mode("overwrite").parquet(dir + "/documents.parquet")
    // the engine's census must agree with the in-memory model per doc:
    // fingerprint equality pins every chunk's exact CONTENT, so the
    // model is then a faithful stand-in for chunk-level asserts
    val byId = Cdc.textCdc(spark, dir).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    texts.indices.map { i =>
      val m = modelChunks(texts(i))
      val row = byId(i.toLong)
      assert(row.getAs[Long]("n_chunks") == m.size, s"doc $i chunk count")
      assert(row.getAs[Long]("n_chars") == texts(i).length, s"doc $i span")
      val fp = java.security.MessageDigest.getInstance("MD5")
        .digest(m.map(c => java.security.MessageDigest.getInstance("MD5")
          .digest(c.getBytes("UTF-8")).map("%02x".format(_)).mkString)
          .mkString("|").getBytes("UTF-8")).map("%02x".format(_)).mkString
      assert(row.getAs[String]("fingerprint") == fp, s"doc $i fingerprint")
      i.toLong -> m
    }.toMap
  }

  test("engine chunks == in-memory model (count, span, fingerprint) on " +
    "mixed-length docs incl. shorter-than-one-window") {
    val base = (1 to 40).map(i => s"word$i").mkString(" ")
    sparkChunks(Seq(base, "tiny", "", base.take(17), base * 2))
  }

  test("SHIFT ROBUSTNESS: a 1-char insertion early in the doc changes " +
    "only the chunks around the edit — most chunk hashes survive") {
    val base = (1 to 120).map(i => s"tok${i}q${i * 3}").mkString(" ")
    val edited = base.substring(0, 5) + "Z" + base.substring(5)
    val a = modelChunks(base)
    val b = modelChunks(edited)
    // the model IS the engine definition (previous test); compare sets
    val shared = a.toSet.intersect(b.toSet)
    assert(a.size >= 5, s"fixture too small: ${a.size} chunks")
    assert(shared.size >= a.size - 2,
      s"edit broke ${a.size - shared.size} of ${a.size} chunks — " +
        "boundaries are not content-defined")
    // the contrast that motivates the operator: FIXED-stride chunks
    // after the same edit share (almost) nothing
    def strided(t: String) = t.grouped(64).toSeq
    val sharedFixed = strided(base).toSet.intersect(strided(edited).toSet)
    assert(sharedFixed.size <= 1,
      "fixed-stride unexpectedly survived the shift — contrast broken")
  }

  test("dup pairs: planted shifted near-dup is found; df cap holds") {
    val a = (1 to 80).map(i => s"alpha${i}beta").mkString(" ")
    val texts = Seq(
      a,                                  // 0
      "PREFIX-EDIT " + a,                 // 1: shifted copy of 0
      (1 to 80).map(i => s"gamma${i}d").mkString(" ") // 2: unrelated
    )
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("cdc2").toString
    df.write.mode("overwrite").parquet(dir + "/documents.parquet")
    val pairs = Cdc.dedupCdc(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(pairs.exists(p => p._1 == 0L && p._2 == 1L && p._3 >= 2),
      s"shifted dup not found: ${pairs.mkString(",")}")
    assert(!pairs.exists(p => p._2 == 2L || p._1 == 2L),
      "unrelated doc joined a pair")
  }
}
