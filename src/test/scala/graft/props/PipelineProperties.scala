package graft.props

import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Differential properties for the round-4 corpus operators: Spark
  * plans vs straightforward sequential Scala models on random inputs.
  * Packing matters most — the distributed 2-pass prefix sum is re-proven
  * here against an order-by-hash sequential fold with arbitrary document
  * sizes, not just the driver fixture. */
object PipelineProperties extends Properties("graft.pipeline") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(10).withWorkers(1)

  private lazy val spark = SparkSpec.session
  import spark.implicits._

  private val word = Gen.oneOf("join", "select", "where", "group", "from",
    "order", "by", "filter")
  private val docsGen: Gen[List[String]] =
    Gen.listOf(Gen.listOf(word).map(_.mkString(" ")))

  // ---- sliding-window chunking vs in-memory model ----------------------

  property("chunks == sliding-window model (chunk 16 stride 12)") =
    forAll(docsGen) { texts =>
      val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val got = graft.llm.Chunking.chunks(df)
        .select("doc_id", "chunk_id", "chunk")
        .collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getSeq[String](2).toList))
        .toSet
      val want = texts.zipWithIndex.flatMap { case (t, i) =>
        val toks = t.split(" ", -1).toList // Spark split keeps trailing ""
        (0 until toks.length by 12).zipWithIndex.map { case (st, ci) =>
          (i.toLong, ci, toks.slice(st, st + 16))
        }
      }.toSet
      got == want
    }

  // ---- 2-pass shard packing vs sequential fold --------------------------

  /** The same 60-bit md5 prefix Dedup.md5Hash60 computes. */
  private def h60(s: String): Long = {
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.substring(0, 15)
    java.lang.Long.parseLong(hex, 16)
  }

  property("shardAssignments == sequential hash-order fold") =
    forAll(docsGen) { texts =>
      val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val got = graft.llm.Packing.shardAssignments(df)
        .select("doc_id", "shard_id")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      var cum = 0L
      val want = texts.zipWithIndex
        .map { case (t, i) =>
          (i.toLong, h60(t), t.split(" ", -1).length.toLong)
        }
        .sortBy { case (id, h, _) => (h, id) }
        .map { case (id, _, tok) =>
          val shard = cum / graft.llm.Packing.Budget
          cum += tok
          id -> shard
        }.toMap
      got == want
    }
  /** KL(source ‖ corpus) over any planted corpus is non-negative and
    * zero only when every source matches the corpus mix (Gibbs). */
  property("bounded-support KL is non-negative") = {
    val docGen = Gen.nonEmptyListOf(Gen.oneOf("a", "b", "c", "d"))
      .map(_.mkString(" "))
    forAll(Gen.nonEmptyListOf(Gen.zip(Gen.oneOf("s1", "s2", "s3"), docGen))) {
      docs =>
        val df = docs.toDF("source", "text")
        graft.llm.TextOps.textKlFor(df, supportSize = 4).collect()
          .forall(_.getDouble(2) >= 0.0)
    }
  }

  /** Cohort invariants on random activity: offset-0 count equals the
    * cohort size, every retention count is bounded by it, and cohort
    * sizes sum to the distinct-user count. */
  property("cohort retention counts are bounded by the cohort size") = {
    val evGen = Gen.nonEmptyListOf(Gen.zip(
      Gen.choose(1L, 8L), Gen.choose(0L, 4L)))
    forAll(evGen) { evs =>
      val WEEK = 604800000000L
      val df = evs.map { case (u, w) =>
        (u, new java.sql.Timestamp(w * WEEK / 1000)) }
        .toDF("user_id", "ts")
      val rows = graft.stream.Events.cohortRetention(df).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      val zeroOk = rows.filter(_._2 == 0L)
        .forall(r => r._3 == r._4)
      val bounded = rows.forall(r => r._3 <= r._4)
      val sizes = rows.filter(_._2 == 0L).map(_._4).sum
      zeroOk && bounded && sizes == evs.map(_._1).distinct.size
    }
  }

}
