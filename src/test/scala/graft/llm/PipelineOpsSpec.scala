package graft.llm

import graft.SparkSpec
import graft.tables.Tables
import org.apache.spark.sql.functions._

/** Round-4 pipeline operators: PII masking, sliding-window chunking,
  * shard packing, temperature resampling. */
class PipelineOpsSpec extends SparkSpec {

  test("pii mask: no digits survive redaction; bands are 1000-wide") {
    val out = Privacy.piiMask(spark, sf).cache()
    try {
      assert(out.count() == Tables.customer(spark, sf).count())
      assert(out.filter(col("name_redacted").rlike("[0-9]")).count() == 0)
      assert(out.filter(col("bal_band") % 1000 =!= 0).count() == 0)
      // pseudonym is total and collision-free on this key space
      assert(out.select("name_pseudo").distinct().count() ==
        out.select("c_custkey").distinct().count())
    } finally out.unpersist()
  }

  test("chunking covers every token and respects the stride geometry") {
    val out = Chunking.textChunk(spark, sf).cache()
    try {
      // chunk ids are dense 0..last per doc
      val perDoc = out.groupBy("doc_id")
        .agg(max(col("chunk_id")).as("last"), count(lit(1)).as("n"))
      assert(perDoc.filter(col("n") =!= col("last") + 1).count() == 0)
      // exact width law: chunk c holds min(Chunk, n_tokens - c*Stride)
      // tokens (non-tail chunks can be 13..16 wide since Stride < Chunk)
      val docs = Tables.documents(spark, sf)
        .select(col("doc_id"), size(TextOps.tokens(col("text"))).as("nt"))
      val badWidth = out.join(docs, Seq("doc_id"))
        .filter(col("n_toks") =!=
          least(lit(Chunking.Chunk),
            col("nt") - col("chunk_id") * Chunking.Stride))
      assert(badWidth.count() == 0)
      // stride coverage: one chunk per start in [0, n_tokens) stepping
      // Stride, so chunk count == ceil(n_tokens / Stride)
      val badCount = perDoc.join(docs, Seq("doc_id"))
        .filter(col("n") =!=
          ceil(col("nt").cast("double") / Chunking.Stride).cast("long"))
      assert(badCount.count() == 0)
    } finally out.unpersist()
  }

  test("2-pass shard prefix sum equals the single-window form") {
    val docs = Tables.documents(spark, sf)
    val twoPass = Packing.shardAssignments(docs)
      .select("doc_id", "shard_id")
    val w = org.apache.spark.sql.expressions.Window
      .orderBy("h", "doc_id")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val single = docs
      .select(col("doc_id"), Dedup.md5Hash60(col("text")).as("h"),
        size(TextOps.tokens(col("text"))).cast("long").as("tok"))
      .withColumn("cum_before", coalesce(sum(col("tok")).over(w), lit(0L)))
      .select(col("doc_id"),
        floor(col("cum_before") / Packing.Budget).cast("long")
          .as("shard_single"))
    val diff = twoPass.join(single, Seq("doc_id"))
      .filter(col("shard_id") =!= col("shard_single"))
    assert(diff.count() == 0)
  }

  test("shards fill to the budget: every shard but the last is >= budget-capped") {
    val shards = Packing.packShards(spark, sf).cache()
    try {
      val last = shards.agg(max("shard_id")).head.getLong(0)
      // a shard closes only once its cumulative tokens cross the budget:
      // tokens(shard) + tokens of its last doc must exceed the budget, so
      // any shard except the last holds > Budget - max_doc_tokens tokens
      val maxDoc = Tables.documents(spark, sf)
        .agg(max(size(TextOps.tokens(col("text"))))).head.getInt(0)
      val under = shards.filter(col("shard_id") < last &&
        col("n_tokens") <= Packing.Budget - maxDoc)
      assert(under.count() == 0)
      // conservation: shard tokens sum to corpus tokens
      val corpus = Tables.documents(spark, sf)
        .agg(sum(size(TextOps.tokens(col("text"))))).head.getLong(0)
      assert(shards.agg(sum("n_tokens")).head.getLong(0) == corpus)
    } finally shards.unpersist()
  }

  test("round-4 op plan shapes: broadcast offsets, shuffle-free map ops") {
    // packing: fine-pass window is BUCKET-partitioned (not a global
    // window) and the coarse offsets arrive by broadcast
    val pack = planOf(Packing.packShards(spark, sf))
    assert(pack.contains("BroadcastHashJoin"), pack)
    assert(pack.contains("windowspecdefinition(bkt"), pack)
    // chunking and pii are pure map-side ops: no hash shuffle anywhere
    // (the only exchange is the output sort's range partitioning)
    val chunk = planOf(Chunking.textChunk(spark, sf))
    assert(chunk.contains("Generate posexplode"), chunk)
    assert(!chunk.contains("hashpartitioning"), chunk)
    val pii = planOf(Privacy.piiMask(spark, sf))
    assert(!pii.contains("hashpartitioning"), pii)
  }

  test("inverted index: postings reconcile per-token, cutoffs hold") {
    val docs = graft.tables.Tables.documents(spark, sf)
    val n = docs.count()
    val out = TextOps.invertedIndex(spark, sf).cache()
    try {
      assert(out.count() > 0)
      // postings travel as a ','-joined scalar (driver-hashable); decode
      // it back to prove df == |postings| and sorted + distinct
      val decoded = split(col("postings"), ",").cast("array<bigint>")
      val bad = out.filter(
        col("df") =!= size(decoded) ||
        decoded =!= array_sort(array_distinct(decoded)))
      assert(bad.count() == 0)
      // cutoffs: hapax dropped, stopwords (>80% of docs) dropped
      assert(out.filter(col("df") < 2 || col("df") * 10 > n * 8)
        .count() == 0)
      // differential: one token's postings == the docs containing it
      val row = out.orderBy("token").head
      val tok = row.getString(0)
      val want = docs
        .filter(array_contains(split(col("text"), " "), tok))
        .select("doc_id").orderBy("doc_id")
        .collect().map(_.getLong(0)).mkString(",")
      assert(row.getString(2) == want, s"postings mismatch for '$tok'")
    } finally out.unpersist()
  }

  test("pmi: floor respected and top collocation matches manual math") {
    val out = TextOps.textPmi(spark, sf).collect()
    assert(out.nonEmpty && out.length <= 20)
    assert(out.forall(_.getAs[Long]("c_ab") >= 5))
    // recompute the top row's PMI from raw counts
    val top = out.head
    val Array(w1, w2) = top.getAs[String]("gram").split(" ")
    val docs = Tables.documents(spark, sf)
      .select(TextOps.tokens(col("text")).as("toks"))
    val uni = docs.select(explode(col("toks")).as("w"))
      .groupBy("w").agg(count(lit(1)).as("c")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val n1 = uni.values.sum.toDouble
    val bi = docs.filter(size(col("toks")) >= 2)
      .select(explode(TextOps.wordNGrams(col("toks"), 2)).as("g"))
    val n2 = bi.count().toDouble
    val cab = bi.filter(col("g") === top.getAs[String]("gram")).count()
    val want = math.log((cab / n2) /
      ((uni(w1) / n1) * (uni(w2) / n1)))
    assert(math.abs(top.getAs[Double]("pmi") - want) < 1e-4,
      s"${top.getAs[Double]("pmi")} vs $want")
  }

  test("decontamination counts reconcile with the shingle sets") {
    val out = Sampling.decontaminate(spark, sf).collect()
    assert(out.forall(r => r.getAs[Long]("n_kept") +
      r.getAs[Long]("n_dropped") == r.getAs[Long]("n_train")))
    val totalTrain = Tables.documents(spark, sf)
      .withColumn("split", Sampling.splitCol(col("doc_id")))
      .filter(col("split") === "train").count()
    assert(out.map(_.getAs[Long]("n_train")).sum == totalTrain)
    // independently recount offenders from the shared shingle frame
    val sh = Sampling.shingleFrame(spark, sf)
    val test = sh.filter(col("split") === "test").select("gram_h").distinct()
    val offenders = sh.filter(col("split") === "train")
      .join(test, Seq("gram_h"), "left_semi")
      .select("doc_id").distinct().count()
    assert(out.map(_.getAs[Long]("n_dropped")).sum == offenders)
  }

  test("temperature resampling upweights low-resource languages") {
    val out = Sampling.sampleTemperature(spark, sf).collect()
    assert(out.length == 5) // 5 languages in the corpus
    val total = out.map(_.getAs[Long]("target_n")).sum
    assert(math.abs(total - 1000L) <= out.length) // floor rounding slack
    // α=0.5 compresses the distribution: the most-resourced language's
    // sampling rate is the minimum, the least-resourced one's the max
    val byN = out.sortBy(_.getAs[Long]("n_docs"))
    assert(byN.head.getAs[Double]("rate") >= byN.last.getAs[Double]("rate"))
  }
}
