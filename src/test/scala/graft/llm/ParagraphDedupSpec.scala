package graft.llm

import graft.SparkSpec
import graft.tables.Tables
import org.apache.spark.sql.functions._

class ParagraphDedupSpec extends SparkSpec {
  import spark.implicits._

  test("chunk accounting: kept + dropped == n_chunks, every doc present") {
    val rows = ParagraphDedup.paragraphDedup(spark, sf).collect()
    assert(rows.length.toLong == Tables.documents(spark, sf).count())
    rows.foreach { r =>
      assert(r.getLong(1) == r.getLong(2) + r.getLong(3))
    }
    // a fully-duplicated doc legitimately keeps 0 chunks, but the corpus
    // as a whole must keep at least one per distinct chunk
    assert(rows.map(_.getLong(2)).sum >= 1L)
  }

  test("kept totals equal the number of DISTINCT chunks in the corpus") {
    val distinctChunks = Tables.documents(spark, sf)
      .select(col("doc_id"), split(col("text"), " ").as("ts"))
      .select(explode(expr(
        s"sequence(0, (size(ts) + ${ParagraphDedup.ChunkTokens - 1}) " +
          s"div ${ParagraphDedup.ChunkTokens} - 1)")).as("cidx"), col("ts"))
      .select(expr(s"array_join(slice(ts, cidx * " +
        s"${ParagraphDedup.ChunkTokens} + 1, " +
        s"${ParagraphDedup.ChunkTokens}), ' ')").as("chunk"))
      .distinct().count()
    val keptTotal = ParagraphDedup.paragraphDedup(spark, sf)
      .agg(sum("kept")).collect()(0).getLong(0)
    assert(keptTotal == distinctChunks)
  }

  test("first occurrence wins: a repeated chunk is kept in the smallest doc") {
    // two docs sharing their first 8 tokens: doc 1 keeps, doc 2 drops
    val docs = Seq(
      (1L, "a b c d e f g h x y"),
      (2L, "a b c d e f g h z w")).toDF("doc_id", "text")
    val toks = docs.select(col("doc_id"), split(col("text"), " ").as("ts"))
    val chunks = toks
      .select(col("doc_id"), col("ts"),
        explode(expr("sequence(0, (size(ts) + 7) div 8 - 1)")).as("cidx"))
      .select(col("doc_id"), col("cidx"),
        expr("array_join(slice(ts, cidx * 8 + 1, 8), ' ')").as("chunk"))
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("chunk").orderBy("doc_id", "cidx")
    val kept = chunks.withColumn("rk", row_number().over(w))
      .filter(col("rk") === 1)
      .collect().map(r => (r.getLong(0), r.getString(2))).toSet
    assert(kept.contains((1L, "a b c d e f g h")))
    assert(!kept.exists { case (d, c) => d == 2L && c == "a b c d e f g h" })
  }
}
