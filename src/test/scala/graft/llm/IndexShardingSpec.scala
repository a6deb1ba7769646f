package graft.llm

import graft.SparkSpec
import graft.tables.Tables
import org.apache.spark.sql.functions._

/** The sharded-postings contract: for ANY shard width, reassembling the
  * (token, shard) postings in shard order reproduces the unsharded index
  * exactly — widths partition the doc-id space in order, so shard-order
  * concatenation IS the global doc-id sort. */
class IndexShardingSpec extends SparkSpec {

  private def docs = Tables.documents(spark, sf)

  private def assembled(width: Long) =
    TextOps.assembleShardedIndex(TextOps.invertedIndexSharded(docs, width))
      .select(col("token"), col("df"), col("postings"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2)))
      .sortBy(_._1).toSeq

  test("reassembled sharded index equals the unsharded index at every width") {
    // unsharded baseline WITHOUT the df cutoff (the cutoff is a reader
    // policy; the sharding equality must hold on the raw index)
    val base = docs
      .select(col("doc_id"),
        explode(array_distinct(TextOps.tokens(col("text")))).as("token"))
      .groupBy("token")
      .agg(count(lit(1)).as("df"),
        array_join(sort_array(collect_list(col("doc_id"))), ",")
          .as("postings"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2)))
      .sortBy(_._1).toSeq
    assert(base.nonEmpty)
    // width 1 = one id per shard (maximal split); 7 = misaligned with any
    // power-of-two id pattern; 1<<40 = one shard (degenerate no-split)
    for (w <- Seq(1L, 7L, 1L << 40)) {
      assert(assembled(w) == base, s"width $w diverges from unsharded")
    }
  }

  test("shard rows are bounded by the width (the point of sharding)") {
    val perShard = TextOps.invertedIndexSharded(docs, 8L)
      .agg(max(col("df_shard"))).head().getLong(0)
    assert(perShard <= 8L, s"a shard holds $perShard > width ids")
  }

  test("width must be positive") {
    intercept[IllegalArgumentException] {
      TextOps.invertedIndexSharded(docs, 0L)
    }
  }
}
