package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Degenerate-input behavior: every reusable operator core must return
  * an EMPTY frame on an empty input — never throw, never NaN — because
  * at 100 TB a partition-pruned read, an over-tight quality gate, or a
  * dry increment batch routinely hands an operator zero rows. */
class EmptyInputSpec extends SparkSpec {
  import spark.implicits._

  private def emptyDf(schema: StructType) =
    spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      schema)

  test("marker ranking on an empty labeled matrix") {
    val m = emptyDf(StructType(Seq(
      StructField("label", IntegerType),
      StructField("vec", ArrayType(DoubleType)))))
    assert(sc.Markers.markersFor(m, topK = 3).count() == 0)
  }

  test("regression and downsampling on an empty matrix") {
    val r = emptyDf(StructType(Seq(
      StructField("vec", ArrayType(DoubleType)))))
    assert(sc.Markers.regressOutFor(r).count() == 0)
    val d = emptyDf(StructType(Seq(
      StructField("vec_id", LongType),
      StructField("c", ArrayType(LongType)))))
    assert(sc.Markers.downsampleFor(d, target = 10L).count() == 0)
  }

  test("ewma on an empty series frame") {
    val g = emptyDf(StructType(Seq(
      StructField("event_type", StringType),
      StructField("hour_us", LongType),
      StructField("value_ff", DoubleType))))
    assert(stream.TimeSeries.ewmaHourly(g).count() == 0)
  }

  test("cohort retention on an empty event log") {
    val ev = emptyDf(StructType(Seq(
      StructField("user_id", LongType),
      StructField("ts", TimestampType))))
    assert(stream.Events.cohortRetention(ev).count() == 0)
  }

  test("oov and kl on an empty corpus") {
    val docs = emptyDf(StructType(Seq(
      StructField("doc_id", LongType),
      StructField("text", StringType))))
    assert(llm.TextOps.textOovFor(docs, vocabSize = 10).count() == 0)
    val src = emptyDf(StructType(Seq(
      StructField("source", StringType),
      StructField("text", StringType))))
    assert(llm.TextOps.textKlFor(src, supportSize = 10).count() == 0)
  }

  test("incremental screen with an empty corpus admits everything") {
    val schema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("text", StringType)))
    val corpus = emptyDf(schema)
    val inc = Seq((1L, "a b c"), (2L, "d e f")).toDF("doc_id", "text")
    val rep = llm.Dedup.screenIncrement(corpus, inc).collect()
    assert(rep.length == 2 && rep.forall(_.getBoolean(4)),
      "empty corpus must admit every candidate")
    // and an empty increment yields an empty report
    assert(llm.Dedup.screenIncrement(inc, emptyDf(schema)).count() == 0)
  }

  test("split leakage on an empty corpus reports nothing") {
    val schema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("text", StringType)))
    assert(llm.Dedup.splitLeakageOf(emptyDf(schema)).count() == 0)
    // a one-sided corpus (every doc hashes to one split) cannot leak
    val one = Seq((0L, "a b c")).toDF("doc_id", "text")
    assert(llm.Dedup.splitLeakageOf(one).count() == 0)
  }
}
