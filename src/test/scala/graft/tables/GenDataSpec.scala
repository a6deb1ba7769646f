package graft.tables

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins the scale-up generator's contract: schema parity with the driver's
  * testdata (down to physical parquet types after a write), determinism
  * under re-evaluation and repartitioning (no rand()-style partition
  * dependence), the measured distribution invariants every query family
  * relies on (Poisson(4) line counts, monotone event time, unit-norm
  * embeddings, injected document duplicates), and the driver's row-count
  * floors. A GenData fixture that violates any of these would make sf>0.1
  * gate results incomparable to the driver-scale ones. */
class GenDataSpec extends SparkSpec {

  private lazy val outDir: String = {
    val d = java.nio.file.Files.createTempDirectory("graft_gendata_spec").toString
    GenData.write(spark, 0.001, d)
    d
  }

  test("generated fixture matches the driver testdata schema, table by table") {
    for (t <- Tables.relationalTables ++ Tables.extensionTables) {
      val gen = spark.read.parquet(s"$outDir/$t.parquet").schema
      val drv = spark.read.parquet(s"$sf/$t.parquet").schema
      assert(gen.map(f => (f.name, f.dataType)) === drv.map(f => (f.name, f.dataType)),
        s"schema mismatch for $t")
    }
  }

  test("driver row-count floors and linear scaling are reproduced") {
    def n(t: String) = spark.read.parquet(s"$outDir/$t.parquet").count()
    assert(n("region") === 5 && n("nation") === 25)
    assert(n("customer") === 150 && n("supplier") === 10 && n("part") === 200)
    assert(n("orders") === 1500 && n("events") === 1000)
    assert(n("documents") === 500 && n("embeddings") === 500) // floored
  }

  test("generation is deterministic and partition-independent") {
    // same rows whether evaluated in 1 partition or 13 — xxhash64 streams
    // are pure functions of the row id, unlike rand()
    val a = GenData.customer(spark, 0.001).coalesce(1).collect().toSeq
    val b = GenData.customer(spark, 0.001).repartition(13).collect().toSeq
    assert(a.sortBy(_.getLong(0)) === b.sortBy(_.getLong(0)))
    val e1 = GenData.embeddings(spark, 0.001).collect().map(_.toString).sorted
    val e2 = GenData.embeddings(spark, 0.001).collect().map(_.toString).sorted
    assert(e1 === e2)
  }

  test("lineitem line counts are Poisson(4): mean ~4, ~e^-4 orders empty") {
    val li = GenData.lineitem(spark, 0.01)
    val nOrders = 15000.0
    val perOrder = li.groupBy("l_orderkey").count()
    val withLines = perOrder.count().toDouble
    val mean = li.count() / nOrders
    assert(math.abs(mean - 4.0) < 0.15, s"mean lines/order $mean")
    val emptyFrac = 1.0 - withLines / nOrders
    assert(math.abs(emptyFrac - math.exp(-4.0)) < 0.01, s"empty-order frac $emptyFrac")
  }

  test("event timestamps are monotone in event_id with bounded in-slot jitter") {
    val ev = GenData.events(spark, 0.001)
    val viol = ev.select(col("event_id"), unix_micros(col("ts").cast("timestamp")).as("us"))
      .withColumn("prev", lag("us", 1).over(
        org.apache.spark.sql.expressions.Window.orderBy("event_id")))
      .filter(col("prev") > col("us")).count()
    assert(viol === 0)
  }

  test("embeddings are unit-norm 64-d float vectors in 10 clusters") {
    val e = GenData.embeddings(spark, 0.001)
      .select(col("label"),
        size(col("embedding")).as("dim"),
        abs(sqrt(aggregate(col("embedding"), lit(0.0),
          (a, x) => a + x.cast("double") * x.cast("double"))) - 1.0).as("normErr"))
    val r = e.agg(max("dim"), min("dim"), max("normErr"),
      countDistinct("label")).head()
    assert(r.getInt(0) === 64 && r.getInt(1) === 64)
    assert(r.getDouble(2) < 1e-6)
    assert(r.getLong(3) === 10)
  }

  test("documents carry injected exact and near duplicates at scale") {
    // 50k docs (sf=1 doc count) ≈ 100 exact-dup and 200 near-dup draws
    val docs = GenData.documents(spark, 0.2) // 10k docs — fast, ~60 injected
    val nExact = docs.groupBy("text").count().filter(col("count") > 1)
      .agg(sum(col("count") - 1)).head().getLong(0)
    assert(nExact >= 5, s"expected exact dups, got $nExact")
    // near-dups: last word differs, prefix identical — count docs whose
    // all-but-last-word prefix collides with a distinct text
    val pfx = docs.select(col("doc_id"),
      expr("substring(text, 1, length(text) - instr(reverse(text), ' '))").as("p"))
    val nNear = pfx.groupBy("p").count().filter(col("count") > 1).count()
    assert(nNear >= 5, s"expected near-dup prefix collisions, got $nNear")
    // n_chars is the real text length
    assert(docs.filter(length(col("text")) =!= col("n_chars")).count() === 0)
  }

  test("events table round-trips through the Tables.events loader") {
    val ev = Tables.events(spark, outDir)
    assert(ev.columns.contains("ts_ns"))
    assert(ev.schema("ts").dataType === org.apache.spark.sql.types.TimestampType)
    assert(ev.count() === 1000)
  }
}
