package graft.rel

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SkewSpec extends SparkSpec {
  import spark.implicits._

  // 90% of rows share one hot key
  private def skewed = (0L until 2000L)
    .map(i => (if (i % 10 == 0) i % 7 else 999L, i))
    .toDF("k", "payload")
  private def dim = (0L until 1000L).map(i => (i, s"name_$i")).toDF("k", "name")

  test("salted join result == plain join result on skewed keys") {
    val plain = skewed.join(dim, Seq("k"))
      .select("k", "payload", "name")
    val salted = Skew.saltedJoin(skewed, dim, "k", salts = 8)
      .select("k", "payload", "name")
    assert(salted.exceptAll(plain).count() == 0)
    assert(plain.exceptAll(salted).count() == 0)
  }

  test("salted count == plain count per key") {
    val plain = skewed.groupBy("k").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val salted = Skew.saltedCount(skewed, "k", salts = 8)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(salted == plain)
  }

  test("salt spreads the hot key across multiple shuffle keys") {
    val parts = skewed
      .withColumn("__salt",
        pmod(xxhash64($"k", monotonically_increasing_id()), lit(8)))
      .filter($"k" === 999L)
      .select("__salt").distinct().count()
    assert(parts > 4, s"hot key only landed in $parts salt buckets")
  }
}

/** Plan-shape audit across the whole query surface: the 100×-scale-up
  * smells — unintended cartesian products — must not appear anywhere.
  * (Bounded BroadcastNestedLoopJoins for the explicit all-pairs blocks are
  * acceptable by design; CartesianProduct — a full shuffle-side cross — is
  * not.) */
class PlanAuditSpec extends SparkSpec {

  test("no CartesianProduct in any query plan") {
    val offenders = graft.SparkEntry.queries.toSeq.flatMap { case (name, fn) =>
      val plan = try planOf(fn(spark, sf)) catch { case e: Throwable =>
        fail(s"$name failed to plan: ${e.getMessage}")
      }
      if (plan.contains("CartesianProduct")) Some(name) else None
    }
    assert(offenders.isEmpty, s"cartesian products in: $offenders")
  }

  test("every relational query reads parquet with a pruned schema") {
    // spot-check: scans in the projection-heavy queries read few columns
    val plan = formattedPlan(Relational.scanProjectFilter(spark, sf))
    val readSchema = plan.linesIterator
      .find(_.contains("ReadSchema")).getOrElse("")
    assert(readSchema.contains("l_orderkey") &&
      !readSchema.contains("l_comment") && !readSchema.contains("l_tax"),
      readSchema)
  }
}
