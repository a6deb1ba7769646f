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

  test("AQE splits the skewed partition of a shuffle join (skew=true)") {
    // the AUTOMATIC counterpart to saltedJoin: AQE detects the oversized
    // post-shuffle partition at the stage boundary and splits it into
    // multiple reader tasks, replicating the matching build rows. Child
    // session: thresholds are sized down to test scale (defaults are
    // 256 MB partitions).
    val s = spark.newSession()
    s.conf.set("spark.sql.adaptive.enabled", "true")
    s.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    s.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
    s.conf.set(
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "32KB")
    s.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16KB")
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    s.conf.set("spark.sql.shuffle.partitions", "8")
    import s.implicits._
    // ~95% of probe rows share key 0 → one shuffle partition dwarfs the rest
    val probe = s.range(0, 100000L)
      .select(when($"id" % 20 =!= 0, 0L).otherwise($"id").as("k"),
        concat(lit("pad_"), $"id").as("pad"))
    val build = s.range(0, 2000L).select($"id".as("k"), lit("r").as("rv"))
    // consume pad ABOVE the join so column pruning keeps it in the probe
    // shuffle — k alone (95k identical longs) compresses below any
    // realistic skew threshold in the map output sizes AQE inspects.
    // GLOBAL agg, deliberately: a groupBy(k) above the join REQUIRES hash
    // partitioning on k, and the skew split breaks that guarantee (same
    // key in several partitions), so OptimizeSkewedJoin refuses to fire —
    // the real-world fix there is the manual salting Skew.saltedJoin does.
    val joined = probe.join(build, Seq("k"))
      .select(sum(length($"pad")).as("b"))
    // execute through THIS QueryExecution — a .write would compile a fresh
    // one and leave joined's adaptive plan unfinalized (isFinalPlan=false)
    joined.collect()
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("skew=true"),
      s"AQE did not mark the join skewed:\n$plan")
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

  test("substring dedup reads the corpus through ONE persisted gram pass") {
    // Round-7 regression pin: the gram set feeds three consumers whose
    // differing pushed-down null filters defeat exchange reuse, so without
    // the persist the corpus is scanned + exploded + hashed three times
    // (see EXPLAIN.md round-7). The InMemoryRelation is the fix's
    // signature; if someone drops the persist, the relation disappears
    // and this fails before the 3× cost ships.
    val plan = planOf(graft.llm.Dedup.dedupSubstring(spark, sf))
    assert(plan.contains("InMemoryTableScan"),
      "gram set no longer persisted — corpus will be scanned 3×")
    // and the split() projection stays OUTSIDE the gram lambda: the
    // O(len²) re-evaluation trap re-appears as split(text) inside the
    // transform/lambdafunction body (the plan prints the cached child
    // once per consumer, so count-based checks don't work — look for
    // split co-located with a lambda instead)
    val offending = plan.linesIterator
      .filter(l => l.contains("lambdafunction") && l.contains("split("))
    assert(offending.isEmpty,
      s"tokenization re-entered the gram lambda: ${offending.take(1).toSeq}")
  }

  test("heavy-hitter bigrams keep tokenization out of the gram lambda") {
    // same trap, third site: an inline tokens(text) argument to
    // wordNGrams is re-evaluated by every element_at reference
    val plan = planOf(graft.llm.HeavyHitters.docBigrams(spark, sf))
    val offending = plan.linesIterator
      .filter(l => l.contains("lambdafunction") && l.contains("split("))
    assert(offending.isEmpty,
      s"tokenization re-entered the gram lambda: ${offending.take(1).toSeq}")
  }
}
