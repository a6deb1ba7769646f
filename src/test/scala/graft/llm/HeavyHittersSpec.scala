package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

class HeavyHittersSpec extends SparkSpec {
  import spark.implicits._

  test("misra-gries keeps every item above the 1/(k+1) partition frequency") {
    // 60% a, 25% b, rest singletons — k=4 must retain a and b
    val items = Seq.fill(60)("a") ++ Seq.fill(25)("b") ++
      (1 to 15).map(i => s"tail_$i")
    val survivors = HeavyHitters.misraGries(items.iterator, k = 4).toSet
    assert(survivors.contains("a") && survivors.contains("b"), survivors)
    assert(survivors.size <= 4)
  }

  test("candidate union is a superset of true heavy hitters across partitions") {
    // skewed synthetic stream over 8 partitions with adversarial layout:
    // the hot keys are CONCENTRATED in some partitions, cold ones spread
    val rows = (Seq.fill(400)("hot1") ++ Seq.fill(150)("hot2") ++
      (1 to 450).map(i => s"cold_${i % 300}")).sorted // sorted → clustering
    val phi = 0.1 // threshold 100 of 1000 → hot1, hot2
    val k = math.ceil(1.0 / phi).toInt
    val df = spark.sparkContext.parallelize(rows, 8).toDF("item")
    val cands = df.as[String].mapPartitions(p =>
      HeavyHitters.misraGries(p, k)).collect().toSet
    val truth = rows.groupBy(identity).collect {
      case (it, occ) if occ.size >= rows.size * phi => it
    }.toSet
    assert(truth == Set("hot1", "hot2"))
    assert(truth.subsetOf(cands), s"lost hitters: ${truth -- cands}")
  }

  test("heavyHitters equals brute-force GROUP BY/HAVING on sf0.001 bigrams") {
    val items = HeavyHitters.docBigrams(spark, sf)
    val out = HeavyHitters.heavyHitters(items, HeavyHitters.Phi)
      .as[(String, Long)].collect().toSeq
    val n = items.count()
    val brute = items.groupBy("item").agg(count(lit(1)).as("n"))
      .filter(col("n") >= lit(n) * HeavyHitters.Phi)
      .orderBy(col("n").desc, col("item"))
      .as[(String, Long)].collect().toSeq
    assert(out == brute, s"got ${out.size} vs brute ${brute.size}")
    assert(out.nonEmpty) // Phi is tuned to be selective but nonempty
  }

  test("pass-2 recount joins the candidate set broadcast, not shuffled") {
    val df = HeavyHitters.textHeavyHitters(spark, sf)
    val plan = planOf(df)
    assert(plan.contains("BroadcastHashJoin"), plan.take(2000))
    // the exact recount is ONE hash aggregate over the bounded bucket
    // domain — a second full-domain groupBy would defeat the point
    assert(!plan.contains("SortMergeJoin"), plan.take(2000))
  }

  test("degenerate inputs: empty corpus and phi=1") {
    val empty = Seq.empty[String].toDF("item")
    assert(HeavyHitters.heavyHitters(empty, 0.5).count() == 0)
    val one = Seq("x", "x", "y").toDF("item")
    // phi=1: only an item equal to the whole stream qualifies
    assert(HeavyHitters.heavyHitters(one, 1.0).count() == 0)
    val all = Seq("x", "x", "x").toDF("item")
    val r = HeavyHitters.heavyHitters(all, 1.0).as[(String, Long)].collect()
    assert(r.toSeq == Seq(("x", 3L)))
  }
}
