package graft.props

import org.scalacheck.{Gen, Prop, Properties, Test}
import org.scalacheck.Prop.forAll
import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.sc.ScMatrix

/** ScalaCheck algebraic properties (SURVEY.md §5.2.3) — randomized inputs,
  * invariant assertions, shrinking on failure. Kept at 10 samples per
  * property: each sample runs Spark jobs. */
object ScProperties extends Properties("graft") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(10).withWorkers(1)

  private lazy val spark = SparkSpec.session
  import spark.implicits._

  /** Small dense matrices: 1..12 rows × 1..8 dims, non-negative values with
    * planted zeros. */
  private val matrixGen: Gen[Seq[(Long, Seq[Double])]] = for {
    nRows <- Gen.choose(1, 12)
    nDims <- Gen.choose(1, 8)
    rows <- Gen.listOfN(nRows, Gen.listOfN(nDims,
      Gen.frequency(1 -> Gen.const(0.0), 3 -> Gen.choose(0.1, 50.0))))
  } yield rows.zipWithIndex.map { case (v, i) => (i.toLong, v: Seq[Double]) }

  private def toDf(m: Seq[(Long, Seq[Double])]) = m.toDF("id", "vec")

  property("filter_cells(minGenes=0) is identity on row count") =
    forAll(matrixGen) { m =>
      ScMatrix.filterCells(toDf(m), minGenes = 0, tau = 0.0).count() == m.size
    }

  property("normalize_per_cell: every non-zero row sums to target") =
    forAll(matrixGen, Gen.choose(1.0, 1000.0)) { (m, target) =>
      val out = ScMatrix.normalizePerCell(toDf(m), Some(target))
        .select($"id", aggregate($"vec", lit(0.0), _ + _).as("s"))
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      m.forall { case (id, v) =>
        val orig = v.sum
        if (orig == 0.0) out(id) == 0.0
        else math.abs(out(id) - target) < 1e-6 * target
      }
    }

  property("scale: per-dim mean ~0 and (var>0 dims) std ~1, unclipped") =
    forAll(matrixGen) { m =>
      val out = ScMatrix.scaleZ(toDf(m), maxValue = 1e18)
      val stats = out.select(posexplode($"vec").as(Seq("pos", "x")))
        .groupBy("pos").agg(avg($"x").as("mu"), stddev_pop($"x").as("s"))
        .collect()
      stats.forall { r =>
        val mu = r.getDouble(1); val s = r.getDouble(2)
        math.abs(mu) < 1e-6 && (s == 0.0 || math.abs(s - 1.0) < 1e-6)
      }
    }

  property("log1p then expm1 is identity") =
    forAll(matrixGen) { m =>
      val back = ScMatrix.log1p(toDf(m))
        .withColumn("vec", transform($"vec", x => expm1(x)))
        .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
      m.forall { case (id, v) =>
        v.zip(back(id)).forall { case (a, b) => math.abs(a - b) < 1e-9 * (1 + a) }
      }
    }

  property("filter_genes keeps a subset of dims, preserved across all rows") =
    forAll(matrixGen, Gen.choose(0.0, 1.0)) { (m, frac) =>
      val out = ScMatrix.filterGenes(toDf(m), frac, tau = 0.0)
        .select($"id", size($"vec").as("k")).collect()
      val ks = out.map(_.getInt(1)).distinct
      ks.length == 1 && ks.head <= m.head._2.size
    }
}

/** Relational/set-op and dedup algebra properties on generated tables. */
object RelProperties extends Properties("graft.rel") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(10).withWorkers(1)

  private lazy val spark = SparkSpec.session
  import spark.implicits._

  private val keysGen: Gen[(List[Long], List[Long])] = for {
    a <- Gen.listOf(Gen.choose(0L, 30L))
    b <- Gen.listOf(Gen.choose(0L, 30L))
  } yield (a, b)

  property("unionAll count additivity; intersect/except partition the left") =
    forAll(keysGen) { case (a, b) =>
      val da = a.toDF("k"); val db = b.toDF("k")
      val union = da.unionAll(db).count() == a.size + b.size
      val inter = da.intersect(db).collect().map(_.getLong(0)).toSet
      val exc = da.except(db).collect().map(_.getLong(0)).toSet
      union &&
        inter == (a.toSet & b.toSet) &&
        exc == (a.toSet -- b.toSet) &&
        (inter & exc).isEmpty
    }

  property("exact dedup: idempotent and count-preserving") =
    forAll(Gen.nonEmptyListOf(Gen.oneOf("a b c", "d e f", "g h", "a b c ")))
    { texts =>
      val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val groups = df.groupBy(md5($"text")).agg(
        min($"doc_id").as("rep"), count(lit(1)).as("n")).collect()
      groups.map(_.getLong(2)).sum == texts.size &&
        groups.length == texts.distinct.size
    }

  property("simhash is token-order invariant") = {
    val textGen = Gen.nonEmptyListOf(
      Gen.oneOf("spark", "sql", "join", "window", "agg")).map(_.mkString(" "))
    forAll(textGen) { text =>
      val shuffled = new scala.util.Random(1).shuffle(text.split(" ").toList)
        .mkString(" ")
      val df = Seq((0L, text), (1L, shuffled)).toDF("doc_id", "text")
      val sh = graft.llm.Dedup.simhash(df).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      sh(0L) == sh(1L)
    }
  }

  property("cosine similarity is bounded and symmetric") = {
    val vecGen = Gen.listOfN(8, Gen.choose(-5.0, 5.0))
      .suchThat(v => v.exists(_ != 0.0))
    forAll(vecGen, vecGen) { (a, b) =>
      val df = Seq((a, b)).toDF("a", "b")
      val r = df.select(
        graft.llm.Similarity.cosine($"a", $"b").as("ab"),
        graft.llm.Similarity.cosine($"b", $"a").as("ba")).head()
      val ab = r.getDouble(0); val ba = r.getDouble(1)
      math.abs(ab) <= 1.0 + 1e-9 && math.abs(ab - ba) < 1e-12
    }
  }
}

/** Apportionment algebra for the deterministic count downsampler. */
object DownsampleProperties extends Properties("graft.sc.downsample") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(10).withWorkers(1)

  private lazy val spark = SparkSpec.session
  import spark.implicits._

  /** Integer count matrices for the downsampling apportionment. */
  private val countsGen: Gen[Seq[(Long, Seq[Long])]] = for {
    nRows <- Gen.choose(1, 8)
    nDims <- Gen.choose(1, 8)
    rows <- Gen.listOfN(nRows, Gen.listOfN(nDims, Gen.choose(0L, 20L)))
  } yield rows.zipWithIndex.map { case (v, i) => ((i + 1).toLong, v: Seq[Long]) }

  property("conserves exactly min(total, target)") =
    forAll(countsGen, Gen.choose(1L, 30L)) { (m, target) =>
      val df = m.toDF("vec_id", "c")
      val out = graft.sc.Markers.downsampleFor(df, target).collect()
        .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
      m.forall { case (id, c) =>
        val tot = c.sum
        if (tot == 0) !out.contains(id) // zero-total rows are dropped
        else out(id) == ((tot, math.min(tot, target)))
      }
    }

  property("per-gene outputs never exceed inputs (via wsum bound)") =
    forAll(countsGen, Gen.choose(1L, 30L)) { (m, target) =>
      // wsum(ds) <= wsum(c) for every row, since ds_i <= c_i pointwise:
      // base_i = floor(c_i*T/tot) <= c_i for T <= tot, +1 at most once
      // per position only when the floor lost a fractional unit
      val df = m.toDF("vec_id", "c")
      val out = graft.sc.Markers.downsampleFor(df, target).collect()
        .map(r => r.getLong(0) -> r.getLong(3)).toMap
      m.forall { case (id, c) =>
        val wsumIn = c.zipWithIndex.map { case (x, i) => x * (i + 1) }.sum
        c.sum == 0 || out(id) <= wsumIn
      }
    }
}
