package graft.zarr

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** DSv2 write path: round-trips, the two-phase boundary-band commit,
  * overwrite semantics, and the commit-time invariants. The session runs
  * shuffle.partitions=4, so the declared ordered distribution range-
  * partitions every write into ~4 slices with arbitrary band-straddling
  * boundaries — each multi-partition test exercises staging partials.
  * The writer's own `id > lastId` guard doubles as the proof that Spark
  * honored the declared ordering (an unhonored sort throws, not corrupts). */
class ZarrWriteSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("zarr_w").resolve("m.zarr").toString

  private def mat(n: Int, dim: Int) =
    (0 until n).map(i => (i.toLong, (0 until dim).map(c =>
      (i * dim + c).toDouble / 7.0))).toDF("row_id", "vec")

  // the default commit protocol is versioned (ZarrVersioned): data lives
  // under <path>/v<N>-<qid>/ named by the <path>/current pointer. Layout
  // assertions resolve the pointer exactly like the read path does.
  private def resolved(path: String): String =
    ZarrVersioned.resolve(path, ZarrIO.hadoopConf())
  private def meta(path: String): ZarrMeta = ZarrIO.readMeta(resolved(path))

  test("round-trip: 100×8, chunk_rows=16 (tail band + boundary partials)") {
    val path = tmp()
    mat(100, 8).write.format("zarr").option("chunk_rows", 16)
      .mode("append").save(path)
    // pointer committed; staging removed; meta has discovered geometry
    assert(new java.io.File(path, "current").exists())
    val dir = new java.io.File(resolved(path))
    assert(dir.listFiles().exists(_.getName == ".zarray"))
    assert(!dir.listFiles().exists(_.getName.startsWith(".staging")))
    val meta = this.meta(path)
    assert(meta.rows == 100 && meta.cols == 8 && meta.chunkRows == 16)
    val back = spark.read.format("zarr").load(path)
      .select(col("row_id"), col("vec")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    val src = mat(100, 8).collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    assert(back == src)
  }

  test("overwrite replaces the store with no stale chunks") {
    val path = tmp()
    mat(100, 4).write.format("zarr").option("chunk_rows", 16)
      .mode("append").save(path)
    mat(40, 4).write.format("zarr").option("chunk_rows", 16)
      .mode("overwrite").save(path)
    assert(meta(path).rows == 40)
    assert(spark.read.format("zarr").load(path).count() == 40)
    // 40 rows / 16 = 3 bands in a FRESH version dir (stale chunks can't
    // shadow-corrupt by construction); the superseded v1 dir was GC'd
    val chunks = new java.io.File(resolved(path)).listFiles()
      .map(_.getName).filter(_.matches("\\d+\\.\\d+")).sorted
    assert(chunks.toSeq == Seq("0.0", "1.0", "2.0"), chunks.mkString(","))
    val versions = new java.io.File(path).listFiles()
      .filter(_.isDirectory).map(_.getName).toSeq
    assert(versions.length == 1 && versions.head.startsWith("v2-"),
      versions.mkString(","))
  }

  test("append onto a committed store refuses loudly") {
    val path = tmp()
    mat(20, 4).write.format("zarr").mode("append").save(path)
    val e = intercept[Exception] {
      mat(20, 4).write.format("zarr").mode("append").save(path)
    }
    assert(e.getMessage.contains("already committed"), e.getMessage)
  }

  test("non-dense row_ids fail the commit-time density check") {
    val path = tmp()
    val sparse = mat(10, 4).filter(col("row_id") =!= 5)
    val e = intercept[Exception] {
      sparse.write.format("zarr").mode("append").save(path)
    }
    def chain(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ chain(t.getCause)
    assert(chain(e).exists(_.contains("dense 0..n-1")), chain(e).mkString("|"))
    // and nothing readable was committed: no pointer, no flat .zarray,
    // and the aborted version dir is gone
    assert(!new java.io.File(path, "current").exists())
    assert(!new java.io.File(path, ".zarray").exists())
    assert(!new java.io.File(path).exists() ||
      new java.io.File(path).listFiles().isEmpty)
  }

  test("float vecs write <f4 and read back as floats") {
    val path = tmp()
    (0L until 30L).map(i => (i, Seq.fill(4)(i.toFloat / 3.0f)))
      .toDF("row_id", "vec")
      .write.format("zarr").option("chunk_rows", 8).mode("append").save(path)
    val meta = this.meta(path)
    assert(meta.dtype == "<f4")
    val back = spark.read.format("zarr").load(path)
    assert(back.schema("vec").dataType ==
      org.apache.spark.sql.types.ArrayType(
        org.apache.spark.sql.types.FloatType, containsNull = false))
    assert(back.count() == 30)
  }

  test("a mid-job failure aborts: no store, no temp sibling left behind") {
    val path = tmp()
    val poison = org.apache.spark.sql.functions.udf { (id: Long) =>
      if (id == 57L) throw new RuntimeException("poison row")
      id
    }
    val df = mat(100, 4)
      .withColumn("row_id", poison(col("row_id")))
    intercept[Exception] {
      df.write.format("zarr").option("chunk_rows", 16)
        .mode("append").save(path)
    }
    // BatchWrite.abort dropped the in-flight version dir; no pointer was
    // ever written, and no .tmp-* sibling lingers. (The poison may fire
    // during the range-exchange sampling BEFORE the writer factory runs,
    // in which case the store dir was never created at all.)
    assert(!new java.io.File(path, ".zarray").exists())
    assert(!new java.io.File(path, "current").exists())
    assert(!Option(new java.io.File(path).listFiles()).toSeq.flatten
      .exists(_.isDirectory))
    val parent = new java.io.File(path).getParentFile
    assert(!parent.listFiles().exists(_.getName.contains(".tmp-")),
      parent.listFiles().map(_.getName).mkString(","))
    intercept[Exception] { spark.read.format("zarr").load(path).count() }
    // and a subsequent overwrite of the same path succeeds cleanly
    mat(40, 4).write.format("zarr").option("chunk_rows", 16)
      .mode("overwrite").save(path)
    assert(spark.read.format("zarr").load(path).count() == 40)
  }

  test("a FAILED overwrite leaves the previously committed store intact") {
    val path = tmp()
    mat(50, 4).write.format("zarr").option("chunk_rows", 16)
      .mode("append").save(path)
    val poison = org.apache.spark.sql.functions.udf { (id: Long) =>
      if (id == 30L) throw new RuntimeException("poison row")
      id
    }
    intercept[Exception] {
      mat(80, 4).withColumn("row_id", poison(col("row_id")))
        .write.format("zarr").option("chunk_rows", 16)
        .mode("overwrite").save(path)
    }
    // the old store must still be fully readable — overwrite only moves
    // the pointer at commit, after the replacement is complete
    assert(meta(path).rows == 50)
    assert(spark.read.format("zarr").load(path).count() == 50)
    assert(new String(java.nio.file.Files.readAllBytes(
      new java.io.File(path, "current").toPath), "UTF-8").trim
      .startsWith("v1-"))
    val parent = new java.io.File(path).getParentFile
    assert(!parent.listFiles().exists(_.getName.contains(".tmp-")))
  }

  test("chunk_cols writes a 2-D chunk grid the reader reassembles") {
    val path = tmp()
    // 8 cols / chunk_cols=3 → 3 column chunks per band (last one padded)
    mat(40, 8).write.format("zarr")
      .option("chunk_rows", 16).option("chunk_cols", 3)
      .mode("append").save(path)
    val meta = this.meta(path)
    assert(meta.chunkCols == 3 && meta.colChunkCount == 3)
    val names = new java.io.File(resolved(path)).listFiles().map(_.getName)
    assert(names.count(_.matches("\\d+\\.\\d+")) == 9, names.mkString(","))
    assert(names.contains("0.2") && names.contains("2.1"))
    val back = spark.read.format("zarr").load(path).collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    val src = mat(40, 8).collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    assert(back == src)
  }

  test("property: random (n, chunk_rows, chunk_cols, dim) round-trips") {
    val rnd = new scala.util.Random(13)
    for (round <- 1 to 6) {
      val n = 1 + rnd.nextInt(120)
      val dim = 1 + rnd.nextInt(10)
      val cr = 1 + rnd.nextInt(40)
      val cc = 1 + rnd.nextInt(dim + 2) // may exceed dim: clamped
      val path = tmp()
      mat(n, dim).write.format("zarr")
        .option("chunk_rows", cr).option("chunk_cols", cc)
        .mode("append").save(path)
      val meta = this.meta(path)
      assert(meta.rows == n && meta.cols == dim && meta.chunkRows == cr)
      assert(meta.chunkCols == math.min(cc, dim))
      val back = spark.read.format("zarr").load(path).collect()
        .map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
      val src = mat(n, dim).collect()
        .map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
      assert(back == src,
        s"round $round: n=$n dim=$dim cr=$cr cc=$cc mismatch")
    }
  }

  test("a user read-schema that disagrees with the store is rejected") {
    val path = tmp()
    mat(20, 4).write.format("zarr").mode("append").save(path) // <f8 store
    // reading it as floats would silently produce garbage (the scan
    // emits doubles regardless) — must fail loudly instead
    val e = intercept[Exception] {
      spark.read.format("zarr")
        .schema("row_id BIGINT, vec ARRAY<FLOAT>").load(path).collect()
    }
    assert(e.getMessage.contains("does not match"), e.getMessage)
    // an IDENTICAL user schema (modulo nullability) is fine
    assert(spark.read.format("zarr")
      .schema("row_id BIGINT, vec ARRAY<DOUBLE>").load(path).count() == 20)
  }

  test("DSv2 write == ZarrSink.writeMatrix byte-for-byte at the read layer") {
    val a = tmp(); val b = tmp()
    val df = mat(100, 8)
    df.write.format("zarr").option("chunk_rows", 16).mode("append").save(a)
    ZarrSink.writeMatrix(df.select(col("row_id").as("id"), col("vec")),
      b, dim = 8, chunkRows = 16)
    val ra = spark.read.format("zarr").load(a).orderBy("row_id").collect()
    val rb = spark.read.format("zarr").load(b).orderBy("row_id").collect()
    assert(ra.toSeq == rb.toSeq)
  }
}
