package graft.zarr

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Hadoop FileSystem with OBJECT-STORE rename semantics: `rename` always
  * fails, exactly like a GCS/S3-style store with no rename primitive.
  * Everything else is the local FS, so the versioned commit protocol can
  * be proven end-to-end against the FS class the protocol exists for. */
class RenamelessFileSystem extends org.apache.hadoop.fs.RawLocalFileSystem {
  override def getScheme: String = "renameless"
  override def getUri: java.net.URI = java.net.URI.create("renameless:///")
  override def rename(src: org.apache.hadoop.fs.Path,
                      dst: org.apache.hadoop.fs.Path): Boolean = false
}

/** The versioned-store commit protocol (ZarrVersioned — the default
  * `commit` mode): atomicity via a single pointer PUT, proven on a
  * rename-less FS with crash-at-every-step failure injection. */
class ZarrVersionedSpec extends SparkSpec {
  import spark.implicits._

  spark.sparkContext.hadoopConfiguration
    .set("fs.renameless.impl", classOf[RenamelessFileSystem].getName)

  private def conf = ZarrIO.hadoopConf()

  private def localTmp(): String =
    java.nio.file.Files.createTempDirectory("zarr_v").resolve("m.zarr").toString

  private def renamelessTmp(): String = "renameless://" + localTmp()

  private def mat(n: Int, dim: Int) =
    (0 until n).map(i => (i.toLong, (0 until dim).map(c =>
      (i * dim + c).toDouble / 7.0))).toDF("row_id", "vec")

  private def rows(path: String): Long =
    spark.read.format("zarr").load(path).count()

  test("versioned write + overwrite commit on a rename-less object store") {
    val path = renamelessTmp()
    mat(60, 4).write.format("zarr").option("chunk_rows", 16)
      .mode("append").save(path)
    assert(rows(path) == 60)
    assert(ZarrVersioned.readPointer(path, conf).exists(_.startsWith("v1-")))
    // overwrite: a fresh version dir + one pointer PUT — zero renames
    mat(30, 4).write.format("zarr").option("chunk_rows", 16)
      .mode("overwrite").save(path)
    assert(rows(path) == 30)
    assert(ZarrVersioned.readPointer(path, conf).exists(_.startsWith("v2-")))
    // values survive the protocol bit-exactly
    val back = spark.read.format("zarr").load(path).collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    val src = mat(30, 4).collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    assert(back == src)
  }

  test("rename mode cannot commit on the same store — the premise holds") {
    val path = renamelessTmp()
    val e = intercept[Exception] {
      mat(20, 4).write.format("zarr").option("commit", "rename")
        .mode("append").save(path)
    }
    def chain(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ chain(t.getCause)
    assert(chain(e).exists(_.contains("rename")), chain(e).mkString("|"))
  }

  test("crash at every step: pre-pointer crashes keep the OLD store live") {
    val path = renamelessTmp()
    mat(50, 4).write.format("zarr").option("chunk_rows", 16)
      .mode("append").save(path)
    for (step <- Seq("after-tasks", "after-merge", "before-commit-point")) {
      ZarrVersioned.failpoint =
        s => if (s == step) throw new RuntimeException(s"crash@$s")
      try intercept[Exception] {
        mat(80, 4).write.format("zarr").option("chunk_rows", 16)
          .mode("overwrite").save(path)
      } finally ZarrVersioned.failpoint = _ => ()
      // the pointer never moved → the old store is fully intact
      assert(ZarrVersioned.readPointer(path, conf).exists(_.startsWith("v1-")),
        s"pointer moved at $step")
      assert(rows(path) == 50, s"old store damaged by crash at $step")
    }
  }

  test("crash AFTER the pointer PUT: the write is committed (job error or not)") {
    val path = renamelessTmp()
    mat(50, 4).write.format("zarr").option("chunk_rows", 16)
      .mode("append").save(path)
    ZarrVersioned.failpoint =
      s => if (s == "after-commit-point") throw new RuntimeException("crash@gc")
    // Spark surfaces the commit exception AND calls abort — which must
    // recognize the moved pointer and leave the now-live version alone
    try intercept[Exception] {
      mat(80, 4).write.format("zarr").option("chunk_rows", 16)
        .mode("overwrite").save(path)
    } finally ZarrVersioned.failpoint = _ => ()
    assert(ZarrVersioned.readPointer(path, conf).exists(_.startsWith("v2-")))
    assert(rows(path) == 80)
  }

  test("a crashed writer's orphan version dir is invisible; vacuum removes it") {
    val path = localTmp()
    mat(40, 4).write.format("zarr").option("chunk_rows", 16)
      .mode("append").save(path)
    val orphan = new java.io.File(path, "v9-deadbeef")
    assert(orphan.mkdirs())
    java.nio.file.Files.write(orphan.toPath.resolve("0.0"),
      Array[Byte](1, 2, 3))
    assert(rows(path) == 40) // readers follow only the pointer
    val removed = ZarrVersioned.vacuum(path, conf)
    assert(removed == Seq("v9-deadbeef"), removed.mkString(","))
    assert(!orphan.exists())
    assert(rows(path) == 40) // vacuum never touches the pointed version
  }

  test("overwriting a legacy flat store converts it and GCs the flat files") {
    val path = localTmp()
    mat(30, 4).write.format("zarr").option("chunk_rows", 16)
      .option("commit", "rename").mode("append").save(path)
    assert(new java.io.File(path, ".zarray").exists())
    mat(10, 4).write.format("zarr").option("chunk_rows", 16)
      .mode("overwrite").save(path) // versioned default
    assert(rows(path) == 10)
    val names = new java.io.File(path).listFiles().map(_.getName).toSet
    assert(!names.contains(".zarray"), names.mkString(","))
    assert(!names.exists(_.matches("\\d+\\.\\d+")), names.mkString(","))
    assert(names.contains("current"))
  }

  test("append onto a committed versioned store refuses loudly") {
    val path = localTmp()
    mat(20, 4).write.format("zarr").mode("append").save(path)
    val e = intercept[Exception] {
      mat(20, 4).write.format("zarr").mode("append").save(path)
    }
    assert(e.getMessage.contains("already committed"), e.getMessage)
  }

  test("time travel: gc=false retains the superseded version; " +
    "option(version) reads the old snapshot while the pointer serves " +
    "the new one; vacuum reclaims; writes through a pin refuse") {
    val path = localTmp()
    mat(50, 4).write.format("zarr").option("chunk_rows", 16)
      .mode("append").save(path)
    val v1 = ZarrVersioned.readPointer(path, conf).get
    mat(25, 4).write.format("zarr").option("chunk_rows", 16)
      .option("gc", "false").mode("overwrite").save(path)
    val v2 = ZarrVersioned.readPointer(path, conf).get
    assert(v2.startsWith("v2-"))
    assert(ZarrVersioned.versions(path, conf) == Seq(v1, v2))
    // the pointer serves the NEW data; the pin serves the OLD snapshot
    assert(rows(path) == 25)
    assert(spark.read.format("zarr").option("version", v1)
      .load(path).count() == 50)
    // pinned values are the v1 bytes, not a re-read of v2
    val pinned = spark.read.format("zarr").option("version", v1).load(path)
      .agg(sum(expr("aggregate(vec, 0D, (a, x) -> a + x)"))).head.getDouble(0)
    val orig = mat(50, 4)
      .agg(sum(expr("aggregate(vec, 0D, (a, x) -> a + x)"))).head.getDouble(0)
    assert(math.abs(pinned - orig) < 1e-9)
    // writes through a pin are refused — versions are immutable
    val e = intercept[Exception] {
      mat(5, 4).write.format("zarr").option("version", v1)
        .mode("overwrite").save(path)
    }
    assert(e.getMessage.contains("time-travel"), e.getMessage)
    // a bogus pin fails loudly and NAMES what exists
    val nf = intercept[Exception] {
      spark.read.format("zarr").option("version", "v7-nope").load(path).count()
    }
    assert(nf.getMessage.contains(v1) && nf.getMessage.contains("v7-nope"),
      nf.getMessage)
    // vacuum reclaims the retained snapshot, pointer keeps serving v2
    assert(ZarrVersioned.vacuum(path, conf) == Seq(v1))
    assert(rows(path) == 25)
  }

  test("default gc: the superseded version is reclaimed at commit") {
    val path = localTmp()
    mat(40, 4).write.format("zarr").mode("append").save(path)
    val v1 = ZarrVersioned.readPointer(path, conf).get
    mat(10, 4).write.format("zarr").mode("overwrite").save(path)
    assert(ZarrVersioned.versions(path, conf).forall(_ != v1))
    assert(rows(path) == 10)
  }
}
