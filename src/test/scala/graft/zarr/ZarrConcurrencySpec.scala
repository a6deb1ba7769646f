package graft.zarr

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.util.concurrent.{CountDownLatch, TimeUnit}

/** MULTI-WRITER torture for the versioned commit protocol — the
  * object-store reality the single-writer crash-injection spec
  * (ZarrVersionedSpec) does not cover:
  *
  *  - two writers racing version allocation from the same base: both
  *    derive query-unique dirs (no collision), the last pointer PUT
  *    wins, the loser's version survives INTACT as a pinned-readable
  *    snapshot until vacuum, and no committed version is ever lost;
  *  - a reader pinned to a retained version vs vacuum: reads
  *    materialized before the vacuum are stable, the pointed version
  *    is never vacuumed, and a pin AFTER vacuum fails loudly with the
  *    available-version listing;
  *  - duplicate delivery of the same `version_name` (the exactly-once
  *    retry lever): a concurrent duplicate leaves the store committed
  *    and complete whichever attempt wins, and a POST-commit replay of
  *    the same name refuses loudly instead of rebuilding live data. */
class ZarrConcurrencySpec extends SparkSpec {
  import spark.implicits._

  spark.sparkContext.hadoopConfiguration
    .set("fs.renameless.impl", classOf[RenamelessFileSystem].getName)

  private def conf = ZarrIO.hadoopConf()

  private def localTmp(): String =
    java.nio.file.Files.createTempDirectory("zarr_cc").resolve("m.zarr").toString

  private def renamelessTmp(): String = "renameless://" + localTmp()

  private def mat(n: Int, dim: Int) =
    (0 until n).map(i => (i.toLong, (0 until dim).map(c =>
      (i * dim + c).toDouble / 7.0))).toDF("row_id", "vec")

  private def rows(path: String): Long =
    spark.read.format("zarr").load(path).count()

  test("two writers racing from the same base: last PUT wins, the " +
    "loser's version survives intact, vacuum removes exactly it") {
    val path = renamelessTmp()
    mat(50, 4).write.format("zarr").option("chunk_rows", 16)
      .mode("append").save(path)
    val v1 = ZarrVersioned.readPointer(path, conf).get

    // writer A (70 rows) pauses at the brink of its commit-point PUT;
    // writer B (30 rows) starts AFTER A is parked — so both writers
    // derived their version from the same v1 base — and commits fully;
    // then A resumes and PUTs last
    val aParked = new CountDownLatch(1)
    val bCommitted = new CountDownLatch(1)
    ZarrVersioned.failpoint = s =>
      if (s == "before-commit-point" &&
          Thread.currentThread().getName == "graft-writer-a") {
        aParked.countDown()
        assert(bCommitted.await(120, TimeUnit.SECONDS), "writer B stuck")
      }
    var aFailure: Option[Throwable] = None
    val a = new Thread(() => {
      try mat(70, 4).write.format("zarr").option("chunk_rows", 16)
        .mode("overwrite").save(path)
      catch { case t: Throwable => aFailure = Some(t) }
    }, "graft-writer-a")
    try {
      a.start()
      assert(aParked.await(120, TimeUnit.SECONDS), "writer A never parked")
      mat(30, 4).write.format("zarr").option("chunk_rows", 16)
        .mode("overwrite").save(path)
      bCommitted.countDown()
      a.join(120000)
      assert(!a.isAlive, "writer A stuck")
    } finally ZarrVersioned.failpoint = _ => ()
    assert(aFailure.isEmpty, s"writer A failed: $aFailure")

    // last PUT wins: the pointer names A's version; A's data is live
    val live = ZarrVersioned.readPointer(path, conf).get
    assert(live.startsWith("v2-") && live != v1)
    assert(rows(path) == 70)
    // B's losing version was never damaged: both v2 dirs exist, B's is
    // pinned-readable with its full 30 rows (a consistent snapshot)
    val vs = ZarrVersioned.versions(path, conf)
    assert(vs.count(_.startsWith("v2-")) == 2, vs.mkString(","))
    val loser = vs.filter(_.startsWith("v2-")).filterNot(_ == live)
    assert(loser.size == 1)
    assert(spark.read.format("zarr").option("version", loser.head)
      .load(path).count() == 30)
    // v1 was GC'd by B's commit (the only commit whose old pointer was
    // v1 and still live at GC time)
    assert(!vs.contains(v1))
    // vacuum removes exactly the orphaned loser; the live store stays
    val removed = ZarrVersioned.vacuum(path, conf)
    assert(removed == loser, s"vacuum removed $removed, expected $loser")
    assert(rows(path) == 70)
  }

  test("pinned reader vs vacuum: pre-vacuum reads stable, the live " +
    "version unvacuumable, a post-vacuum pin fails loudly") {
    val path = renamelessTmp()
    mat(40, 4).write.format("zarr").option("chunk_rows", 16)
      .mode("append").save(path)
    val v1 = ZarrVersioned.readPointer(path, conf).get
    mat(20, 4).write.format("zarr").option("chunk_rows", 16)
      .option("gc", "false").mode("overwrite").save(path)
    // pinned read materialized BEFORE vacuum: the retained snapshot
    val pinned = spark.read.format("zarr").option("version", v1).load(path)
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    assert(pinned.size == 40)
    assert(pinned == mat(40, 4).collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap)
    val removed = ZarrVersioned.vacuum(path, conf)
    assert(removed == Seq(v1)) // never the pointed version
    assert(rows(path) == 20)   // unpinned readers undisturbed
    // the pinned data already read stays what it was (trivially — it
    // was materialized); a NEW pin on the vacuumed version fails loudly
    // and names what IS available
    val e = intercept[Exception] {
      spark.read.format("zarr").option("version", v1).load(path).count()
    }
    def chain(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ chain(t.getCause)
    val msg = chain(e).mkString("|")
    assert(msg.contains(v1) && msg.contains("available"), msg)
  }

  test("duplicate delivery of one version_name: concurrent duplicate " +
    "commits exactly once and completely; post-commit replay refuses") {
    val path = renamelessTmp()
    mat(50, 4).write.format("zarr").option("chunk_rows", 16)
      .mode("append").save(path)
    val dup = "v7-aaaa5555" // both deliveries pin the SAME version name
    def writeDup(): Unit =
      mat(40, 4).write.format("zarr").option("chunk_rows", 16)
        .option("version_name", dup).mode("overwrite").save(path)

    // attempt A parks before its commit PUT; attempt B (identical data,
    // identical name — a redelivered epoch) runs to completion; A then
    // resumes into an already-committed world
    val aParked = new CountDownLatch(1)
    val bCommitted = new CountDownLatch(1)
    ZarrVersioned.failpoint = s =>
      if (s == "before-commit-point" &&
          Thread.currentThread().getName == "graft-writer-dup") {
        aParked.countDown()
        assert(bCommitted.await(120, TimeUnit.SECONDS), "duplicate B stuck")
      }
    val a = new Thread(() => {
      // A may commit idempotently or fail loudly (its staging was
      // superseded by B's identical build) — either is a correct
      // duplicate-delivery outcome; what it must NEVER do is damage
      // the committed store (asserted below)
      try writeDup() catch { case _: Throwable => () }
    }, "graft-writer-dup")
    try {
      a.start()
      assert(aParked.await(120, TimeUnit.SECONDS), "duplicate A never parked")
      writeDup()
      bCommitted.countDown()
      a.join(120000)
      assert(!a.isAlive, "duplicate A stuck")
    } finally ZarrVersioned.failpoint = _ => ()

    // exactly one committed version under that name, complete + correct
    assert(ZarrVersioned.readPointer(path, conf).contains(dup))
    assert(ZarrVersioned.versions(path, conf).count(_ == dup) == 1)
    val back = spark.read.format("zarr").load(path).collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    assert(back == mat(40, 4).collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap)

    // a replay AFTER the commit refuses loudly — the caller-side skip
    // (ZarrStreamSink's epoch log) is the protocol, not a rebuild
    val e = intercept[Exception] { writeDup() }
    def chain(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ chain(t.getCause)
    assert(chain(e).mkString("|").contains("CURRENTLY COMMITTED"),
      chain(e).mkString("|"))
  }
}
