package graft.zarr

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.io.File
import java.nio.file.Files

/** Gates for the AnnData-group layer:
  *  - 1-D round-trips for every supported dtype (<i4 <i8 <f8 |S),
  *    including a non-chunk-multiple length (partial-chunk padding) and
  *    both compressor settings;
  *  - missing chunk object == fill (legal sparse zarr);
  *  - consolidation: `.zmetadata` carries every metadata key, and 1-D
  *    member reads NEVER touch member `.zarray`s once it exists —
  *    proven by deleting them and re-reading. */
class ZarrGroupSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(): String =
    Files.createTempDirectory("zarr_grp_spec").toString

  test("1-D round-trip: <i8 zlib, <f8 raw, <i4, non-multiple length") {
    val dir = tmp()
    val n = 257 // chunk 100 -> 2 full chunks + 57-elem partial
    val longs = spark.range(n).select(col("id"), (col("id") * 3).as("value"))
    val m1 = ZarrGroup.write1(longs, s"$dir/a", chunk = 100, dtype = "<i8")
    assert(m1.numChunks == 3)
    val got1 = ZarrGroup.read1(spark, s"$dir/a", ZarrGroup.read1Meta(s"$dir/a"))
      .as[(Long, Long)].collect().sortBy(_._1)
    assert(got1.toSeq == (0 until n).map(i => (i.toLong, i * 3L)))

    val dbl = spark.range(n).select(col("id"), (col("id") / 7.0).as("value"))
    ZarrGroup.write1(dbl, s"$dir/b", chunk = 64, dtype = "<f8", zlib = false)
    val got2 = ZarrGroup.read1(spark, s"$dir/b", ZarrGroup.read1Meta(s"$dir/b"))
      .as[(Long, Double)].collect().sortBy(_._1)
    assert(got2.toSeq == (0 until n).map(i => (i.toLong, i / 7.0)))

    val ints = spark.range(n).select(col("id"), (col("id") - 5).as("value"))
    ZarrGroup.write1(ints, s"$dir/c", chunk = 100, dtype = "<i4")
    val got3 = ZarrGroup.read1(spark, s"$dir/c", ZarrGroup.read1Meta(s"$dir/c"))
      .as[(Long, Long)].collect().sortBy(_._1)
    assert(got3.toSeq == (0 until n).map(i => (i.toLong, i - 5L)))
  }

  test("1-D |S strings round-trip NUL-stripped; oversize write fails loudly") {
    val dir = tmp()
    val df = spark.range(10)
      .select(col("id"), concat(lit("s"), col("id")).as("value"))
    ZarrGroup.write1(df, s"$dir/s", chunk = 4, dtype = "|S4")
    val got = ZarrGroup.read1(spark, s"$dir/s", ZarrGroup.read1Meta(s"$dir/s"))
      .as[(Long, String)].collect().sortBy(_._1)
    assert(got.toSeq == (0 until 10).map(i => (i.toLong, s"s$i")))
    val wide = spark.range(3)
      .select(col("id"), lit("toolong").as("value"))
    val e = intercept[org.apache.spark.SparkException] {
      ZarrGroup.write1(wide, s"$dir/w", chunk = 4, dtype = "|S4")
    }
    assert(e.getMessage != null)
  }

  test("missing chunk object reads as fill") {
    val dir = tmp()
    val df = spark.range(200).select(col("id"), (col("id") + 1).as("value"))
    ZarrGroup.write1(df, s"$dir/a", chunk = 100, dtype = "<i8", zlib = false)
    assert(new File(s"$dir/a/1").delete()) // second chunk gone
    val got = ZarrGroup.read1(spark, s"$dir/a", ZarrGroup.read1Meta(s"$dir/a"))
      .as[(Long, Long)].collect().sortBy(_._1)
    assert(got.take(100).toSeq == (0 until 100).map(i => (i.toLong, i + 1L)))
    assert(got.drop(100).forall(_._2 == 0L))
  }

  test("consolidated metadata carries all keys and is preferred over member .zarray") {
    val dir = tmp()
    ZarrGroup.write1(
      spark.range(50).select(col("id"), col("id").as("value")),
      s"$dir/obs/n", chunk = 20, dtype = "<i8")
    ZarrGroup.write1(
      spark.range(50).select(col("id"),
        concat(lit("x"), col("id")).as("value")),
      s"$dir/obs/name", chunk = 20, dtype = "|S4")
    ZarrGroup.writeGroupMarker(dir)
    ZarrGroup.writeGroupMarker(s"$dir/obs")
    val nKeys = ZarrGroup.consolidate(dir)
    assert(nKeys == 4) // 2 .zgroup + 2 .zarray
    val m = ZarrGroup.consolidated(dir).get
    assert(m.contains(".zgroup") && m.contains("obs/n/.zarray") &&
      m.contains("obs/name/.zarray"))
    // the object-store contract: with .zmetadata present, member
    // .zarray objects are never read — delete them and reads still work
    assert(new File(s"$dir/obs/n/.zarray").delete())
    assert(new File(s"$dir/obs/name/.zarray").delete())
    val ns = ZarrGroup.readMember1(spark, dir, "obs/n")
      .as[(Long, Long)].collect().sortBy(_._1)
    assert(ns.toSeq == (0 until 50).map(i => (i.toLong, i.toLong)))
    val names = ZarrGroup.readMember1(spark, dir, "obs/name")
      .as[(Long, String)].collect().sortBy(_._1)
    assert(names.toSeq == (0 until 50).map(i => (i.toLong, s"x$i")))
    // an unknown member fails loudly, naming the missing key
    val err = intercept[IllegalArgumentException] {
      ZarrGroup.memberMeta1(dir, "obs/ghost")
    }
    assert(err.getMessage.contains("obs/ghost"))
  }

  test("categorical member decodes codes through the dictionary; -1 is NULL") {
    val dir = tmp()
    ZarrGroup.write1(
      spark.range(6).select(col("id"),
        (col("id") % 3 - 1).as("value")), // codes -1,0,1,-1,0,1
      s"$dir/ct/codes", chunk = 4, dtype = "<i4")
    ZarrGroup.write1(
      spark.range(2).select(col("id"),
        concat(lit("c"), col("id")).as("value")),
      s"$dir/ct/categories", chunk = 4, dtype = "|S4")
    ZarrGroup.writeGroupMarker(dir)
    ZarrGroup.writeGroupMarker(s"$dir/ct")
    ZarrGroup.writeAttrs(s"$dir/ct", """{"encoding-type":"categorical"}""")
    ZarrGroup.consolidate(dir)
    val got = ZarrGroup.readCategorical(spark, dir, "ct")
      .collect().map(r => (r.getLong(0), Option(r.getString(1))))
      .sortBy(_._1)
    assert(got.toSeq == Seq(0L -> None, 1L -> Some("c0"), 2L -> Some("c1"),
      3L -> None, 4L -> Some("c0"), 5L -> Some("c1")))
    // .zattrs rode the consolidation
    assert(ZarrGroup.consolidated(dir).get.contains("ct/.zattrs"))
  }

  test("members() lists arrays from consolidated metadata alone") {
    val g = ZarrQueries.fixtureGroup(spark, sf)
    assert(ZarrGroup.members(g) == Seq("X", "obs/cell_type/categories",
      "obs/cell_type/codes", "obs/label", "obs/label_name", "var/col_id"))
    val e = intercept[IllegalArgumentException] {
      ZarrGroup.members(Files.createTempDirectory("no_zmeta").toString)
    }
    assert(e.getMessage.contains(".zmetadata"))
  }

  test("<i8 round-trips int64 beyond 2^53 exactly (typed long path)") {
    val dir = tmp()
    // 2^53 + k is not representable as double for odd k — the old
    // cast("double") shuffle rounded these silently
    val base = (1L << 53) + 1
    val df = spark.range(10).select(col("id"),
      (col("id") * 7 + base).as("value"))
    ZarrGroup.write1(df, s"$dir/a", chunk = 4, dtype = "<i8")
    val got = ZarrGroup.read1(spark, s"$dir/a", ZarrGroup.read1Meta(s"$dir/a"))
      .as[(Long, Long)].collect().sortBy(_._1)
    assert(got.toSeq == (0 until 10).map(i => (i.toLong, i * 7L + base)))
  }

  test("external store's non-zero fill_value is honored for missing chunks") {
    val dir = tmp()
    val df = spark.range(100).select(col("id"), (col("id") + 1).as("value"))
    ZarrGroup.write1(df, s"$dir/a", chunk = 50, dtype = "<i8", zlib = false)
    // rewrite the metadata as an external writer with fill_value = 7
    // would, then drop chunk 1: its elements must read back as 7, not 0
    val metaP = java.nio.file.Paths.get(s"$dir/a/.zarray")
    val ext = new String(Files.readAllBytes(metaP), "UTF-8")
      .replace("\"fill_value\":0", "\"fill_value\":7")
    Files.write(metaP, ext.getBytes("UTF-8"))
    new File(s"$dir/a/..zarray.crc").delete() // out-of-band edit: drop sidecar
    assert(new File(s"$dir/a/1").delete())
    val meta = ZarrGroup.read1Meta(s"$dir/a")
    assert(meta.fill == "7")
    val got = ZarrGroup.read1(spark, s"$dir/a", meta)
      .as[(Long, Long)].collect().sortBy(_._1)
    assert(got.take(50).toSeq == (0 until 50).map(i => (i.toLong, i + 1L)))
    assert(got.drop(50).forall(_._2 == 7L))
    // a non-empty |S fill has no sane synthesis — loud failure
    val sDir = tmp()
    ZarrGroup.write1(spark.range(4).select(col("id"),
      lit("ab").as("value")), s"$sDir/s", chunk = 4, dtype = "|S2")
    val sMetaP = java.nio.file.Paths.get(s"$sDir/s/.zarray")
    val sExt = new String(Files.readAllBytes(sMetaP), "UTF-8")
      .replace("\"fill_value\":\"\"", "\"fill_value\":\"zz\"")
    Files.write(sMetaP, sExt.getBytes("UTF-8"))
    new File(s"$sDir/s/..zarray.crc").delete()
    val e = intercept[IllegalArgumentException] {
      ZarrGroup.read1Meta(s"$sDir/s")
    }
    assert(e.getMessage.contains("fill_value"))
  }

  test("|S strings are UTF-8: non-ASCII round-trips byte-exactly") {
    val dir = tmp()
    // 'é' = 2 UTF-8 bytes, '≈' = 3 — width must count octets, and the
    // decode side must parse them back (ASCII would yield '?')
    val df = spark.createDataFrame(Seq((0L, "é"), (1L, "a≈b"), (2L, "ok")))
      .toDF("id", "value")
    ZarrGroup.write1(df, s"$dir/s", chunk = 2, dtype = "|S5")
    val got = ZarrGroup.read1(spark, s"$dir/s", ZarrGroup.read1Meta(s"$dir/s"))
      .as[(Long, String)].collect().sortBy(_._1)
    assert(got.toSeq == Seq(0L -> "é", 1L -> "a≈b", 2L -> "ok"))
    // oversize in BYTES (not chars) still fails loudly: "éé" = 4 > 3
    val e = intercept[org.apache.spark.SparkException] {
      ZarrGroup.write1(
        spark.createDataFrame(Seq((0L, "éé"))).toDF("id", "value"),
        s"$dir/w", chunk = 2, dtype = "|S3")
    }
    assert(e.getMessage != null)
  }

  test("0-row member writes metadata only and reads back empty") {
    val dir = tmp()
    val empty = spark.range(0).select(col("id"), col("id").as("value"))
    val meta = ZarrGroup.write1(empty, s"$dir/e", chunk = 8, dtype = "<i8")
    assert(meta.n == 0 && meta.numChunks == 0)
    assert(new File(s"$dir/e/.zarray").exists())
    assert(ZarrGroup.read1(spark, s"$dir/e",
      ZarrGroup.read1Meta(s"$dir/e")).count() == 0)
  }

  test("writeMembers: k columns in one job == k write1 results, all dtypes") {
    val dir = tmp()
    val n = 257
    val df = spark.range(n).select(col("id"),
      (col("id") * 3).as("ln"),
      (col("id") - 5).cast("int").as("in"),
      (col("id") / 7.0).as("dn"),
      concat(lit("é"), col("id")).as("sn"))
    val metas = ZarrGroup.writeMembers(df, s"$dir/g",
      Seq("ln" -> "<i8", "in" -> "<i4", "dn" -> "<f8", "sn" -> "|S6"),
      chunk = 100)
    assert(metas.keySet == Set("ln", "in", "dn", "sn"))
    assert(metas("ln").numChunks == 3)
    val ln = ZarrGroup.read1(spark, s"$dir/g/ln",
      ZarrGroup.read1Meta(s"$dir/g/ln")).as[(Long, Long)].collect().sortBy(_._1)
    assert(ln.toSeq == (0 until n).map(i => (i.toLong, i * 3L)))
    val in2 = ZarrGroup.read1(spark, s"$dir/g/in",
      ZarrGroup.read1Meta(s"$dir/g/in")).as[(Long, Long)].collect().sortBy(_._1)
    assert(in2.toSeq == (0 until n).map(i => (i.toLong, i - 5L)))
    val dn = ZarrGroup.read1(spark, s"$dir/g/dn",
      ZarrGroup.read1Meta(s"$dir/g/dn")).as[(Long, Double)].collect().sortBy(_._1)
    assert(dn.toSeq == (0 until n).map(i => (i.toLong, i / 7.0)))
    val sn = ZarrGroup.read1(spark, s"$dir/g/sn",
      ZarrGroup.read1Meta(s"$dir/g/sn")).as[(Long, String)].collect().sortBy(_._1)
    assert(sn.toSeq == (0 until n).map(i => (i.toLong, s"é$i")))
    // a missing id fails loudly, naming the member
    val gap = spark.range(n).filter(col("id") =!= 17)
      .select(col("id"), col("id").as("v"))
    val e = intercept[org.apache.spark.SparkException] {
      ZarrGroup.writeMembers(gap, s"$dir/g2", Seq("v" -> "<i8"), chunk = 100)
    }
    assert(e.getMessage != null)
  }

  test("one-pass write derives n and rejects non-contiguous id domains") {
    // r13: the separate count() job was folded into the write pass, so
    // n and the 0..n-1 contiguity contract are now validated from the
    // bands the pass observed — these are the failure modes that used
    // to be caught by the up-front count and must STILL fail loudly.
    val dir = tmp()
    // a whole band absent (ids 0..99 + 200..256, chunk 100: band 1 missing)
    val bandGap = spark.range(257)
      .filter(col("id") < 100 || col("id") >= 200)
      .select(col("id"), col("id").as("value"))
    val e1 = intercept[Exception] {
      ZarrGroup.write1(bandGap, s"$dir/a", chunk = 100, dtype = "<i8")
    }
    assert(e1.getMessage.contains("missing bands"))
    // a non-final band short at its tail (ids 0..89 + 100..256: band 0
    // has 90 of 100 slots)
    val shortMid = spark.range(257)
      .filter(col("id") < 90 || col("id") >= 100)
      .select(col("id"), col("id").as("value"))
    val e2 = intercept[Exception] {
      ZarrGroup.write1(shortMid, s"$dir/b", chunk = 100, dtype = "<i8")
    }
    assert(e2.getMessage.contains("not contiguous"))
    // same two contracts through the batched member writer
    val e3 = intercept[Exception] {
      ZarrGroup.writeMembers(bandGap.withColumnRenamed("value", "v"),
        s"$dir/c", Seq("v" -> "<i8"), chunk = 100)
    }
    assert(e3.getMessage.contains("missing bands"))
    val e4 = intercept[Exception] {
      ZarrGroup.writeMembers(shortMid.withColumnRenamed("value", "v"),
        s"$dir/d", Seq("v" -> "<i8"), chunk = 100)
    }
    assert(e4.getMessage.contains("not contiguous"))
    // the derived n equals the count-derived n byte-for-byte: a valid
    // non-multiple-length write round-trips (covered above) AND its
    // metadata carries the exact n
    val ok = spark.range(123).select(col("id"), col("id").as("value"))
    val m = ZarrGroup.write1(ok, s"$dir/e", chunk = 50, dtype = "<i8")
    assert(m.n == 123 && ZarrGroup.read1Meta(s"$dir/e").n == 123)
  }

  test("q_zarr_anndata runs and groups every label") {
    val out = ZarrQueries.zarrAnndata(spark, sf).collect()
    assert(out.length == 10) // labels 0..9
    assert(out.map(_.getLong(0)).toSeq == (0L until 10L))
    assert(out.forall(r => r.getString(2) == s"ct${r.getLong(0)}"))
    assert(out.forall(_.getLong(5) == 64L)) // n_vars from var member
    assert(out.map(_.getLong(3)).sum == 500L) // every cell counted once
  }
}
