package graft.zarr

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.databind.node.ObjectNode
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path => HPath}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.zarr.ZarrGroup.Zarr1Meta

/** Zarr **v3** GROUPS — the AnnData-on-zarr layout on the current spec
  * generation. Everything metadata-shaped moves into one `zarr.json`
  * per node (`node_type: group|array`, attributes INSIDE the document,
  * no `.zgroup`/`.zarray`/`.zattrs` sidecars), chunk keys gain the
  * `c/` prefix, and the compressor becomes the `bytes`+`gzip` codec
  * chain. Consolidated metadata follows the v3 convention zarr-python
  * ships: the ROOT group's `zarr.json` carries a
  * `consolidated_metadata: {kind: "inline", must_understand: false,
  * metadata: {<path>: <node zarr.json>}}` object — still exactly ONE
  * metadata GET to open the store, same contract as the v2 layer's
  * `.zmetadata`.
  *
  * The distributed chunk IO is [[ZarrGroup]]'s band writer/reader
  * verbatim (write1Impl/read1 take the key naming and metadata shape
  * as parameters) — one plan, two on-disk dialects, so the v2/v3
  * twins can share oracle text by construction. Fixed-width strings
  * use the v3 core raw-bits data types (`r{8w}`): v3 has no `|S` —
  * raw bits is the spec-legal fixed-width byte carrier.
  *
  * 2-D members (X, obsm) are ordinary v3 arrays — [[Zarr3Sink]] writes
  * them sharded and the DSv2 source reads them unchanged. */
object Zarr3Group extends Serializable {

  private def fsOf(path: String, conf: Configuration): (FileSystem, HPath) = {
    val p = new HPath(path)
    (p.getFileSystem(conf), p)
  }

  private def writeUtf8(fs: FileSystem, p: HPath, s: String): Unit = {
    val out = fs.create(p, true)
    try out.write(s.getBytes("UTF-8")) finally out.close()
  }

  private def readUtf8(fs: FileSystem, p: HPath): String = {
    val st = fs.getFileStatus(p)
    val raw = new Array[Byte](st.getLen.toInt)
    val in = fs.open(p)
    try in.readFully(0, raw) finally in.close()
    new String(raw, "UTF-8")
  }

  /** v2-style internal dtype code -> v3 `data_type` name. */
  def v3DataType(dtype: String): String = dtype match {
    case "<i4" => "int32"
    case "<i8" => "int64"
    case "<f8" => "float64"
    case s if s.startsWith("|S") => s"r${s.drop(2).toInt * 8}"
    case other => throw new IllegalArgumentException(
      s"unsupported v3 1-D dtype $other")
  }

  /** v3 `data_type` name -> internal dtype code (raw bits -> |S). */
  def fromV3DataType(dt: String): String = dt match {
    case "int32" => "<i4"
    case "int64" => "<i8"
    case "float64" => "<f8"
    case r if r.startsWith("r") =>
      val bits = r.drop(1).toInt
      require(bits % 8 == 0, s"raw-bits dtype $r not byte-aligned")
      s"|S${bits / 8}"
    case other => throw new IllegalArgumentException(
      s"unsupported v3 1-D data_type $other")
  }

  /** `zarr.json` for a 1-D v3 member array. */
  private[zarr] def metaJson3(meta: Zarr1Meta): String = {
    val codecs = meta.compressor match {
      case Some("gzip") =>
        """[{"name":"bytes","configuration":{"endian":"little"}},""" +
          """{"name":"gzip","configuration":{"level":5}}]"""
      case _ => """[{"name":"bytes","configuration":{"endian":"little"}}]"""
    }
    val fill = if (meta.sWidth > 0) "0" else meta.fill
    s"""{"zarr_format":3,"node_type":"array","shape":[${meta.n}],""" +
      s""""data_type":"${v3DataType(meta.dtype)}",""" +
      s""""chunk_grid":{"name":"regular","configuration":{"chunk_shape":[${meta.chunk}]}},""" +
      s""""chunk_key_encoding":{"name":"default","configuration":{"separator":"/"}},""" +
      s""""fill_value":$fill,"codecs":$codecs}"""
  }

  private def parse1Meta3(node: JsonNode): Zarr1Meta = {
    require(node.get("zarr_format").asInt() == 3, "zarr.json: zarr_format != 3")
    require(node.get("node_type").asText() == "array",
      "zarr.json: not an array node")
    require(node.get("shape").size() == 1, "not a 1-D zarr array")
    val grid = node.get("chunk_grid")
    require(grid.get("name").asText() == "regular",
      "only the regular chunk grid is supported")
    val enc = node.get("chunk_key_encoding")
    require(enc == null || enc.get("name").asText() == "default",
      "only the default chunk-key encoding is supported")
    val codecs = node.get("codecs")
    val names = (0 until codecs.size()).map(codecs.get(_).get("name").asText())
    require(names.headOption.contains("bytes"),
      s"first codec must be bytes, got $names")
    val comp = names.drop(1) match {
      case Seq() => None
      case Seq("gzip") => Some("gzip")
      case other => throw new IllegalArgumentException(
        s"codec tail $other unsupported (gzip only)")
    }
    val dtype = fromV3DataType(node.get("data_type").asText())
    val fv = node.get("fill_value")
    val fill =
      if (fv == null || fv.isNull || dtype.startsWith("|S")) "0"
      else fv.asText()
    Zarr1Meta(node.get("shape").get(0).asLong(),
      grid.get("configuration").get("chunk_shape").get(0).asInt(),
      dtype, comp, fill)
  }

  /** The v3 chunk-key naming: `c/<i>` (default encoding, "/" sep). */
  private[zarr] val keyOf: Long => String = band => s"c/$band"

  /** `{"zarr_format":3,"node_type":"group"}` marker, with optional
    * attributes (v3 attributes live INSIDE zarr.json — there is no
    * `.zattrs` sidecar to write). */
  def writeGroupMarker(path: String, attrsJson: Option[String] = None,
                       conf: Configuration = ZarrIO.hadoopConf()): Unit = {
    val (fs, p) = fsOf(path, conf)
    fs.mkdirs(p)
    val attrs = attrsJson.map(a => s""","attributes":$a""").getOrElse("")
    writeUtf8(fs, new HPath(p, "zarr.json"),
      s"""{"zarr_format":3,"node_type":"group"$attrs}""")
  }

  /** Distributed 1-D member write — [[ZarrGroup.write1Impl]] with the
    * v3 metadata document and chunk-key naming. */
  def write1(df: DataFrame, path: String, chunk: Int, dtype: String,
             gzip: Boolean = true): Zarr1Meta =
    ZarrGroup.write1Impl(df, path,
      Zarr1Meta(0, chunk, dtype, if (gzip) Some("gzip") else None),
      metaName = "zarr.json", metaText = metaJson3, keyOf = keyOf)

  def read1Meta(path: String,
                conf: Configuration = ZarrIO.hadoopConf()): Zarr1Meta = {
    val (fs, p) = fsOf(path, conf)
    val mapper = new ObjectMapper()
    parse1Meta3(mapper.readTree(readUtf8(fs, new HPath(p, "zarr.json"))))
  }

  // ----------------------------------------------------- consolidation --

  /** Fold every node's `zarr.json` into the ROOT group's `zarr.json`
    * under `consolidated_metadata` (kind=inline, must_understand=false
    * — the zarr-python v3 convention; readers that don't know the key
    * may ignore it). Call LAST, after every member is final. Returns
    * the number of consolidated node paths. */
  def consolidate(path: String,
                  conf: Configuration = ZarrIO.hadoopConf()): Int = {
    val (fs, root) = fsOf(path, conf)
    val mapper = new ObjectMapper()
    val metaNode = mapper.createObjectNode()
    def walk(dir: HPath, prefix: String): Unit = {
      fs.listStatus(dir).sortBy(_.getPath.getName).foreach { st =>
        val name = st.getPath.getName
        if (st.isDirectory) walk(st.getPath, s"$prefix$name/")
        else if (name == "zarr.json" && prefix.nonEmpty)
          metaNode.set[ObjectNode](prefix.stripSuffix("/"),
            mapper.readTree(readUtf8(fs, st.getPath)))
      }
    }
    walk(root, "")
    val rootP = new HPath(root, "zarr.json")
    val rootNode = mapper.readTree(readUtf8(fs, rootP)).asInstanceOf[ObjectNode]
    val cm = mapper.createObjectNode()
    cm.put("kind", "inline")
    cm.put("must_understand", false)
    cm.set[ObjectNode]("metadata", metaNode)
    rootNode.set[ObjectNode]("consolidated_metadata", cm)
    writeUtf8(fs, rootP, mapper.writeValueAsString(rootNode))
    metaNode.size()
  }

  /** The consolidated path→zarr.json map, if the root carries one —
    * the ONE object GET that replaces per-member probing. */
  def consolidated(path: String, conf: Configuration = ZarrIO.hadoopConf())
      : Option[Map[String, JsonNode]] = {
    val (fs, p) = fsOf(path, conf)
    val zp = new HPath(p, "zarr.json")
    if (!fs.exists(zp)) return None
    val mapper = new ObjectMapper()
    val top = mapper.readTree(readUtf8(fs, zp))
    val cm = top.get("consolidated_metadata")
    if (cm == null || cm.isNull) return None
    require(cm.get("kind").asText() == "inline",
      "unsupported consolidated_metadata kind")
    val m = cm.get("metadata")
    val b = Map.newBuilder[String, JsonNode]
    m.fieldNames().forEachRemaining(k => b += k -> m.get(k))
    Some(b.result())
  }

  /** 1-D member metadata, consolidated-first (the member's own
    * `zarr.json` is never read when the root carries the inline map —
    * same object-store open-cost contract as the v2 layer). */
  def memberMeta1(groupPath: String, member: String,
                  conf: Configuration = ZarrIO.hadoopConf()): Zarr1Meta =
    consolidated(groupPath, conf) match {
      case Some(m) =>
        parse1Meta3(m.getOrElse(member, throw new IllegalArgumentException(
          s"member $member not in consolidated metadata")))
      case None => read1Meta(s"$groupPath/$member", conf)
    }

  /** Read a 1-D member column of a (possibly consolidated) v3 group. */
  def readMember1(spark: SparkSession, groupPath: String,
                  member: String): DataFrame =
    ZarrGroup.read1(spark, s"$groupPath/$member",
      memberMeta1(groupPath, member), keyOf = keyOf)

  /** Member-array names of a consolidated v3 group (node paths whose
    * folded zarr.json is an array node), sorted. */
  def members(path: String,
              conf: Configuration = ZarrIO.hadoopConf()): Seq[String] =
    consolidated(path, conf) match {
      case Some(m) => m.collect {
        case (k, v) if v.get("node_type").asText() == "array" => k
      }.toSeq.sorted
      case None => throw new IllegalArgumentException(
        s"$path has no consolidated metadata — consolidate() it first")
    }

  /** Decode an AnnData-style categorical member (codes + categories
    * sub-arrays, -1 = missing -> NULL) — v3 twin of
    * [[ZarrGroup.readCategorical]], same broadcast-dictionary plan. */
  def readCategorical(spark: SparkSession, groupPath: String,
                      member: String): DataFrame = {
    val codes = readMember1(spark, groupPath, s"$member/codes")
      .select(col("idx"), col("value").as("code"))
    val cats = readMember1(spark, groupPath, s"$member/categories")
      .select(col("idx").as("code"), col("value"))
    codes.join(broadcast(cats), Seq("code"), "left")
      .select(col("idx"),
        when(col("code") >= 0, col("value")).otherwise(lit(null)).as("value"))
  }
}
