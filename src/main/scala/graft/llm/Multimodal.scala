package graft.llm

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.tables.Tables

/** Multimodal column plumbing: image/audio/video as opaque BINARY columns
  * with typed metadata, plus decode → feature-extract → resize /
  * frame-sample stages.
  *
  * The actual codec step is STUBBED with a deterministic fake (this
  * container has no image/audio libraries — see builder brief):
  * `decodeStub` maps bytes → "pixels" reproducibly so the Spark-side
  * contract — schema, batch shape, partition-wise execution, null
  * handling — is real and tested end-to-end. Swapping in a real codec
  * changes only the function body.
  *
  * Scale design: decode runs as Dataset.mapPartitions — one JVM-side
  * batch iterator per input split (the Scala analogue of mapInPandas
  * batches), so codec setup cost amortizes per-partition, not per-row,
  * and no shuffle is introduced: media rows stay where the scan put
  * them. Metadata-only predicates (format, width, …) are ordinary
  * columns → pushed to the parquet scan without touching bytes.
  */
object Multimodal {
  type Q = (SparkSession, String) => DataFrame

  /** Typed media row: opaque payload + structured metadata. */
  case class MediaRow(id: Long, format: String, width: Int, height: Int,
                      n_frames: Int, payload: Array[Byte])

  /** Decoded features per media item. */
  case class MediaFeatures(id: Long, format: String, n_frames: Int,
                           features: Array[Float])

  /** Deterministic synthetic media table derived from documents: payload =
    * UTF-8 bytes of the text, metadata derived from doc_id. Stands in for
    * a real (id, bytes, meta) media lake table. */
  def syntheticMedia(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d).select(
      col("doc_id").as("id"),
      element_at(typedlit(Seq("png", "jpeg", "wav", "mp4")),
        (col("doc_id") % 4 + 1).cast("int")).as("format"),
      (col("doc_id") % 64 + 16).cast("int").as("width"),
      (col("doc_id") % 32 + 16).cast("int").as("height"),
      when(col("doc_id") % 4 === 3, (col("doc_id") % 30 + 2).cast("int"))
        .otherwise(lit(1)).as("n_frames"),
      encode(col("text"), "UTF-8").as("payload"))

  /** STUB codec: bytes → w×h float "pixels", deterministic (payload bytes
    * cycled and normalized). Replace with a real decoder off-container. */
  def decodeStub(payload: Array[Byte], w: Int, h: Int): Array[Float] = {
    val n = w * h
    val out = new Array[Float](n)
    if (payload.nonEmpty) {
      var i = 0
      while (i < n) {
        out(i) = (payload(i % payload.length) & 0xff) / 255.0f
        i += 1
      }
    }
    out
  }

  /** Mean-pool a w×h float image down by `factor` in each dimension —
    * the "resize" feature stage, pure math, no codec needed. */
  def meanPool(px: Array[Float], w: Int, h: Int, factor: Int): Array[Float] = {
    val ow = math.max(1, w / factor)
    val oh = math.max(1, h / factor)
    val out = new Array[Float](ow * oh)
    var oy = 0
    while (oy < oh) {
      var ox = 0
      while (ox < ow) {
        var sum = 0.0f; var cnt = 0
        var dy = 0
        while (dy < factor && oy * factor + dy < h) {
          var dx = 0
          while (dx < factor && ox * factor + dx < w) {
            sum += px((oy * factor + dy) * w + (ox * factor + dx)); cnt += 1
            dx += 1
          }
          dy += 1
        }
        out(oy * ow + ox) = if (cnt == 0) 0f else sum / cnt
        ox += 1
      }
      oy += 1
    }
    out
  }

  /** Frame-sample stride for video payloads: keep every k-th frame index. */
  def sampleFrames(nFrames: Int, stride: Int): Seq[Int] =
    0 until nFrames by stride

  /** decode → resize → (frame-sample for video) as a partition-wise typed
    * pipeline. Batch shape: iterator-in/iterator-out per partition. */
  def extractFeatures(media: Dataset[MediaRow], poolFactor: Int = 4)
      : Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // per-partition "codec init" happens here (stub: nothing to open)
      rows.map { m =>
        val frames = sampleFrames(m.n_frames, stride = 2)
        val feats = frames.toArray.flatMap { f =>
          val px = decodeStub(m.payload ++ BigInt(f).toByteArray,
            m.width, m.height)
          meanPool(px, m.width, m.height, poolFactor)
        }
        MediaFeatures(m.id, m.format, frames.size, feats)
      }
    }
  }

  /** Rows-only query: full multimodal pipeline over synthetic media —
    * schema + batch plumbing exercised end-to-end; per-row feature
    * checksum makes regressions visible in the dump. */
  def multimodalFeatures(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val media = syntheticMedia(s, d).as[MediaRow]
    extractFeatures(media).toDF()
      .select(col("id"), col("format"), col("n_frames"),
        size(col("features")).as("n_features"),
        round(aggregate(col("features"), lit(0.0),
          (a, x) => a + x.cast("double")), 2).as("checksum"))
      .orderBy("id")
  }

  val queries: Map[String, Q] = Map(
    "q_multimodal_features" -> multimodalFeatures _,
  )
  val oracle: Map[String, String] = Map.empty
}
