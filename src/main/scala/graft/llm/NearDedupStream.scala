package graft.llm

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import graft.tables.Tables

/** STREAMING MinHash-LSH near-duplicate detection — online dedup of an
  * unbounded document stream against everything that arrived before it.
  * The production shape behind "don't re-ingest what the crawl already
  * delivered": each incoming document is flagged iff some EARLIER
  * document (smaller doc_id — ingest order) is a verified near-duplicate
  * (exact token-set Jaccard ≥ τ), without ever comparing all pairs.
  *
  * How it stays sub-quadratic on a stream: the batch LSH argument
  * transfers verbatim. Each doc explodes into its [[Dedup.bandHashes]]
  * band buckets (same single definition as the batch candidate
  * generator — the banding cannot drift), the stream is keyed by
  * (band, band_hash), and `flatMapGroupsWithState` keeps ONE state list
  * per bucket: the members seen so far. A new arrival compares only
  * against its own buckets' members — the same candidate set the batch
  * pass would generate — and a pair is emitted exactly once per shared
  * bucket, when the SECOND of the two arrives (whichever order the
  * source delivers them in); the final per-doc aggregation collapses
  * multi-band emissions with countDistinct.
  *
  * State contract (the part that decides 100 TB viability): per-bucket
  * state is the bucket's membership, so TOTAL state = corpus tokens ×
  * bands / (dedup ratio) — the corpus sketch itself, which is what
  * dedup-against-all-history inherently costs. The three production
  * levers are now WIRED, not just documented:
  *
  *  - **RocksDB state backend** (state ≫ heap): a SparkSession conf,
  *    not a plan change — [[rocksDbConf]] returns the pair to set;
  *    NearDedupStreamSpec runs the whole topology under it and proves
  *    verdict equality with the default HDFS-backed store.
  *  - **Event-time horizon** (`horizonSec = Some(h)`): arrivals carry
  *    event time (ingest order as seconds), the stream watermarks it,
  *    and each bucket evicts members older than `watermark − h` on
  *    every visit; buckets untouched for a horizon time out
  *    (EventTimeTimeout) and are REMOVED — total state is bounded by
  *    the horizon's arrival volume instead of all history.
  *  - **Signatures-only state** (`signaturesOnly = true`): members
  *    store the NumHashes-long minhash signature instead of the token
  *    set (O(k) per member, independent of document size) and
  *    verification becomes the signature-agreement estimate of Jaccard
  *    — the classic state/exactness trade. The estimate is NOISY at
  *    the threshold (spec-measured: 30 flagged docs vs exact's 17 at
  *    τ=0.95 on the fixture), so its gate pins what it guarantees:
  *    determinism, zero missed exact duplicates, and every flag a true
  *    ≥0.7-Jaccard pair. The default keeps exact sets because
  *    exactness is the repo's gate.
  *
  * Feeds: [[run]] replays the bounded oracle block through a
  * MemoryStream in doc_id-ordered waves (the deterministic gate
  * harness); [[runFileFeed]] feeds the SAME topology from a file
  * source over a parquet dump of the feed — the corpus is NEVER
  * collected to the driver (prep writes distributed, the stream reads
  * files). Emission-on-second-arrival makes the verdicts independent
  * of how the source batches or orders the feed (spec-pinned).
  *
  * Output: one row per flagged doc — (doc_id, first_dup_of = smallest
  * verified earlier near-dup, n_dups = how many distinct earlier docs
  * it near-duplicates).
  */
object NearDedupStream {
  type Q = (SparkSession, String) => DataFrame

  val NumHashes = 32
  val Bands = 16
  val Tau = 0.95
  val Waves = 5
  /** same bounded block as q_dedup_minhash/q_dedup_ngram — the all-pairs
    * DuckDB oracle is quadratic in it */
  val Block = 100
  /** File count for the file-fed gate replay (= micro-batch count under
    * maxFilesPerTrigger=1) and, via the stream-scoped conf override in
    * [[runFileFeed]], the state-store partition count — both follow the
    * BOUNDED [[Block]] contract, not the corpus-scale session defaults
    * (see the runFileFeed comment). */
  val FeedFiles = 8
  val StatePartitions = 8
  /** Hot-bucket cap — the streaming twin of minHashCandidates'
    * maxBucket: once a (band, band_hash) bucket holds this many
    * members, later arrivals neither compare against it nor join it,
    * so per-bucket state AND per-arrival work are O(maxBucket) forever
    * (a degenerate band slice is otherwise quadratic). Same recall
    * argument as the batch drop: a true pair losing one hot band still
    * surfaces through its other bands-1 chances. 256 exceeds every
    * bucket this corpus produces, so the exact oracle is unaffected —
    * NearDedupStreamSpec pins both that headroom and the cap's
    * enforcement under a forced-collision banding. */
  val MaxBucket = 256

  /** The SparkSession conf that moves stream state off-heap to RocksDB
    * — set BEFORE the query starts. A conf, not a topology change:
    * every plan in this file runs unmodified under it. */
  val rocksDbConf: (String, String) =
    "spark.sql.streaming.stateStore.providerClass" ->
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"

  /** One feed row: the document's distinct tokens, band hashes, and
    * minhash signature (all from the shared Dedup definitions). */
  case class FeedRow(doc_id: Long, toks: Seq[String], bhs: Seq[Long],
                     sig: Seq[Long])

  /** One exploded bucket arrival; ts is the event time (ingest order
    * as seconds — what a real feed's arrival timestamp would be). */
  case class Arrival(band: Int, bh: Long, id: Long, toks: Seq[String],
                     sig: Seq[Long], ts: java.sql.Timestamp)

  /** One bucket member. Exact mode keeps toks (sig empty); signatures
    * mode keeps sig (toks empty — O(NumHashes) state per member). */
  case class Member(id: Long, tsMs: Long, toks: Seq[String],
                    sig: Seq[Long])

  /** Exact token-set Jaccard with the repo's cross-engine rounding
    * convention (mirrors [[Dedup.jaccardPairs]]: +1e-9 boundary epsilon,
    * round-half-up to 4 dp — the same arithmetic the oracle's SQL
    * `round(x/(n1+n2-x) + 1e-9, 4)` performs). */
  private def jaccardOf(n1: Int, n2: Int, x: Int): Double =
    BigDecimal(x.toDouble / (n1 + n2 - x) + 1e-9)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble

  private def estJaccard(a: Seq[Long], b: Seq[Long]): Double = {
    var agree = 0; var i = 0
    while (i < a.length) { if (a(i) == b(i)) agree += 1; i += 1 }
    BigDecimal(agree.toDouble / a.length + 1e-9)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
  }

  /** Re-arm the bucket's event-time timeout at (newest member + h) so
    * an idle bucket is revisited — and removed — once the watermark
    * passes its horizon. */
  private def armTimeout(state: GroupState[List[Member]],
                         members: List[Member], horizonMs: Long): Unit = {
    val target = members.iterator.map(_.tsMs).foldLeft(0L)(math.max) + horizonMs
    state.setTimeoutTimestamp(
      math.max(target, state.getCurrentWatermarkMs() + 1))
  }

  /** The stateful core: (band, bh)-keyed groups, per-bucket membership
    * state, verification against the bucket's members. Emits
    * (later_id, earlier_id) once per shared bucket — at the SECOND
    * arrival of the pair, whatever order the feed delivered them in
    * (the property that frees the file feed from ordering guarantees).
    * With a horizon: members older than watermark − h are evicted on
    * every visit, and an untouched bucket times out and is removed. */
  private[llm] def matchAgainstState(
      horizonMs: Option[Long], signaturesOnly: Boolean)(
      key: (Int, Long),
      it: Iterator[Arrival],
      state: GroupState[List[Member]]): Iterator[(Long, Long)] = {
    var members = state.getOption.getOrElse(Nil)
    horizonMs.foreach { h =>
      val cut = state.getCurrentWatermarkMs() - h
      members = members.filter(_.tsMs >= cut)
    }
    if (state.hasTimedOut) {
      if (members.isEmpty) state.remove()
      else {
        state.update(members)
        horizonMs.foreach(h => armTimeout(state, members, h))
      }
      return Iterator.empty
    }
    // sort the batch's arrivals so same-batch pairs resolve in id order
    val arrivals = it.toVector.sortBy(_.id)
    var nMembers = members.size
    val out = Vector.newBuilder[(Long, Long)]
    arrivals.foreach { a =>
      // hot-bucket cap: a saturated bucket stops matching AND growing —
      // O(MaxBucket) state and work per bucket forever (see MaxBucket)
      if (nMembers < MaxBucket) {
        if (signaturesOnly) {
          members.foreach { m =>
            if (estJaccard(a.sig, m.sig) >= Tau)
              out += (if (m.id < a.id) (a.id, m.id) else (m.id, a.id))
          }
        } else {
          val tset = a.toks.toSet
          members.foreach { m =>
            val pset = m.toks.toSet
            val x = tset.intersect(pset).size
            if (jaccardOf(tset.size, pset.size, x) >= Tau)
              out += (if (m.id < a.id) (a.id, m.id) else (m.id, a.id))
          }
        }
        members = Member(a.id, a.ts.getTime,
          if (signaturesOnly) Nil else a.toks,
          if (signaturesOnly) a.sig else Nil) :: members
        nMembers += 1
      }
    }
    state.update(members)
    horizonMs.foreach(h => armTimeout(state, members, h))
    out.result().iterator
  }

  /** The streaming topology over any FeedRow source — band explode,
    * bucket keying, stateful matching. One definition for the
    * MemoryStream gate harness and the file feed. */
  def topology(src: Dataset[FeedRow], horizonSec: Option[Long] = None,
               signaturesOnly: Boolean = false): Dataset[(Long, Long)] = {
    val s = src.sparkSession
    import s.implicits._
    val keepToks = !signaturesOnly
    val arr0 = src.flatMap { f =>
      f.bhs.iterator.zipWithIndex.map { case (h, b) =>
        Arrival(b, h, f.doc_id, if (keepToks) f.toks else Nil,
          if (keepToks) Nil else f.sig,
          new java.sql.Timestamp(f.doc_id * 1000L))
      }
    }
    val arr = horizonSec.fold(arr0)(_ => arr0.withWatermark("ts", "0 seconds"))
    arr.groupByKey(a => (a.band, a.bh))
      .flatMapGroupsWithState[List[Member], (Long, Long)](
        OutputMode.Append,
        horizonSec.fold[GroupStateTimeout](GroupStateTimeout.NoTimeout)(_ =>
          GroupStateTimeout.EventTimeTimeout))(
        matchAgainstState(horizonSec.map(_ * 1000L), signaturesOnly))
  }

  /** The distributed feed prep: distinct-token sets, band hashes, and
    * signatures via the SAME Dedup helpers the batch operators use —
    * one tokenization, one banding, one signature definition. Returns
    * (doc_id, toks, bhs, sig); never collects. */
  def prepFeed(s: SparkSession, d: String, block: Long = Block): DataFrame =
    prepFeedDocs(Tables.documents(s, d).filter(col("doc_id") < block))

  /** Same prep over any (doc_id, text) frame — the spec's synthetic
    * long-replay harness enters here. */
  def prepFeedDocs(docs: DataFrame): DataFrame = {
    val toks = Dedup.tokenSets(docs)
      .groupBy("doc_id").agg(collect_list("t").as("toks"))
    val bhs = Dedup.bandHashes(docs, NumHashes, Bands)
      .groupBy("doc_id")
      .agg(array_sort(collect_list(struct(col("band"), col("bh")))).as("bb"))
      .select(col("doc_id"), expr("transform(bb, x -> x.bh)").as("bhs"))
    val sig = Dedup.minhashSignatures(docs, NumHashes)
    toks.join(bhs, "doc_id").join(sig, "doc_id")
      .select(col("doc_id"), col("toks"), col("bhs"), col("sig"))
  }

  private def aggregateVerdicts(pairs: DataFrame): DataFrame =
    pairs.groupBy("doc_id")
      .agg(min("partner").as("first_dup_of"),
        countDistinct("partner").as("n_dups"))
      .orderBy("doc_id")

  /** Run the streaming near-dedup over the bounded documents block,
    * replayed as `waves` doc_id-ordered micro-batch waves through a
    * MemoryStream. Returns (verdicts, state rows at completion — the
    * spec's bounded-state instrument). The replay collects the BOUNDED
    * block (≤ [[Block]] docs by default — the same bound that makes the
    * DuckDB oracle runnable); [[runFileFeed]] is the no-collect path. */
  private[llm] def runWithMetrics(s: SparkSession, d: String, waves: Int,
                                  horizonSec: Option[Long] = None,
                                  signaturesOnly: Boolean = false,
                                  block: Long = Block,
                                  feedOverride: Option[Seq[FeedRow]] = None)
      : (DataFrame, Long) = {
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    val feed: Seq[FeedRow] = feedOverride.getOrElse(
      prepFeed(s, d, block).orderBy("doc_id").as[FeedRow].collect().toSeq)
    require(feed.nonEmpty, s"near-dedup stream needs a non-empty block in $d")
    val ms = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[FeedRow]
    val flagged = topology(ms.toDS(), horizonSec, signaturesOnly)
    val sinkName = s"near_dedup_${System.nanoTime()}"
    val q = flagged.writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName(sinkName).start()
    val (pairs, stateRows) =
      try {
        val perWave = (feed.length + waves - 1) / waves
        feed.grouped(perWave).foreach { wave =>
          ms.addData(wave)
          q.processAllAvailable()
        }
        val rows = Option(q.lastProgress)
          .map(_.stateOperators.map(_.numRowsTotal).sum).getOrElse(0L)
        // materialize before the sink table is dropped
        (s.table(sinkName).as[(Long, Long)].collect().toSeq, rows)
      } finally {
        q.stop()
        try s.sql(s"DROP TABLE IF EXISTS $sinkName")
        catch { case _: Throwable => () }
      }
    (aggregateVerdicts(pairs.toDF("doc_id", "partner")), stateRows)
  }

  def run(s: SparkSession, d: String, waves: Int,
          horizonSec: Option[Long] = None,
          signaturesOnly: Boolean = false): DataFrame =
    runWithMetrics(s, d, waves, horizonSec, signaturesOnly)._1

  /** The no-collect feed: prep writes the feed as parquet DISTRIBUTED,
    * the streaming query reads it back through the file source
    * (`maxFilesPerTrigger=1` — one micro-batch per file, whatever
    * id order the files landed in; emission-on-second-arrival makes
    * the verdicts order-independent). This is the production shape:
    * nothing corpus-sized ever visits the driver. */
  def runFileFeed(s: SparkSession, d: String,
                  signaturesOnly: Boolean = false): DataFrame = {
    import s.implicits._
    val dir = new java.io.File(System.getProperty("java.io.tmpdir"),
      s"graft_neardedup_feed_${System.nanoTime()}").toString
    // micro-batch granularity IS the feed's file layout under
    // maxFilesPerTrigger=1 — uncoalesced, the prep join's shuffle
    // partition count (a corpus-scale session setting) leaked through
    // as ~32 near-empty files, i.e. ~32 stateful micro-batches over a
    // BOUNDED block where each batch costs a full state-store round per
    // partition. FeedFiles pins the replay to a fixed wave count
    // (verdicts are emission-on-second-arrival, order-independent —
    // NearDedupStreamSpec pins equality with the MemoryStream feed),
    // and the bounded-block state partitioning follows the input like
    // StateMetrics.StatePartitions does.
    prepFeed(s, d).coalesce(FeedFiles).write.mode("overwrite").parquet(dir)
    val src = s.readStream
      .schema(s.read.parquet(dir).schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(dir).as[FeedRow]
    val flagged = topology(src, horizonSec = None, signaturesOnly)
    val sinkName = s"near_dedup_file_${System.nanoTime()}"
    val prevSP = s.conf.get("spark.sql.shuffle.partitions", "200")
    s.conf.set("spark.sql.shuffle.partitions", StatePartitions.toString)
    val q =
      try flagged.writeStream.outputMode(OutputMode.Append)
        .format("memory").queryName(sinkName).start()
      finally s.conf.set("spark.sql.shuffle.partitions", prevSP)
    val pairs =
      try {
        q.processAllAvailable()
        s.table(sinkName).as[(Long, Long)].collect().toSeq
      } finally {
        q.stop()
        try s.sql(s"DROP TABLE IF EXISTS $sinkName")
        catch { case _: Throwable => () }
        try {
          import scala.reflect.io.Directory
          new Directory(new java.io.File(dir)).deleteRecursively()
        } catch { case _: Throwable => () }
      }
    aggregateVerdicts(pairs.toDF("doc_id", "partner"))
  }

  /** The GATE query runs the production file-fed topology: the feed is
    * written as parquet distributed and streamed back through the file
    * source — no corpus-sized collect anywhere in the gate path. The
    * MemoryStream wave-replay harness ([[run]]) remains the spec's
    * deterministic instrument, and NearDedupStreamSpec pins verdict
    * equality between the two feeds. */
  def streamDedupNear(s: SparkSession, d: String): DataFrame =
    runFileFeed(s, d)

  val queries: Map[String, Q] = Map(
    "q_stream_dedup_near" -> (streamDedupNear _))

  // Exact ground truth: all-pairs distinct-token Jaccard over the same
  // block (the q_dedup_ngram/minhash convention), grouped by the LATER
  // doc — valid as an oracle for the LSH path because the candidate
  // stage is complete on this corpus at this parameterization (the
  // q_dedup_minhash recall argument) and verification is exact.
  val oracle: Map[String, String] = Map(
    "q_stream_dedup_near" ->
      """WITH tok AS (SELECT DISTINCT doc_id, unnest(str_split(text, ' ')) AS t
                      FROM documents WHERE doc_id < 100),
         sizes AS (SELECT doc_id, count(1) AS n FROM tok GROUP BY doc_id),
         inter AS (SELECT a.doc_id AS id1, b.doc_id AS id2, count(1) AS x
                   FROM tok a JOIN tok b
                     ON a.t = b.t AND a.doc_id < b.doc_id
                   GROUP BY 1, 2),
         pairs AS (SELECT id1, id2
                   FROM inter JOIN sizes s1 ON s1.doc_id = id1
                              JOIN sizes s2 ON s2.doc_id = id2
                   WHERE round(CAST(x AS DOUBLE) / (s1.n + s2.n - x) + 1e-9, 4)
                           >= 0.95)
         SELECT id2 AS doc_id, min(id1) AS first_dup_of,
                CAST(count(DISTINCT id1) AS BIGINT) AS n_dups
         FROM pairs GROUP BY 1 ORDER BY 1""")
}
