package graft.stream

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Watermark-correct STREAMING as-of join — the third form of the as-of
  * family (rel/AsOf composed, plans/AsOfJoinPlan native batch, this).
  *
  * Problem: enrich each probe event with the latest build event of the
  * same key at-or-before it, on unbounded out-of-order streams. A probe
  * cannot be answered on arrival — an earlier build row may still be in
  * flight. The watermark is exactly the tool that bounds that wait: once
  * wm ≥ probe.ts, every build row at-or-before probe.ts has arrived (or
  * is contractually droppable), so the answer is FINAL — the same
  * sealing argument statefulFunnel makes for its step windows.
  *
  * Per-key state is watermark-bounded on the probe side (only probes
  * newer than the watermark wait) and O(out-of-orderness) + 1 on the
  * build side: builds newer than the watermark are retained verbatim,
  * and every build at-or-below it is DOMINATED by the single newest
  * such build (any future probe has ts ≥ wm, so the newest ≤-wm build
  * wins over every older one) — one row. This is the streaming twin of
  * "latest dimension value per key", and why the operator can run
  * forever on a 100 TB/day stream.
  *
  * Emission is append-mode and final (at most one output per sealed
  * probe; inner drops unmatched probes, the LEFT form null-pads them —
  * the variant lives entirely in the emission lambda, exactly like the
  * batch exec's); ties at equal build ts resolve by (ts, payload) max —
  * spec inputs keep build (key, ts) unique, matching the batch
  * operator's contract.
  *
  * Late-arrival contract (the standard watermark one): a tick arriving
  * more than the watermark delay behind the stream head is OUTSIDE the
  * guarantee — a late probe seals immediately against the compacted
  * build state (best effort, possibly not the true as-of answer), and
  * a late build cannot retro-fix already-emitted probes. Size the
  * delay to the source's real disorder; the spec's differential test
  * runs with delay > total span (nothing late → exact equality with
  * the batch operator), the sealing tests with a tight delay. */
object AsOfStream {

  /** One stream element: side = "probe" | "build"; ts_ns drives the
    * as-of arithmetic, the Timestamp column carries the watermark. */
  case class AsOfTick(key: Long, side: String, ts_ns: Long,
                      payload: Long, ts: java.sql.Timestamp)

  case class AsOfMatch(key: Long, probe_payload: Long, probe_ns: Long,
                       build_payload: Long, build_ns: Long)
  /** Left-outer emission: unmatched sealed probes keep None build
    * fields (→ nullable columns), mirroring the batch exec's
    * null-padded right side. */
  case class AsOfLeftMatch(key: Long, probe_payload: Long, probe_ns: Long,
                           build_payload: Option[Long], build_ns: Option[Long])

  /** (ts_ns, payload) pairs pending per side. Public: encoder codegen. */
  case class AsOfBuf(probes: List[(Long, Long)], builds: List[(Long, Long)])

  /** Inner streaming as-of: unmatched sealed probes emit nothing. */
  def streamingAsOf(ticks: Dataset[AsOfTick]): Dataset[AsOfMatch] = {
    import ticks.sparkSession.implicits._
    asOfCore[AsOfMatch](ticks, (key, pId, pNs, b) =>
      b.map { case (bNs, bId) => AsOfMatch(key, pId, pNs, bId, bNs) })
  }

  /** Left-outer streaming as-of: every sealed probe emits exactly once,
    * null-padded when no prior build exists — same sealing, state, and
    * compaction as the inner form (the variant lives entirely in the
    * emission lambda, like the batch exec's). */
  def streamingAsOfLeft(ticks: Dataset[AsOfTick]): Dataset[AsOfLeftMatch] = {
    import ticks.sparkSession.implicits._
    asOfCore[AsOfLeftMatch](ticks, (key, pId, pNs, b) =>
      Some(AsOfLeftMatch(key, pId, pNs, b.map(_._2), b.map(_._1))))
  }

  private def asOfCore[T](ticks: Dataset[AsOfTick],
      emitOne: (Long, Long, Long, Option[(Long, Long)]) => Option[T])
      (implicit enc: org.apache.spark.sql.Encoder[T]): Dataset[T] = {
    import ticks.sparkSession.implicits._
    ticks.groupByKey(_.key)
      .flatMapGroupsWithState[AsOfBuf, T](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (key: Long, rows: Iterator[AsOfTick], state: GroupState[AsOfBuf]) =>
          val wmNs = state.getCurrentWatermarkMs() * 1000000L
          var probes = state.getOption.map(_.probes).getOrElse(Nil)
          var builds = state.getOption.map(_.builds).getOrElse(Nil)
          if (!state.hasTimedOut) rows.foreach { r =>
            if (r.side == "probe") probes ::= (r.ts_ns, r.payload)
            else builds ::= (r.ts_ns, r.payload)
          }
          // seal: probes at-or-below the watermark have their final
          // answer (no earlier build can arrive anymore)
          val (ready, pending) = probes.partition(_._1 <= wmNs)
          val emit = ready.sortBy(identity).flatMap { case (pNs, pId) =>
            val cands = builds.filter(_._1 <= pNs)
            emitOne(key, pId, pNs,
              if (cands.isEmpty) None else Some(cands.max))
          }
          // build retention: newer-than-wm verbatim + the one dominating
          // at-or-below-wm row (serves every future probe)
          val (newer, older) = builds.partition(_._1 > wmNs)
          val keep = newer ::: (if (older.isEmpty) Nil else List(older.max))
          if (pending.isEmpty && keep.isEmpty) {
            if (state.exists) state.remove()
          } else {
            state.update(AsOfBuf(pending, keep))
            // wake when the oldest pending probe seals; ceil to ms and
            // stay strictly above the current watermark (the timeout
            // contract) — build-only state needs no timeout: it is O(1)
            // after compaction and correct to keep indefinitely
            if (pending.nonEmpty)
              state.setTimeoutTimestamp(
                math.max(pending.map(_._1).min + 999999L,
                  wmNs + 1000000L) / 1000000L)
          }
          emit.iterator
      }
  }
}
