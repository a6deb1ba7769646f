package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, BindReferences, JoinedRow, SortOrder}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.types.LongType

/** The full custom-operator stack for the as-of join — SURVEY.md §4.2's
  * preference rung (c): a `LogicalPlan` node, a `SparkStrategy`, and a
  * physical `SparkPlan` that DECLARES its distribution + ordering needs
  * and lets EnsureRequirements plant the exchanges and sorts.
  *
  * Why a dedicated operator when `rel/AsOf.asOfJoin` already composes
  * one (union + windowed last, rung (a))? Same exchange count — one
  * hash exchange per side vs one over the union — but the composed form
  * pays three real costs the merge join doesn't: the probe side is
  * PADDED with a null column per build value and unioned (wider shuffle
  * rows), the window materializes a running `last(ignoreNulls)` state
  * for every row of BOTH sides, and the post-filter re-scans the union
  * to drop the build rows. The merge exec streams both sorted sides
  * once with O(1) state per key (the latest build row) and emits only
  * matches. Both implementations stay: the spec proves them equal on
  * every input, which is also the correctness argument for the custom
  * code — rung (c) is allowed to exist only while rung (a) re-derives
  * its answers.
  *
  * Semantics (inner as-of, DuckDB `ASOF JOIN` ties): for each probe row,
  * the LATEST build row of the same key with build.ts <= probe.ts;
  * probes with no prior build are dropped. Keys and timestamps are
  * BIGINT (epoch micros/nanos) — the loaders' `ts_ns`/`unix_micros`
  * convention; ordering on integers is total, so results are exact. */
case class AsOfJoinNode(left: LogicalPlan, right: LogicalPlan,
                        leftKey: Attribute, leftTs: Attribute,
                        rightKey: Attribute, rightTs: Attribute)
    extends BinaryNode {
  require(Seq(leftKey, leftTs, rightKey, rightTs).forall(_.dataType == LongType),
    "as-of join: key and ts must be BIGINT on both sides")
  // inner semantics: every output row has a matched build side — no
  // nullability widening needed on either side's attributes
  override def output: Seq[Attribute] = left.output ++ right.output
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinNode =
    copy(left = newLeft, right = newRight)
}

/** Injected via GraftExtensions (extension-built sessions) AND
  * `spark.experimental.extraStrategies` (the runtime fallback
  * `AsOf.ensureStrategy` installs) — planLater keeps child planning
  * with Spark, this strategy claims only its own node. */
object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinNode(l, r, lk, lts, rk, rts) =>
      AsOfJoinExec(planLater(l), planLater(r), lk, lts, rk, rts) :: Nil
    case _ => Nil
  }
}

case class AsOfJoinExec(left: SparkPlan, right: SparkPlan,
                        leftKey: Attribute, leftTs: Attribute,
                        rightKey: Attribute, rightTs: Attribute)
    extends BinaryExecNode {

  override def output: Seq[Attribute] = left.output ++ right.output

  /** Co-partition both sides on the key: EnsureRequirements resolves two
    * ClusteredDistributions into compatible HashPartitionings (the same
    * contract SortMergeJoinExec uses), so equal keys meet in one task. */
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKey :: Nil) ::
      ClusteredDistribution(rightKey :: Nil) :: Nil

  /** (key, ts) sort per side — the merge's only precondition; Spark
    * plants the SortExecs (and reuses an existing order if upstream
    * already provides it, e.g. a sort-clustered layout). */
  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTs, Ascending)),
    Seq(SortOrder(rightKey, Ascending), SortOrder(rightTs, Ascending)))

  // streaming one-pass merge: partitioning and probe-side order survive
  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] =
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTs, Ascending))

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)

  override protected def doExecute(): RDD[InternalRow] = {
    // upcast to Expression before binding: bindReference self-casts its
    // result to the INPUT's static type, and a bound root Attribute IS
    // a BoundReference, not an Attribute
    val lk = BindReferences.bindReference(
      leftKey: org.apache.spark.sql.catalyst.expressions.Expression, left.output)
    val lt = BindReferences.bindReference(
      leftTs: org.apache.spark.sql.catalyst.expressions.Expression, left.output)
    val rk = BindReferences.bindReference(
      rightKey: org.apache.spark.sql.catalyst.expressions.Expression, right.output)
    val rt = BindReferences.bindReference(
      rightTs: org.apache.spark.sql.catalyst.expressions.Expression, right.output)
    left.execute().zipPartitions(right.execute()) { (probeIter, buildIter) =>
      new Iterator[InternalRow] {
        private val joined = new JoinedRow
        // physical-operator contract: downstream consumers (collect's
        // getByteArrayRdd, cache, exchanges) assume UnsafeRow — a raw
        // JoinedRow escaping here is a ClassCastException the moment no
        // ProjectExec happens to sit on top (SortMergeJoinExec carries
        // the same final projection for the same reason)
        private val toUnsafe = org.apache.spark.sql.catalyst.expressions
          .UnsafeProjection.create(output, output)
        // single-row lookahead over the build side; rows are reused by
        // the upstream sort, so anything RETAINED must be copied
        private var bHead: InternalRow = _
        private var bHasHead = false
        private def advanceBuild(): Unit =
          if (buildIter.hasNext) { bHead = buildIter.next(); bHasHead = true }
          else { bHead = null; bHasHead = false }
        advanceBuild()
        // latest build row (copied) for the CURRENT probe key — O(1)
        // state regardless of key cardinality or rows per key
        private var lastKey = 0L
        private var lastBuild: InternalRow = _
        private var nextOut: InternalRow = _
        private var computed = false

        private def computeNext(): Unit = {
          nextOut = null
          while (nextOut == null && probeIter.hasNext) {
            val p = probeIter.next()
            val pKey = lk.eval(p).asInstanceOf[Long]
            val pTs = lt.eval(p).asInstanceOf[Long]
            if (lastBuild != null && lastKey != pKey) lastBuild = null
            // drain build rows at or before (pKey, pTs): keys below pKey
            // are dead (probe is key-ordered), rows of pKey with
            // ts <= pTs improve the as-of candidate
            var draining = bHasHead
            while (draining) {
              val bKey = rk.eval(bHead).asInstanceOf[Long]
              if (bKey < pKey) advanceBuild()
              else if (bKey == pKey &&
                rt.eval(bHead).asInstanceOf[Long] <= pTs) {
                lastBuild = bHead.copy()
                lastKey = pKey
                advanceBuild()
              } else draining = false
              if (!bHasHead) draining = false
            }
            if (lastBuild != null && lastKey == pKey)
              nextOut = toUnsafe(joined(p, lastBuild))
          }
        }
        // LAZY advance: the JoinedRow/UnsafeProjection buffers (and the
        // probe row they wrap) are reused in place, so the next row must
        // not be computed until the consumer is done with the current
        // one — hasNext/next both trigger at most one deferred
        // computeNext()
        override def hasNext: Boolean = {
          if (!computed) { computeNext(); computed = true }
          nextOut != null
        }
        override def next(): InternalRow = {
          if (!computed) computeNext()
          computed = false
          nextOut
        }
      }
    }
  }
}
