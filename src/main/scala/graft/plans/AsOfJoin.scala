package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, BindReferences, BoundReference, Expression, GenericInternalRow, JoinedRow, RowOrdering, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.execution.metric.SQLMetrics
import org.apache.spark.sql.types.{LongType, TimestampType}

/** Direction of the temporal predecessor/successor search — the
  * pandas `merge_asof(direction=...)` axis, shared by the logical
  * plan, both physical execs and the SQL TVF.
  *
  *  - [[AsOfDirection.Backward]] (default): LAST right row with
  *    `r_ts <= l_ts`; ties at equal r_ts resolve to the HIGHEST tie.
  *  - [[AsOfDirection.Forward]]: FIRST right row with `r_ts >= l_ts`;
  *    ties at equal r_ts resolve to the LOWEST tie (the mirror scan).
  *  - [[AsOfDirection.Nearest]]: whichever of the backward/forward
  *    candidates minimizes |r_ts − l_ts|; an exact distance tie
  *    resolves to the BACKWARD candidate (pandas' prior-row rule).
  *
  * Tolerance is direction-relative: backward bounds `l_ts − r_ts`,
  * forward bounds `r_ts − l_ts`, nearest bounds the absolute gap. */
sealed abstract class AsOfDirection(val name: String, val code: Int)
    extends Serializable
object AsOfDirection {
  case object Backward extends AsOfDirection("backward", 0)
  case object Forward extends AsOfDirection("forward", 1)
  case object Nearest extends AsOfDirection("nearest", 2)
  def parse(s: String): AsOfDirection = s.toLowerCase match {
    case "backward" => Backward
    case "forward" => Forward
    case "nearest" => Nearest
    case other => throw new IllegalArgumentException(
      s"as-of direction must be backward|forward|nearest, got '$other'")
  }
}

/** A NATIVE as-of join — the whole-operator extension path (custom
  * LogicalPlan + SparkStrategy + physical SparkPlan), for the one
  * temporal operator Spark has no relational encoding for.
  *
  * Semantics (default backward direction): for each left row, the
  * LAST right row with the same key and right_ts <= left_ts (ties
  * within equal right_ts resolve to the highest `rightTie`), or nulls
  * when no such row exists — exactly
  * [[graft.ext.TemporalJoins.clickAsOfPurchase]]'s contract, which
  * re-expresses it as union + ordered window. [[AsOfDirection]] flips
  * the search forward (first at-or-after) or to the nearest of the
  * two candidates. This operator is the
  * DIRECT physical form: a sorted merge of the two co-partitioned
  * sides with O(1) carried state per key.
  *
  * Why both forms exist: the window form needs no extension machinery
  * and is the right default; the native exec shows what the engine
  * runs at 100 TB when as-of is a first-class operator (kdb/QuestDB/
  * Flink temporal joins) — ONE hash exchange per side (the planner's
  * EnsureRequirements co-partitions the two ClusteredDistributions and
  * inserts the per-partition sorts), then a streaming merge that never
  * buffers more than one lookahead row and one carried match. No
  * union row inflation, no window frame, and the left side's
  * partitioning/ordering survive for downstream reuse.
  *
  * Scope contract (validated in [[AsOfJoin.asOf]]): equal-arity key
  * lists; timestamps are TimestampType/LongType (compared as long
  * micros); NULL keys cluster like a window PARTITION BY (null is a
  * key value, the as-of-natural reading); rows with a NULL timestamp
  * never match (left) and are skipped (right). Right-side non-key
  * column names must not collide with left output — callers
  * pre-project (the fixture renames clicks to c_ts/c_eid). */
object AsOfJoin {

  /** As-of join `left` to `right` on equal `on` key columns: each left
    * row picks the latest right row at-or-before its timestamp. Right
    * KEY columns are dropped from the output (they equal the left's);
    * the right side is re-aliased internally, so self-joins of one
    * table are safe.
    *
    * `broadcastRight`: None (default) lets the planner choose by the
    * right side's size statistics against autoBroadcastJoinThreshold —
    * the JoinSelection model; Some(true)/Some(false) pins the
    * broadcast / sorted-merge form (a join hint).
    *
    * SESSION MUTATION NOTICE: on first use this method appends
    * [[AsOfJoinStrategy]] and [[AsOfPushdown]] to the session's
    * `experimental.extraStrategies`/`extraOptimizations` so the
    * returned plan is executable without build-time extensions. The
    * mutation is idempotent, additive, node-scoped (both only act on
    * [[AsOfJoinPlan]] nodes, which only this method creates), and is
    * never removed — but it IS session-global state from a library
    * call: a test or framework that snapshots/restores the
    * experimental rule lists should prefer deploying
    * [[graft.functions.GraftExtensions]] via `spark.sql.extensions`,
    * which registers the same pieces at build time and leaves the
    * experimental lists untouched. */
  def asOf(left: DataFrame, right: DataFrame, on: Seq[String],
      leftTsCol: String, rightTsCol: String,
      rightTie: Seq[String] = Nil,
      toleranceUs: Option[Long] = None,
      broadcastRight: Option[Boolean] = None,
      direction: String = "backward"): DataFrame = {
    val dir = AsOfDirection.parse(direction)
    toleranceUs.foreach(t => require(t >= 0, s"negative tolerance $t"))
    require(on.nonEmpty, "as-of join needs at least one equi key")
    val spark =
      left.sparkSession.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    if (!spark.experimental.extraStrategies.contains(AsOfJoinStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ AsOfJoinStrategy
    if (!spark.experimental.extraOptimizations.contains(AsOfPushdown))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ AsOfPushdown
    // fresh exprIds on the right so self-joins don't alias attributes
    // (Alias always mints a new id at analysis)
    val rightFresh = right.select(right.columns.map(c =>
      org.apache.spark.sql.functions.col(c).as(c)): _*)
    def attr(df: DataFrame, n: String): Attribute =
      df.queryExecution.analyzed.output.find(_.name == n).getOrElse(
        throw new IllegalArgumentException(
          s"column $n not found in ${df.columns.mkString(",")}"))
    val lKeys = on.map(attr(left, _))
    val rKeys = on.map(attr(rightFresh, _))
    // key types must agree pairwise: the merge compares raw UnsafeRow
    // key projections with one natural ordering, so an int-vs-long
    // mismatch would produce garbage comparisons, not a cast
    lKeys.zip(rKeys).foreach { case (lk, rk) =>
      require(lk.dataType == rk.dataType,
        s"as-of key type mismatch: ${lk.name}:${lk.dataType} vs " +
          s"${rk.name}:${rk.dataType} — cast one side before joining")
      // float keys are rejected, not normalized: the planner's
      // NormalizeFloatingNumbers rewrite (what makes 0.0/-0.0 and NaN
      // group together in built-in joins) only matches Join/Aggregate/
      // Window nodes, so here the merge exec's compiled ordering and
      // the broadcast prober's byte-wise hash map would DISAGREE on
      // -0.0 vs 0.0. An equi key that needs epsilon semantics is a
      // modeling bug; an exact float key should be cast/quantized by
      // the caller, which also makes the contract visible in the plan.
      require(!lk.dataType.isInstanceOf[org.apache.spark.sql.types.FloatType]
          && !lk.dataType.isInstanceOf[org.apache.spark.sql.types.DoubleType],
        s"as-of key ${lk.name} is floating-point (${lk.dataType}); " +
          "cast to a decimal/integral key before joining")
    }
    val lTs = attr(left, leftTsCol)
    val rTs = attr(rightFresh, rightTsCol)
    Seq(lTs, rTs).foreach(a => require(
      a.dataType == TimestampType || a.dataType == LongType,
      s"as-of timestamp ${a.name} must be timestamp/long, got ${a.dataType}"))
    val keep = rightFresh.queryExecution.analyzed.output
      .filterNot(a => rKeys.exists(_.exprId == a.exprId))
      .map(_.withNullability(true))
    org.apache.spark.sql.GraftPlanBridge.ofRows(spark,
      AsOfJoinPlan(left.queryExecution.analyzed,
        rightFresh.queryExecution.analyzed,
        lKeys, rKeys, lTs, rTs, rightTie.map(attr(rightFresh, _)), keep,
        toleranceUs, broadcastRight, dir))
  }
}

/** Logical as-of join node. `keepRight` is the (nullable-forced) right
  * output surviving into this node's output; key/ts/tie expressions
  * ride in constructor args so QueryPlan collects them into
  * `references` and column pruning keeps exactly what the merge
  * needs. */
case class AsOfJoinPlan(left: LogicalPlan, right: LogicalPlan,
    leftKeys: Seq[Expression], rightKeys: Seq[Expression],
    leftTs: Expression, rightTs: Expression, rightTie: Seq[Expression],
    keepRight: Seq[Attribute], toleranceUs: Option[Long],
    broadcastRight: Option[Boolean] = None,
    direction: AsOfDirection = AsOfDirection.Backward) extends BinaryNode {
  // nullability forced HERE, not on the stored attrs: the analyzer
  // re-resolves attribute expressions against child outputs, which
  // would quietly restore the right side's non-nullable flags
  override def output: Seq[Attribute] =
    left.output ++ keepRight.map(_.withNullability(true))
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinPlan =
    copy(left = newLeft, right = newRight)
}

/** Planner strategy: one logical form, two physical forms — the
  * sorted-merge exec (both sides co-partitioned, constant memory, the
  * 100-TB fact-to-fact shape) and the broadcast exec (the
  * BroadcastHashJoin analog: right side ships to every executor, left
  * side never moves — the fact-to-dimension shape, e.g. events against
  * a slowly-changing reference table).
  *
  * Selection is the JoinSelection model: an explicit hint pins the
  * form; unhinted, the right side's logical size statistics against
  * `spark.sql.autoBroadcastJoinThreshold` decide — a dim-sized right
  * broadcasts, anything else (or threshold -1) merges. */
object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case a: AsOfJoinPlan =>
      val threshold =
        org.apache.spark.sql.internal.SQLConf.get.autoBroadcastJoinThreshold
      val bcast = a.broadcastRight.getOrElse(
        threshold > 0 && a.right.stats.sizeInBytes <= threshold)
      if (bcast)
        BroadcastAsOfJoinExec(a.leftKeys, a.rightKeys, a.leftTs, a.rightTs,
          a.rightTie, a.keepRight, a.toleranceUs, a.direction,
          planLater(a.left), planLater(a.right)) :: Nil
      else
        AsOfJoinExec(a.leftKeys, a.rightKeys, a.leftTs, a.rightTs,
          a.rightTie, a.keepRight, a.toleranceUs, a.direction,
          planLater(a.left), planLater(a.right)) :: Nil
    case _ => Nil
  }
}

/** The per-partition merge state machine, extracted so the volcano
  * path ([[AsOfJoinExec.doExecute]]) and the whole-stage-codegen path
  * ([[AsOfJoinExec.doProduce]]) run the SAME statically-compiled,
  * monomorphic logic — one lookahead right row, one carried match,
  * constant memory. The generated code calls [[probe]] once per left
  * row; JIT inlines it, and the old per-row volcano iterator chain
  * (wrapper Iterator.next → JoinedRow → projection) collapses into
  * the fused stage. */
final class AsOfMerger(
    rIter: Iterator[InternalRow],
    lKeyProj: UnsafeProjection, rKeyProj: UnsafeProjection,
    keyOrd: Ordering[InternalRow],
    lTsOrd: Int, rTsOrd: Int, tolUs: Long, direction: Int,
    nRightCols: Int, resultProj: UnsafeProjection,
    numOut: org.apache.spark.sql.execution.metric.SQLMetric) {

  private var rRow: InternalRow = if (rIter.hasNext) rIter.next() else null
  // ALLOCATION-FREE carried state: the sorted-exchange inputs are
  // UnsafeRows, so the carried match and the previous left key live
  // in two reused UnsafeRow buffers (copyFrom reuses the backing
  // array when capacity allows) — the earlier per-candidate
  // row.copy()/key.copy() cost one allocation per consumed right row,
  // ~2 per left row on dense matches, a measurable share of the merge
  // copyFrom REQUIRES a byte-array-backed row (baseOffset must be
  // BYTE_ARRAY_OFFSET; a bare `new UnsafeRow` has baseOffset 0 and
  // copyMemory would corrupt the heap) — pointTo an empty array so the
  // first copyFrom takes the resize path with a valid offset
  private val matchedBuf = {
    val r = new org.apache.spark.sql.catalyst.expressions.UnsafeRow(nRightCols)
    r.pointTo(Array.emptyByteArray, 0)
    r
  }
  private var matchedValid = false
  private var matchedFallback: InternalRow = _ // non-UnsafeRow inputs
  private var prevKeyBuf: org.apache.spark.sql.catalyst.expressions.UnsafeRow = _
  private var prevKeyValid = false
  private var matchedTs: Long = Long.MinValue
  private val nullRight = new GenericInternalRow(nRightCols)
  private val joined = new JoinedRow

  private def advanceRight(): Unit =
    rRow = if (rIter.hasNext) rIter.next() else null

  private def carry(r: InternalRow): Unit = r match {
    case u: org.apache.spark.sql.catalyst.expressions.UnsafeRow =>
      matchedBuf.copyFrom(u); matchedFallback = null; matchedValid = true
    case other =>
      matchedFallback = other.copy(); matchedValid = true
  }

  /** The matching right row for `l` under the configured direction —
    * backward: latest same-key row at-or-before `l`'s timestamp;
    * forward: earliest same-key row at-or-after; nearest: the closer
    * of the two (distance ties → backward) — within tolerance, joined
    * and projected, or the null-extended row. The returned UnsafeRow
    * buffer is REUSED across calls.
    *
    * All three directions share ONE scan structure: consume right rows
    * that are strictly behind this (and every later) left row, then
    * pick between the carried at-or-before match and the un-consumed
    * lookahead (the at-or-after candidate — sorted (ts, tie) asc, so
    * the first eligible row is the lowest-tie earliest successor).
    * Forward discards instead of carrying (a right row with
    * rTs < lTs can never be at-or-after any later left row either,
    * since left ts only grows within a key), and treats an equal-ts
    * row as the lookahead rather than consuming it. */
  def probe(l: InternalRow): org.apache.spark.sql.catalyst.expressions.UnsafeRow = {
    val lKey = lKeyProj(l)
    // a carried match belongs to the PREVIOUS left key's run; when the
    // left key changes it must die even if no right row intervened
    // (the lookahead may already sit past the new key)
    if (prevKeyValid && keyOrd.compare(prevKeyBuf, lKey) != 0)
      matchedValid = false
    if (prevKeyBuf == null) prevKeyBuf = lKey.copy()
    else prevKeyBuf.copyFrom(lKey)
    prevKeyValid = true
    val lTsNull = l.isNullAt(lTsOrd) // null ts on the left: no match
    val lTs = if (lTsNull) 0L else l.getLong(lTsOrd)
    var done = lTsNull
    // lookahead (forward-candidate) state for this left row: set when
    // the scan stops at a same-key row with rTs >= lTs (forward) /
    // rTs > lTs (backward & nearest — the equal-ts row is consumed
    // into the carried match, whose distance 0 beats any successor)
    var lookValid = false
    var lookTs = 0L
    while (!done && rRow != null) {
      val c = keyOrd.compare(rKeyProj(rRow), lKey)
      if (c < 0) { // right behind on key: its matches are stale
        matchedValid = false; advanceRight()
      } else if (c > 0) done = true
      else if (rRow.isNullAt(rTsOrd)) advanceRight() // null right ts
      else {
        val rTs = rRow.getLong(rTsOrd)
        if (direction == 1) {
          if (rTs < lTs) advanceRight() // stale for all later left rows too
          else { lookValid = true; lookTs = rTs; done = true }
        } else if (rTs <= lTs) {
          // at-or-before: newest-so-far (sorted ts asc, tie asc)
          carry(rRow); matchedTs = rTs
          advanceRight()
        } else { lookValid = true; lookTs = rTs; done = true }
      }
    }
    // tolerance: the newest at-or-before match may still be too old
    // (left ts only grows, so a rejected match can only be
    // resurrected by a NEWER right row, which overwrites it).
    // !lTsNull is checked EXPLICITLY: a null left ts must emit no
    // match by contract, independent of NULLS FIRST sort reasoning.
    var m: InternalRow = nullRight
    if (!lTsNull) {
      val bOk = direction != 1 && matchedValid && lTs - matchedTs <= tolUs
      val fOk = direction != 0 && lookValid && lookTs - lTs <= tolUs
      if (bOk && (!fOk || lTs - matchedTs <= lookTs - lTs))
        m = if (matchedFallback != null) matchedFallback else matchedBuf
      else if (fOk) m = rRow
    }
    numOut += 1
    resultProj(joined(l, m))
  }
}

/** Physical sorted-merge as-of join.
  *
  * Execution model: requiredChildDistribution co-partitions the sides
  * on the keys (one exchange each, or zero when upstream partitioning
  * already satisfies it); requiredChildOrdering sorts each partition
  * by (keys, ts[, tie]); then each partition pair merges with a single
  * lookahead right row and one carried "latest match" copy — constant
  * memory per task regardless of fact sizes, the property that makes
  * as-of safe where a buffering window would spill.
  *
  * Codegen: participates in whole-stage codegen the way
  * SortMergeJoinExec does — both children arrive as input ITERATORS
  * (`inputRDDs`), not as fused produce chains, and the generated loop
  * drives the left iterator through [[AsOfMerger.probe]], handing the
  * projected row to `consume`. Downstream operators (the filter/
  * project/aggregate above the join) fuse with the merge into one
  * stage, which is where the measured ~2.4× volcano overhead vs the
  * window twin lived (PLANS.md "as-of native exec — r13 re-measure"). */
case class AsOfJoinExec(leftKeys: Seq[Expression], rightKeys: Seq[Expression],
    leftTs: Expression, rightTs: Expression, rightTie: Seq[Expression],
    keepRight: Seq[Attribute], toleranceUs: Option[Long],
    direction: AsOfDirection,
    left: SparkPlan, right: SparkPlan)
    extends BinaryExecNode
    with org.apache.spark.sql.execution.CodegenSupport {

  override def output: Seq[Attribute] =
    left.output ++ keepRight.map(_.withNullability(true))

  override lazy val metrics = Map(
    "numOutputRows" -> SQLMetrics.createMetric(sparkContext,
      "number of output rows"))

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKeys) :: ClusteredDistribution(rightKeys) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    (leftKeys :+ leftTs).map(SortOrder(_, Ascending)),
    (rightKeys ++ (rightTs +: rightTie)).map(SortOrder(_, Ascending)))

  // left rows pass through in order, under left's partitioning — both
  // survive for downstream reuse (a follow-up per-key window or join
  // re-uses the exchange)
  override def outputPartitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = left.outputOrdering

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)

  /** One merger per partition — built here (a statically-compiled
    * path shared by both execution modes) and from the generated
    * class's init (via the exec reference). Projections/orderings are
    * created per call, so per-task state never crosses threads. */
  def newMerger(rIter: Iterator[InternalRow]): AsOfMerger = {
    val lOut = left.output
    val rOut = right.output
    // primitive timestamp ordinals, not Expression.eval: the merge
    // reads a timestamp up to twice per row pair and eval boxes a
    // java.lang.Long each read. Both ts exprs are child attributes
    // (asOf validates the types), and Timestamp/Long both store a
    // long, so isNullAt + getLong carry the whole contract
    // allocation-free.
    // COMPILED key ordering (GenerateOrdering — the same generator the
    // sorts use), not RowOrdering's interpreted compare: the merge
    // calls it per (left row, lookahead) pair, and an interpreted
    // expression eval there was the measured residual after the
    // volcano wrapper was removed
    val keyOrd = org.apache.spark.sql.catalyst.expressions.codegen
      .GenerateOrdering.generate(leftKeys.zipWithIndex.map { case (k, i) =>
        SortOrder(BoundReference(i, k.dataType, nullable = true), Ascending)
      })
    new AsOfMerger(
      rIter,
      UnsafeProjection.create(leftKeys, lOut),
      UnsafeProjection.create(rightKeys, rOut),
      keyOrd,
      BindReferences.bindReference(leftTs, lOut)
        .asInstanceOf[BoundReference].ordinal,
      BindReferences.bindReference(rightTs, rOut)
        .asInstanceOf[BoundReference].ordinal,
      // tolerance as a primitive: MaxValue = unbounded, so the emit
      // check is one branchless long compare in the match path
      toleranceUs.getOrElse(Long.MaxValue),
      direction.code,
      rOut.length,
      // bind against NULLABLE-forced right attrs: the original right
      // output may be non-nullable, and a projection bound to it
      // would elide the null checks the miss row needs
      UnsafeProjection.create(output,
        lOut ++ rOut.map(_.withNullability(true))),
      longMetric("numOutputRows"))
  }

  override protected def doExecute(): RDD[InternalRow] =
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val merger = newMerger(rIter)
      lIter.map(merger.probe)
    }

  // ---- whole-stage codegen (the SortMergeJoinExec input model) ------

  override def inputRDDs(): Seq[RDD[InternalRow]] =
    left.execute() :: right.execute() :: Nil

  // probe() reuses its UnsafeRow buffer; buffering parents must copy
  override def needCopyResult: Boolean = true

  override protected def doProduce(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext)
      : String = {
    val execRef = ctx.addReferenceObj("asOfExec", this,
      classOf[AsOfJoinExec].getName)
    val leftInput = ctx.addMutableState("scala.collection.Iterator",
      "asofLeftInput", v => s"$v = inputs[0];")
    val merger = ctx.addMutableState(classOf[AsOfMerger].getName,
      "asofMerger", v => s"$v = $execRef.newMerger(inputs[1]);")
    val lRow = ctx.freshName("asofLeftRow")
    val outRow = ctx.freshName("asofOutRow")
    s"""
       |while ($leftInput.hasNext()) {
       |  org.apache.spark.sql.catalyst.InternalRow $lRow =
       |    (org.apache.spark.sql.catalyst.InternalRow) $leftInput.next();
       |  org.apache.spark.sql.catalyst.expressions.UnsafeRow $outRow =
       |    $merger.probe($lRow);
       |  ${consume(ctx, null, outRow)}
       |  if (shouldStop()) return;
       |}
     """.stripMargin
  }
}

/** The broadcast as-of index: right key → its rows sorted by
  * (ts[, tie…]) with a parallel long array of the timestamps, so the
  * probe's binary search never touches a row. Built ONCE PER EXECUTOR
  * (see the companion's [[GraftAsOfIndex.getOrBuild]] memo) from the
  * broadcast row array — at thousands of tasks the previous
  * once-per-task O(|dim| log |dim|) rebuild dominated a dim-sized
  * probe's setup; memoized, per-task setup is a map lookup.
  *
  * Why a per-executor memo rather than shipping the prebuilt index
  * through a custom `BroadcastMode` (the HashedRelation model, built
  * once on the driver): `BroadcastExchangeExec` sizes its payload by
  * matching on `HashedRelation` | `Array[InternalRow]` and throws on
  * anything else, and `HashedRelation` is a SEALED `execution`-private
  * trait — there is no public seam for a third relation type. The
  * executor-side memo reaches the same asymptotic cost (one build per
  * executor per broadcast) through public API only. */
final class GraftAsOfIndex(
    index: java.util.HashMap[
      org.apache.spark.sql.catalyst.expressions.UnsafeRow,
      GraftAsOfIndex.Bucket]) {
  def bucket(key: org.apache.spark.sql.catalyst.expressions.UnsafeRow)
      : GraftAsOfIndex.Bucket = index.get(key)
}

object GraftAsOfIndex {
  /** One key's right rows, (ts, tie…)-ascending, with the timestamp
    * column extracted for the row-free binary search. */
  final case class Bucket(ts: Array[Long], rows: Array[InternalRow])

  /** Executor-wide memo: (broadcast row array identity × index spec) →
    * built index. The outer map is WEAK on the row array — Torrent
    * broadcast caches one deserialized value per executor, every task
    * sees that instance, and when the block manager evicts it the memo
    * entry unpins with it (a re-deserialized array simply rebuilds
    * once). The inner spec key distinguishes two as-of joins probing
    * the SAME reused broadcast with different key/ts columns. */
  private val cache = new java.util.WeakHashMap[Array[InternalRow],
    java.util.concurrent.ConcurrentHashMap[String, GraftAsOfIndex]]()

  def getOrBuild(rows: Array[InternalRow], spec: String)(
      build: () => GraftAsOfIndex): GraftAsOfIndex = {
    val perRows = cache.synchronized {
      var m = cache.get(rows)
      if (m == null) {
        m = new java.util.concurrent.ConcurrentHashMap[String, GraftAsOfIndex]()
        cache.put(rows, m)
      }
      m
    }
    perRows.computeIfAbsent(spec, _ => build())
  }
}

/** The broadcast as-of probe: binary-searches the executor-memoized
  * [[GraftAsOfIndex]] for the last same-key entry at-or-before each left
  * row's timestamp. Semantics are row-identical to [[AsOfMerger]] —
  * the last eligible entry in (ts, tie) ascending order is exactly
  * the match the sorted merge carries — pinned by the
  * broadcast-vs-native spec on the shared adversarial fixture. */
final class BroadcastAsOfProber(
    index: GraftAsOfIndex,
    lKeyProj: UnsafeProjection,
    lTsOrd: Int, tolUs: Long, direction: Int,
    nRightCols: Int, resultProj: UnsafeProjection,
    numOut: org.apache.spark.sql.execution.metric.SQLMetric) {

  private val nullRight = new GenericInternalRow(nRightCols)
  private val joined = new JoinedRow

  /** The matching right row for `l` under the configured direction —
    * backward: latest same-key entry at-or-before; forward: earliest
    * at-or-after; nearest: the closer candidate, distance ties →
    * backward — within tolerance, joined and projected, or the
    * null-extended row. The returned UnsafeRow buffer is REUSED
    * across calls.
    *
    * One upper-bound search serves all three: `ub` = first index with
    * ts > lTs, so `ub-1` is the backward candidate (last occurrence of
    * the newest eligible ts = highest tie, matching the merge's carry)
    * and `ub` is nearest's forward candidate (first strictly-after
    * row = lowest tie; an equal-ts row belongs to the backward side,
    * whose distance 0 wins any comparison). Pure forward instead needs
    * the LOWER bound — first index with ts >= lTs — because its
    * contract is at-or-AFTER with lowest tie among equal ts. */
  def probe(l: InternalRow): org.apache.spark.sql.catalyst.expressions.UnsafeRow = {
    var m: InternalRow = nullRight
    if (!l.isNullAt(lTsOrd)) {
      val lTs = l.getLong(lTsOrd)
      val bucket = index.bucket(lKeyProj(l))
      if (bucket != null) {
        val ts = bucket.ts
        if (direction == 1) {
          // lower bound: first index with ts >= lTs
          var lo = 0; var hi = ts.length
          while (lo < hi) {
            val mid = (lo + hi) >>> 1
            if (ts(mid) < lTs) lo = mid + 1 else hi = mid
          }
          if (lo < ts.length && ts(lo) - lTs <= tolUs) m = bucket.rows(lo)
        } else {
          // upper bound: first index with ts > lTs
          var lo = 0; var hi = ts.length
          while (lo < hi) {
            val mid = (lo + hi) >>> 1
            if (ts(mid) <= lTs) lo = mid + 1 else hi = mid
          }
          val bOk = lo > 0 && lTs - ts(lo - 1) <= tolUs
          val fOk = direction == 2 && lo < ts.length && ts(lo) - lTs <= tolUs
          if (bOk && (!fOk || lTs - ts(lo - 1) <= ts(lo) - lTs))
            m = bucket.rows(lo - 1)
          else if (fOk) m = bucket.rows(lo)
        }
      }
    }
    numOut += 1
    resultProj(joined(l, m))
  }
}

/** Physical broadcast as-of join — the BroadcastHashJoin analog of
  * [[AsOfJoinExec]], selected by the caller's `broadcastRight` hint
  * for the fact-to-dimension shape (events against a slowly-changing
  * reference table: rates, configs, model versions).
  *
  * Execution model: the right side ships whole to every executor
  * (`BroadcastDistribution(IdentityBroadcastMode)` — EnsureRequirements
  * inserts the one BroadcastExchange), the FIRST task per executor
  * hash-indexes it by key with per-key (ts, tie)-sorted arrays, every
  * later task reuses that index through the [[GraftAsOfIndex]] memo
  * (per-task probe setup ≈ O(1); see the index scaladoc for why the
  * build is executor-side rather than a custom driver-side
  * BroadcastMode), and the left side streams through a binary-search
  * probe IN PLACE: zero shuffles, no sort on either side, left
  * partitioning and ordering preserved verbatim. At 100 TB this is
  * the difference between re-shuffling the fact on a key it will
  * never be read by again and not moving it at all — the same trade
  * BroadcastHashJoin makes, with the probe upgraded from equality to
  * temporal predecessor search. */
case class BroadcastAsOfJoinExec(leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTs: Expression, rightTs: Expression, rightTie: Seq[Expression],
    keepRight: Seq[Attribute], toleranceUs: Option[Long],
    direction: AsOfDirection,
    left: SparkPlan, right: SparkPlan)
    extends BinaryExecNode
    with org.apache.spark.sql.execution.CodegenSupport {

  override def output: Seq[Attribute] =
    left.output ++ keepRight.map(_.withNullability(true))

  override lazy val metrics = Map(
    "numOutputRows" -> SQLMetrics.createMetric(sparkContext,
      "number of output rows"))

  override def requiredChildDistribution: Seq[Distribution] =
    org.apache.spark.sql.catalyst.plans.physical.UnspecifiedDistribution ::
      org.apache.spark.sql.catalyst.plans.physical.BroadcastDistribution(
        org.apache.spark.sql.catalyst.plans.physical.IdentityBroadcastMode) ::
      Nil

  // the whole point: the left side neither moves nor re-sorts
  override def outputPartitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = left.outputOrdering

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): BroadcastAsOfJoinExec =
    copy(left = newLeft, right = newRight)

  /** The memo key distinguishing this exec's index layout on a shared
    * (reused) broadcast: bound key/ts/tie positions + tie count. Bound
    * references are position-based, so equal specs mean the same index
    * bytes regardless of expr ids. */
  private lazy val indexSpec: String = {
    val rOut = right.output
    (rightKeys ++ (rightTs +: rightTie))
      .map(BindReferences.bindReference(_, rOut).toString)
      .mkString(";")
  }

  /** Build the index from the broadcast rows — runs ONCE per executor
    * per (broadcast, spec) through the [[GraftAsOfIndex]] memo.
    * Null-ts rows are dropped at build: they can never match. */
  private def buildIndex(rRows: Array[InternalRow]): GraftAsOfIndex = {
    val rOut = right.output
    val rKeyProj = UnsafeProjection.create(rightKeys, rOut)
    val rTsOrd = BindReferences.bindReference(rightTs, rOut)
      .asInstanceOf[BoundReference].ordinal
    val bucketOrd = org.apache.spark.sql.catalyst.expressions.codegen
      .GenerateOrdering.generate((rightTs +: rightTie).map(e =>
        SortOrder(BindReferences.bindReference(e, rOut), Ascending)))
    val m = new java.util.HashMap[
      org.apache.spark.sql.catalyst.expressions.UnsafeRow,
      scala.collection.mutable.ArrayBuffer[InternalRow]]()
    rRows.foreach { r =>
      if (!r.isNullAt(rTsOrd)) {
        val k = rKeyProj(r).copy()
        var b = m.get(k)
        if (b == null) {
          b = scala.collection.mutable.ArrayBuffer.empty
          m.put(k, b)
        }
        b += r
      }
    }
    val out = new java.util.HashMap[
      org.apache.spark.sql.catalyst.expressions.UnsafeRow,
      GraftAsOfIndex.Bucket](Math.max(8, m.size * 2))
    m.forEach { (k, b) =>
      val sorted = b.toArray.sorted(bucketOrd)
      out.put(k, GraftAsOfIndex.Bucket(sorted.map(_.getLong(rTsOrd)), sorted))
    }
    new GraftAsOfIndex(out)
  }

  /** Per-task prober over the (memoized) executor-local index — called
    * from both doExecute and the generated class's init. Per task this
    * creates only the left-side projections; the index build runs on
    * the first task per executor. */
  def buildProber(rRows: Array[InternalRow]): BroadcastAsOfProber = {
    val lOut = left.output
    val rOut = right.output
    new BroadcastAsOfProber(
      GraftAsOfIndex.getOrBuild(rRows, indexSpec)(() => buildIndex(rRows)),
      UnsafeProjection.create(leftKeys, lOut),
      BindReferences.bindReference(leftTs, lOut)
        .asInstanceOf[BoundReference].ordinal,
      toleranceUs.getOrElse(Long.MaxValue),
      direction.code,
      rOut.length,
      UnsafeProjection.create(output,
        lOut ++ rOut.map(_.withNullability(true))),
      longMetric("numOutputRows"))
  }

  override protected def doExecute(): RDD[InternalRow] = {
    val bcast = right.executeBroadcast[Array[InternalRow]]()
    left.execute().mapPartitions { lIter =>
      val prober = buildProber(bcast.value)
      lIter.map(prober.probe)
    }
  }

  // ---- whole-stage codegen (broadcast-side init, left as iterator) --

  override def inputRDDs(): Seq[RDD[InternalRow]] = left.execute() :: Nil

  // probe() reuses its UnsafeRow buffer; buffering parents must copy
  override def needCopyResult: Boolean = true

  override protected def doProduce(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext)
      : String = {
    // executeBroadcast runs HERE, on the driver at codegen time (the
    // BroadcastHashJoinExec pattern); the generated init only reads
    // the broadcast value on the executor (buildProber then pulls the
    // memoized executor-local index)
    val bcast = right.executeBroadcast[Array[InternalRow]]()
    val bTerm = ctx.addReferenceObj("asofBroadcast", bcast,
      classOf[org.apache.spark.broadcast.Broadcast[_]].getName)
    val execRef = ctx.addReferenceObj("asOfExec", this,
      classOf[BroadcastAsOfJoinExec].getName)
    val leftInput = ctx.addMutableState("scala.collection.Iterator",
      "asofLeftInput", v => s"$v = inputs[0];")
    val prober = ctx.addMutableState(classOf[BroadcastAsOfProber].getName,
      "asofProber",
      v => s"$v = $execRef.buildProber(" +
        s"(org.apache.spark.sql.catalyst.InternalRow[]) $bTerm.value());")
    val lRow = ctx.freshName("asofLeftRow")
    val outRow = ctx.freshName("asofOutRow")
    s"""
       |while ($leftInput.hasNext()) {
       |  org.apache.spark.sql.catalyst.InternalRow $lRow =
       |    (org.apache.spark.sql.catalyst.InternalRow) $leftInput.next();
       |  org.apache.spark.sql.catalyst.expressions.UnsafeRow $outRow =
       |    $prober.probe($lRow);
       |  ${consume(ctx, null, outRow)}
       |  if (shouldStop()) return;
       |}
     """.stripMargin
  }
}
