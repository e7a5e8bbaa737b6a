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

/** A NATIVE as-of join — the whole-operator extension path (custom
  * LogicalPlan + SparkStrategy + physical SparkPlan), for the one
  * temporal operator Spark has no relational encoding for.
  *
  * Semantics: for each left row, the LAST right row with the same key
  * and right_ts <= left_ts (ties within equal right_ts resolve to the
  * highest `rightTie`), or nulls when no such row exists — exactly
  * [[graft.ext.TemporalJoins.clickAsOfPurchase]]'s contract, which
  * re-expresses it as union + ordered window. This operator is the
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
    * table are safe. */
  def asOf(left: DataFrame, right: DataFrame, on: Seq[String],
      leftTsCol: String, rightTsCol: String,
      rightTie: Seq[String] = Nil,
      toleranceUs: Option[Long] = None): DataFrame = {
    toleranceUs.foreach(t => require(t >= 0, s"negative tolerance $t"))
    require(on.nonEmpty, "as-of join needs at least one equi key")
    val spark =
      left.sparkSession.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    if (!spark.experimental.extraStrategies.contains(AsOfJoinStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ AsOfJoinStrategy
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
        toleranceUs))
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
    keepRight: Seq[Attribute], toleranceUs: Option[Long]) extends BinaryNode {
  // nullability forced HERE, not on the stored attrs: the analyzer
  // re-resolves attribute expressions against child outputs, which
  // would quietly restore the right side's non-nullable flags
  override def output: Seq[Attribute] =
    left.output ++ keepRight.map(_.withNullability(true))
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinPlan =
    copy(left = newLeft, right = newRight)
}

/** Planner strategy: one logical form, one physical form. */
object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinPlan(l, r, lk, rk, lts, rts, tie, keep, tol) =>
      AsOfJoinExec(lk, rk, lts, rts, tie, keep, tol,
        planLater(l), planLater(r)) :: Nil
    case _ => Nil
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
  * as-of safe where a buffering window would spill. */
case class AsOfJoinExec(leftKeys: Seq[Expression], rightKeys: Seq[Expression],
    leftTs: Expression, rightTs: Expression, rightTie: Seq[Expression],
    keepRight: Seq[Attribute], toleranceUs: Option[Long],
    left: SparkPlan, right: SparkPlan)
    extends BinaryExecNode {

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

  override protected def doExecute(): RDD[InternalRow] = {
    val numOut = longMetric("numOutputRows")
    val lOut = left.output
    val rOut = right.output
    val lKeyExprs = leftKeys
    val rKeyExprs = rightKeys
    val lTsExpr = leftTs
    val rTsExpr = rightTs
    val outAttrs = output
    // tolerance as a primitive: MaxValue = unbounded, so the emit
    // check is one branchless long compare in the match path
    val tolUs = toleranceUs.getOrElse(Long.MaxValue)
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lKeyProj = UnsafeProjection.create(lKeyExprs, lOut)
      val rKeyProj = UnsafeProjection.create(rKeyExprs, rOut)
      val keyOrd =
        RowOrdering.createNaturalAscendingOrdering(lKeyExprs.map(_.dataType))
      // primitive timestamp ordinals, not Expression.eval: the merge
      // reads a timestamp up to twice per row pair and eval boxes a
      // java.lang.Long each read — pure interpreter overhead in the hot
      // loop. Both ts exprs are child attributes (asOf validates the
      // types), and Timestamp/Long both store a long, so isNullAt +
      // getLong carry the whole contract allocation-free.
      val lTsOrd = BindReferences.bindReference(lTsExpr, lOut)
        .asInstanceOf[BoundReference].ordinal
      val rTsOrd = BindReferences.bindReference(rTsExpr, rOut)
        .asInstanceOf[BoundReference].ordinal
      val nullRight = new GenericInternalRow(rOut.length)
      val joined = new JoinedRow
      // bind against NULLABLE-forced right attrs: the original right
      // output may be non-nullable, and a projection bound to it would
      // elide the null checks the miss row needs
      val resultProj = UnsafeProjection.create(outAttrs,
        lOut ++ rOut.map(_.withNullability(true)))

      new Iterator[InternalRow] {
        // one-row right lookahead (NOT copied — consumed or compared
        // before the iterator reuses it)
        private var rRow: InternalRow = if (rIter.hasNext) rIter.next() else null
        // carried latest match: copies, valid across lookahead advances
        private var matched: InternalRow = _
        private var matchedKey: InternalRow = _
        private var matchedTs: Long = Long.MinValue

        private def advanceRight(): Unit =
          rRow = if (rIter.hasNext) rIter.next() else null

        override def hasNext: Boolean = lIter.hasNext

        override def next(): InternalRow = {
          val l = lIter.next()
          val lKey = lKeyProj(l)
          val lTsNull = l.isNullAt(lTsOrd) // null ts on the left: no match
          val lTs = if (lTsNull) 0L else l.getLong(lTsOrd)
          var done = lTsNull
          while (!done && rRow != null) {
            val c = keyOrd.compare(rKeyProj(rRow), lKey)
            if (c < 0) { // right behind on key: its matches are stale
              matched = null; advanceRight()
            } else if (c > 0) done = true
            else if (rRow.isNullAt(rTsOrd)) advanceRight() // null right ts
            else {
              val rTs = rRow.getLong(rTsOrd)
              if (rTs <= lTs) {
                // at-or-before: newest-so-far (sorted ts asc, tie asc)
                matched = rRow.copy(); matchedKey = lKey.copy()
                matchedTs = rTs
                advanceRight()
              } else done = true
            }
          }
          // tolerance: the newest at-or-before match may still be too
          // old (left ts only grows, so a rejected match can only be
          // resurrected by a NEWER right row, which overwrites it).
          // !lTsNull is checked EXPLICITLY: a null left ts must emit
          // no match by contract, and while NULLS FIRST ordering means
          // a null-ts left row can't follow a carried same-key match
          // today, the contract must not hang on sort-order reasoning
          // alone.
          val m =
            if (!lTsNull && matched != null && matchedKey != null &&
              keyOrd.compare(matchedKey, lKey) == 0 &&
              lTs - matchedTs <= tolUs) matched
            else nullRight
          numOut += 1
          resultProj(joined(l, m))
        }
      }
    }
  }
}
