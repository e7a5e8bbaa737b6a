package graft.plans

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Expression, FunctionTableSubqueryArgumentExpression, Literal}
import org.apache.spark.sql.types.StringType
import org.apache.spark.unsafe.types.UTF8String

/** Shared table-argument resolution for the graft SQL table-valued
  * functions ([[AsOfSql]], [[RangeSql]]).
  *
  * Two spellings compose:
  *  - a STRING LITERAL resolves through the session catalog
  *    (`spark.table` — temp views, including ones registered over
  *    filtered/projected frames, and catalog tables alike);
  *  - an inline `TABLE(subquery)` argument — Spark's parser ships the
  *    subquery's unresolved plan inside a
  *    [[FunctionTableSubqueryArgumentExpression]], and building the
  *    DataFrame analyzes that plan in the active session, so
  *    `asof_join(TABLE(SELECT ... WHERE ...), 'rates', ...)` works
  *    without registering a view first.
  *
  * The TABLE-clause decorations (PARTITION BY / ORDER BY / WITH SINGLE
  * PARTITION — Python-UDTF input routing) are rejected loudly: the
  * join operators define their own distribution requirements, and
  * silently ignoring a user's PARTITION BY would misrepresent what
  * ran. Correlated table arguments (outer references) are likewise
  * out of scope for a join macro. */
object TvfArgs {

  /** [[table]] for the CORPUS argument of the compute-heavy TVFs
    * (dsir_sample, neardup_pairs, semdedup, knn_join, centroid_assign,
    * dup_spans family): a STRING-NAMED table is spread to the session's
    * parallelism when its scan has fewer partitions — the TVF macros
    * promise "identical plan and scale posture to the engine call",
    * and the engine entry points all feed a spread corpus
    * (SparkEntry's docs()/emb() repartition), while a raw single-file
    * fixture scan would run the whole fan-out stage on ONE task
    * (measured: dsir_sample('documents') spent ~0.9 s in three serial
    * single-task stages that the spread runs 32-wide). The condition
    * keeps the 100-TB posture: a production table with many splits
    * already exceeds the parallelism floor and is passed through
    * untouched — no extra exchange. TABLE(subquery) arguments are the
    * user's shape and are never rewritten (REPARTITION hints inside
    * them compose, as the dup_spans gate queries do). */
  def spreadTable(spark: SparkSession, fn: String, args: Seq[Expression],
      i: Int, what: String): DataFrame = {
    val t = table(spark, fn, args, i, what)
    args(i) match {
      case Literal(_: UTF8String, StringType) =>
        val p = spark.sparkContext.defaultParallelism
        // getNumPartitions plans (never runs) the scan; leaf-cheap
        if (t.rdd.getNumPartitions < p) t.repartition(p) else t
      case _ => t
    }
  }

  def table(spark: SparkSession, fn: String, args: Seq[Expression],
      i: Int, what: String): DataFrame = args(i) match {
    case f: FunctionTableSubqueryArgumentExpression =>
      require(f.outerAttrs.isEmpty,
        s"$fn: $what (argument ${i + 1}) must not be a correlated " +
          "TABLE argument")
      require(f.partitionByExpressions.isEmpty &&
        f.orderByExpressions.isEmpty && !f.withSinglePartition,
        s"$fn: $what (argument ${i + 1}) does not take PARTITION BY / " +
          "ORDER BY / WITH SINGLE PARTITION — the join defines its own " +
          "distribution")
      org.apache.spark.sql.GraftPlanBridge.ofRows(spark, f.plan)
    case Literal(v: UTF8String, StringType) if v != null =>
      spark.table(v.toString)
    case other => throw new IllegalArgumentException(
      s"$fn: $what (argument ${i + 1}) must be a string-literal table " +
        s"name or TABLE(subquery), got $other")
  }

  /** Resolve a user-supplied column name against `df` with the SAME
    * resolver the analyzer uses (case-insensitive unless
    * `spark.sql.caseSensitive` is set), returning the ACTUAL column
    * name — so `neardup_pairs('documents', 'DOC_ID', ...)` resolves
    * exactly where a plain SQL reference would, instead of failing a
    * case-sensitive `columns.contains`. Ambiguity (two columns equal
    * under the resolver) is rejected loudly, matching the analyzer's
    * AMBIGUOUS_REFERENCE behavior. */
  def resolveColumn(spark: SparkSession, fn: String, df: DataFrame,
      name: String, what: String): String = {
    val resolver = spark.sessionState.analyzer.resolver
    df.columns.filter(resolver(_, name)) match {
      case Array(one) => one
      case Array() => throw new IllegalArgumentException(
        s"$fn: $what '$name' not found in the table " +
          s"(${df.columns.mkString(",")})")
      case many => throw new IllegalArgumentException(
        s"$fn: $what '$name' is ambiguous in the table " +
          s"(matches ${many.mkString(",")})")
    }
  }
}
