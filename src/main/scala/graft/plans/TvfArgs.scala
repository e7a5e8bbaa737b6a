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
