package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.oracle.OracleSql
import graft.pipeline.{MatchFixture, MatchPipeline}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every entry in `queries` is one operator (or operator composition) from
  * SURVEY.md §2; every entry in `oracleSql` is an independent ANSI-SQL
  * formulation the driver runs in DuckDB over the same parquet tables.
  */
object SparkEntry {

  private def envelope(s: SparkSession, dir: String): DataFrame =
    MatchFixture.envelope(Tables.customer(s, dir))

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    MatchPipeline.actions(envelope(spark, "/root/testdata/sf0.001"))

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- reference core: the CDC match pipeline (O2..O15) -------------
    "pipe_actions" -> ((s, d) => MatchPipeline.actions(envelope(s, d))),
    "pipe_email_jobs" -> ((s, d) => MatchPipeline.emailJobs(envelope(s, d))),
    "pipe_top_matches" -> ((s, d) => MatchPipeline.topMatches(envelope(s, d))),
    "pipe_status_updates" -> ((s, d) => MatchPipeline.statusUpdates(envelope(s, d))),
    "pipe_metrics" -> ((s, d) => MatchPipeline.metrics(envelope(s, d)))
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Map(
    "pipe_actions" -> OracleSql.pipeActions,
    "pipe_email_jobs" -> OracleSql.pipeEmailJobs,
    "pipe_top_matches" -> OracleSql.pipeTopMatches,
    "pipe_status_updates" -> OracleSql.pipeStatusUpdates,
    "pipe_metrics" -> OracleSql.pipeMetrics
  )
}
