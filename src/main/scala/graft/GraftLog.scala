package graft

import org.apache.logging.log4j.{Level, LogManager}
import org.apache.logging.log4j.core.config.Configurator

import org.apache.spark.sql.{DataFrame, SparkSession}

/** The reference's console-logging toggles re-expressed as log4j level
  * gating — the idiomatic Spark replacement for an env-guarded
  * `console.log`:
  *
  *  - `ENABLE_DEBUG_LOGGING` (index.js:15) guards dumps of the raw
  *    stream event (index.js:38-40) and each parsed match result
  *    (index.js:223-225). Here the same switch
  *    ([[GraftConf.DebugLoggingKey]]) sets the `graft` logger to DEBUG,
  *    and the dump sites log through [[debug]] / [[debugPlan]].
  *  - The startup config banner (index.js:668-674) becomes
  *    [[startupSummary]] at INFO.
  *
  * What gets dumped differs deliberately: the Lambda prints record
  * PAYLOADS because its batch is ≤1000 rows; a Spark job's batch is
  * millions of rows per partition, so collecting data for a log line is
  * a driver-side action anti-pattern. The debug dump here is the
  * SCHEMA + OPTIMIZED PLAN of the frame — the artifact that actually
  * diagnoses a misbehaving declarative pipeline — which costs one
  * plan-string render and zero jobs at any scale.
  *
  * All message arguments are by-name: when the `graft` logger sits at
  * INFO (debug off), the string is never built — same zero-cost-when-
  * disabled contract as the reference's `if (CONFIG.ENABLE_DEBUG_…)`.
  */
object GraftLog {

  /** Logger NAME shared by the whole library; level is set on this one
    * node so the toggle covers every graft.* class at once. */
  val LoggerName = "graft"

  private val log = LogManager.getLogger(LoggerName)

  /** Read [[GraftConf.DebugLoggingKey]] and set the `graft` logger level
    * accordingly (DEBUG when on, INFO when off). Invoked by the entry
    * points right after [[GraftConf.validate]] — conf-read-at-init, the
    * same visibility the env var has across Lambda cold starts. */
  def applyLevel(spark: SparkSession): Unit =
    Configurator.setLevel(LoggerName,
      if (GraftConf.debugLogging(spark)) Level.DEBUG else Level.INFO)

  def debugEnabled: Boolean = log.isDebugEnabled

  /** Lazy debug line (built only when the toggle is on). */
  def debug(msg: => String): Unit = if (log.isDebugEnabled) log.debug(msg)

  def info(msg: => String): Unit = if (log.isInfoEnabled) log.info(msg)

  /** The parsed-record dump (index.js:223-225) at Spark scale: schema +
    * optimized plan of the frame, never its rows. */
  def debugPlan(label: String, df: DataFrame): Unit =
    if (log.isDebugEnabled) {
      log.debug(s"$label schema: ${df.schema.treeString}")
      log.debug(s"$label plan:\n${df.queryExecution.optimizedPlan}")
    }

  /** Startup banner (index.js:668-674): one INFO line per effective
    * conf, so a deployment's tuning is visible in the driver log. */
  def startupSummary(spark: SparkSession): Unit = {
    info(s"graft config: minMatches = ${GraftConf.minMatches(spark)}")
    info(s"graft config: metricsEnabled = ${GraftConf.metricsEnabled(spark)}")
    info(s"graft config: debugLogging = ${GraftConf.debugLogging(spark)}")
    info(s"graft config: qualityThreshold = ${GraftConf.qualityThreshold(spark)}")
    info(s"graft config: nearDupThreshold = ${GraftConf.nearDupThreshold(spark)}")
    info(s"graft config: cosineThreshold = ${GraftConf.cosineThreshold(spark)}")
    info(s"graft config: denyDomains = ${GraftConf.denyDomains(spark).size} entries")
    info(s"graft config: denyPrefixes = ${GraftConf.denyPrefixes(spark).size} entries")
  }
}
