package graft

import org.apache.spark.sql.SparkSession

/** The reference's ENV-driven CONFIG block (index.js:11-23) surfaced as
  * Spark session confs: a deployment tunes the pipeline with `--conf`
  * (or `spark.conf.set` at runtime) instead of rebuilding, exactly as
  * the Lambda is tuned with environment variables.
  *
  * Conf reads happen at PLAN-BUILD time (the values become literals in
  * the compiled plan), so a `spark.conf.set` applies to queries built
  * after it — the same visibility env vars have across Lambda cold
  * starts.
  */
object GraftConf {

  /** MIN_MATCHES_FOR_EMAIL (index.js:18): minimum total_matches before
    * an email job is triggered. */
  val MinMatchesKey = "spark.graft.minMatches"

  /** Deny-listed email domains (index.js:433-436), comma-separated. */
  val DenyDomainsKey = "spark.graft.denyList.domains"

  /** Deny-listed email prefixes (index.js:437-438), comma-separated. */
  val DenyPrefixesKey = "spark.graft.denyList.prefixes"

  /** Corpus curation knobs (ext.Corpus): quality floor and near-dup
    * Jaccard threshold of the keep/drop cascade — the curation analog
    * of the pipeline's threshold envs. */
  val QualityThresholdKey = "spark.graft.corpus.qualityThreshold"
  val NearDupThresholdKey = "spark.graft.corpus.nearDupThreshold"

  /** Embedding-space near-dup cosine threshold (ext.EmbedOps semantic
    * dedup / streaming semantic ingestion). */
  val CosineThresholdKey = "spark.graft.embed.cosineThreshold"

  def minMatches(spark: SparkSession): Int =
    spark.conf.get(MinMatchesKey, "1").toInt

  def qualityThreshold(spark: SparkSession): Double =
    spark.conf.get(QualityThresholdKey, "0.5").toDouble

  def nearDupThreshold(spark: SparkSession): Double =
    spark.conf.get(NearDupThresholdKey, "0.5").toDouble

  def cosineThreshold(spark: SparkSession): Double =
    spark.conf.get(CosineThresholdKey, "0.35").toDouble

  def denyDomains(spark: SparkSession): Seq[String] =
    csv(spark.conf.get(DenyDomainsKey, graft.rules.Rules.DefaultDenyDomains.mkString(",")))

  def denyPrefixes(spark: SparkSession): Seq[String] =
    csv(spark.conf.get(DenyPrefixesKey, graft.rules.Rules.DefaultDenyPrefixes.mkString(",")))

  private def csv(s: String): Seq[String] =
    s.split(",").map(_.trim).filter(_.nonEmpty).toSeq
}
