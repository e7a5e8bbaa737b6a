package graft

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

/** Suite-level shared-artifact memo: derived frames several queries
  * consume (minhash signatures, verified near-dup pairs, trained PQ
  * codebooks, the exact ANN baseline) are computed ONCE per
  * (session, data dir) and reused — the production contract for
  * derived dedup/ANN artifacts at 100 TB, where a dataset-card report
  * or a recall eval derives from the MATERIALIZED dedup/index outputs
  * rather than re-running the pipeline that produced them.
  *
  * Memoization is by explicit (session, dir, key) — not CacheManager
  * plan canonicalization — for the same reason as SparkEntry's decided
  * memo: lambda-bearing plans (the higher-order shingle/quantize
  * expressions) get fresh ExprIds per construction, which defeats
  * canonical plan matching, so two structurally identical builds would
  * otherwise cache twice and compute twice.
  *
  * On a real cluster the equivalent artifact store is a parquet/Delta
  * table written by the dedup/indexing job and read by its consumers;
  * the in-session memo is the single-process stand-in with the same
  * reuse semantics (build once, readers share).
  */
object Artifacts {

  private val memo = TrieMap.empty[(SparkSession, String, String), AnyRef]

  /** A cached DataFrame artifact: built + `.cache()`d on first access,
    * shared by every later query in the same (session, dir). */
  def frame(s: SparkSession, dir: String, key: String)
      (build: => DataFrame): DataFrame =
    obj(s, dir, key)(build.cache())

  /** A non-frame artifact (e.g. [[graft.ext.EmbedOps.PqModel]] — a
    * bundle of frames the builder already caches/checkpoints). */
  def obj[T <: AnyRef](s: SparkSession, dir: String, key: String)
      (build: => T): T = {
    // Bounded, like SparkEntry.decidedMemo: Verify/Bench touch a
    // handful of (session, dir) pairs; a long-lived session cycling
    // many dirs must not pin every cached frame forever. Wholesale
    // eviction is safe — this is purely a perf memo.
    if (memo.size > 64) clear()
    memo.getOrElseUpdate((s, dir, key), build).asInstanceOf[T]
  }

  /** Drop every memoized artifact, unpersisting cached frames. */
  def clear(): Unit = memo.keys.toList.foreach { k =>
    memo.remove(k).foreach {
      case df: Dataset[_] => scala.util.Try(df.unpersist())
      case _ => ()
    }
  }
}
