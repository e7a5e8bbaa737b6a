package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SparkSessionExtensions installer for the library's native functions —
  * the build-time registration path (`spark.sql.extensions=
  * graft.functions.GraftExtensions` or
  * `SparkSession.builder.withExtensions(new GraftExtensions)`);
  * CosineSimilarity.register is the equivalent runtime form. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    // plan-level scale lint (opt-in; see the rule's scaladoc)
    ext.injectOptimizerRule { session =>
      graft.plans.NoGlobalWindowGuard(k =>
        session.conf.getOption(k))
    }
    // WinMagic self-join-back → window rewrite (on by default; kill
    // switch spark.graft.optimizer.winmagic=false — see the scaladoc)
    ext.injectOptimizerRule { session =>
      graft.plans.WinMagicGated(k => session.conf.getOption(k))
    }
    // physical planning for the native as-of join (AsOfJoin.asOf also
    // self-installs via experimental.extraStrategies at first use —
    // this is the build-time form for spark.sql.extensions deployment)
    ext.injectPlannerStrategy(_ => graft.plans.AsOfJoinStrategy)
    // filter pushdown / key transitivity / column pruning through the
    // as-of node — injected into the operator-optimization fixed point
    // so the standard rules carry the pushed pieces into the scans
    ext.injectOptimizerRule(_ => graft.plans.AsOfPushdown)
    // SQL-text spelling of the native as-of join (a TVF expanding to
    // AsOfJoinPlan); AsOfSql.register is the equivalent runtime form
    ext.injectTableFunction((
      FunctionIdentifier(graft.plans.AsOfSql.name),
      graft.plans.AsOfSql.info,
      graft.plans.AsOfSql.builder))
    // SQL-text spelling of the range join (a TVF expanding to an
    // equi+band inner join — never a cross product)
    ext.injectTableFunction((
      FunctionIdentifier(graft.plans.RangeSql.name),
      graft.plans.RangeSql.info,
      graft.plans.RangeSql.builder))
    // SQL-text spelling of the kNN similarity join (a TVF expanding to
    // the broadcast-queries × corpus-scan top-k — left side broadcast
    // by contract, per-query rank bounded by WindowGroupLimit)
    ext.injectTableFunction((
      FunctionIdentifier(graft.plans.KnnSql.name),
      graft.plans.KnnSql.info,
      graft.plans.KnnSql.builder))
    // SQL-text spelling of MinHash-LSH near-duplicate pairs (a TVF
    // expanding to the banded LSH self-join + exact-Jaccard verify —
    // block-bounded, never all-pairs)
    ext.injectTableFunction((
      FunctionIdentifier(graft.plans.NearDupSql.name),
      graft.plans.NearDupSql.info,
      graft.plans.NearDupSql.builder))
    // SQL-text spelling of DSIR importance resampling (a TVF expanding
    // to the bounded-bucket-stats + broadcast-bits + TakeOrdered plan)
    ext.injectTableFunction((
      FunctionIdentifier(graft.plans.DsirSql.name),
      graft.plans.DsirSql.info,
      graft.plans.DsirSql.builder))
    // SQL-text spelling of SemDeDup (a TVF expanding to the k-means
    // blocked pair join + per-cluster union-find + keep windows;
    // resolution materializes the centroid fit, by contract)
    ext.injectTableFunction((
      FunctionIdentifier(graft.plans.SemDedupSql.name),
      graft.plans.SemDedupSql.info,
      graft.plans.SemDedupSql.builder))
    // SQL-text spelling of persisted-index similarity search (a TVF
    // expanding to the loaded IVF-PQ codes + broadcast-codebook ADC
    // join — the sub-corpus-scan scale path knn_join defers to)
    ext.injectTableFunction((
      FunctionIdentifier(graft.plans.IndexSearchSql.name),
      graft.plans.IndexSearchSql.info,
      graft.plans.IndexSearchSql.builder))
    ext.injectFunction((
      FunctionIdentifier("cosine_sim"),
      new ExpressionInfo(
        classOf[CosineSimilarity].getName, "cosine_sim",
        "cosine_sim(a, b) - cosine similarity of two float vectors"),
      { children: Seq[Expression] =>
        require(children.length == 2, "cosine_sim takes exactly 2 arguments")
        CosineSimilarity(children.head, children(1))
      }))
    ext.injectFunction((
      FunctionIdentifier("rolling_min_hash"),
      new ExpressionInfo(
        classOf[RollingMinHash].getName, "rolling_min_hash",
        "rolling_min_hash(s) - min Rabin-Karp hash over 16-byte windows"),
      { children: Seq[Expression] =>
        require(children.length == 1, "rolling_min_hash takes exactly 1 argument")
        RollingMinHash(children.head)
      }))
    ext.injectFunction((
      FunctionIdentifier("simhash32"),
      new ExpressionInfo(
        classOf[SimHash32].getName, "simhash32",
        "simhash32(s) - 32-bit SimHash over distinct space-separated tokens"),
      { children: Seq[Expression] =>
        require(children.length == 1, "simhash32 takes exactly 1 argument")
        SimHash32(children.head)
      }))
  }
}
