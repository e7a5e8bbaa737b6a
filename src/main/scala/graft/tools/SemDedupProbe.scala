package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off diagnosis probe for embed_semdedup's sf0.1 wall: cluster
  * size distribution (the pair join is quadratic in the largest
  * k-means cluster) and stage-by-stage walls (pairs vs CC vs windows).
  * Run: java -cp ... graft.tools.SemDedupProbe [sfDir] */
object SemDedupProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    def timed[T](tag: String)(f: => T): T = {
      val t0 = System.nanoTime
      val r = f
      println(f"[probe] $tag: ${(System.nanoTime - t0) / 1e9}%.2f s")
      r
    }
    val asg = timed("kmeans-checkpointed") {
      val a = graft.ext.EmbedOps.kmeansAssignments(emb).localCheckpoint()
      a.count(); a
    }
    println("[probe] cluster sizes:")
    asg.groupBy("centroid_id").count().orderBy(desc("count")).show(10)
    timed("semdedup-checkpointed-asg") {
      graft.ext.EmbedOps.semDedupFrom(emb, asg).count()
    }
    // the Artifacts posture: plain .cache(), full lineage retained
    val asgC = timed("kmeans-cached") {
      val a = graft.ext.EmbedOps.kmeansAssignments(emb).cache()
      a.count(); a
    }
    timed("semdedup-cached-asg") {
      graft.ext.EmbedOps.semDedupFrom(emb, asgC).count()
    }
    timed("semdedup-cached-asg-again") {
      graft.ext.EmbedOps.semDedupFrom(emb, asgC).count()
    }
    // the exact Bench path: warm at sf0.001, then the SparkEntry lambda
    timed("sparkentry-warm-sf0.001") {
      graft.SparkEntry.queries("embed_kmeans")(spark, "/root/testdata/sf0.001").count()
      graft.SparkEntry.queries("embed_semdedup")(spark, "/root/testdata/sf0.001").count()
    }
    timed("sparkentry-kmeans-sf0.1") {
      graft.SparkEntry.queries("embed_kmeans")(spark, sfDir).count()
    }
    for (i <- 1 to 3) timed(s"sparkentry-semdedup-sf0.1 pass $i") {
      graft.SparkEntry.queries("embed_semdedup")(spark, sfDir).count()
    }
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    for (i <- 1 to 2) timed(s"sparkentry-semdedup-AQE-OFF pass $i") {
      graft.SparkEntry.queries("embed_semdedup")(spark, sfDir).count()
    }
    spark.stop()
  }
}
