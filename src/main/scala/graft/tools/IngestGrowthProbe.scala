package graft.tools

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.streaming.CorpusIngest

/** GROWING-CORPUS ingest probe: per-batch wall clock of the two r18
  * incremental-dedup layers as the STORED corpus grows ≥10× past the
  * first batch — the measured form of "is the per-batch cost flat in
  * stream lifetime?", the exact question the r17 `weak` raised
  * against the semantic-centroid probe (its pre-r18 form joined each
  * batch against the FULL stored corpus under frozen centroids, so
  * per-batch wall grew linearly with everything ever ingested).
  *
  * Per layer it feeds `batches` equal-sized micro-batches of unique
  * content (dedup suppressions would shrink later batches and fake a
  * flattening), records each batch's wall, and summarizes drift as
  * the median wall of the LAST quarter over the median of batches
  * 2..¼ (batch 1 carries Janino/codegen warmup and is reported but
  * excluded from the ratio). Flat ≈ 1; the pre-r18 semantic probe
  * would read ≈ the corpus growth factor.
  *
  * Each batch run includes the same pinned-block hygiene as
  * ScaleLadder (clearCache + unpersist) so walls attribute to their
  * own batch. Run:
  *   runMain graft.tools.IngestGrowthProbe [outPath] [batches] [batchRows]
  */
object IngestGrowthProbe {

  def main(args: Array[String]): Unit = {
    val outPath = args.headOption
      .getOrElse("bench_results/ingest_growth.json")
    val batches = args.drop(1).headOption.map(_.toInt).getOrElse(24)
    val batchRows = args.drop(2).headOption.map(_.toInt).getOrElse(512)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    def hygiene(): Unit = {
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
    }

    /** Deterministic 64-dim grid vector per id (the soak fixture's
      * construction — exact on the 0.001 quantization grid). */
    def vec(id: Long): Array[Float] = {
      val r = new scala.util.Random(40000L + id)
      Array.fill(64)((r.nextInt(2001) - 1000) / 1000.0f)
    }
    def vecBatch(b: Int): DataFrame =
      (0 until batchRows).map { i =>
        val id = b.toLong * batchRows + i
        (id, vec(id))
      }.toDF("vec_id", "embedding")

    /** Unique-vocab doc per id: ~32 tokens, no cross-doc windows (the
      * probe measures index growth, not excision volume). */
    def docBatch(b: Int): DataFrame =
      (0 until batchRows).map { i =>
        val id = b.toLong * batchRows + i
        (id, (0 until 32).map(t => s"t${t}_d$id").mkString(" "))
      }.toDF("doc_id", "text")

    def timedBatches(layer: String)(run: (DataFrame, Long) => Long,
        mk: Int => DataFrame): Vector[Double] = {
      (0 until batches).toVector.map { b =>
        val df = mk(b)
        val t0 = System.nanoTime()
        run(df, b.toLong)
        val w = (System.nanoTime() - t0) / 1e9
        hygiene()
        System.err.println(f"[ingestgrowth] $layer batch $b: $w%.2f s")
        w
      }
    }

    def med(xs: Seq[Double]): Double = graft.BenchStats.median(xs)
    /** last-quarter median over the early median (batch 0 excluded:
      * codegen warmup). */
    def growthRatio(walls: Seq[Double]): Double = {
      val q = math.max(2, walls.size / 4)
      val early = walls.slice(1, 1 + q)
      val late = walls.takeRight(q)
      med(late) / math.max(med(early), 1e-9)
    }

    // ---- semantic-centroid layer -------------------------------------
    // centroids trained once and FROZEN (the CentroidStore contract);
    // repCap 256 so the representative set SATURATES mid-run (k=8
    // clusters × 256 = 2048 reps ≈ batch 4 of 512 rows) — the regime
    // the bound exists for: past saturation the probe cost is capped
    // while the stored corpus keeps growing
    val root = Files.createTempDirectory("graft-ingest-growth").toString
    val centDir = s"$root/cents"
    graft.ext.CentroidStore.build(
      (0 until 2048).map(i => (1000000L + i, vec(1000000L + i)))
        .toDF("vec_id", "embedding"), centDir)
    // warmup on a scratch dir: pay Janino/codegen once, off the books
    CorpusIngest.ingestBatchSemanticCentroid(
      vecBatch(10000), 0L, s"$root/sem_warm", centDir, repCap = 256)
    hygiene()
    val semWalls = timedBatches("semantic_centroid")(
      (df, b) => CorpusIngest.ingestBatchSemanticCentroid(
        df, b, s"$root/sem", centDir, repCap = 256),
      vecBatch)

    // ---- substring layer ---------------------------------------------
    CorpusIngest.ingestBatchSubstring(
      docBatch(10000), 0L, s"$root/sub_warm")
    hygiene()
    val subWalls = timedBatches("substring")(
      (df, b) => CorpusIngest.ingestBatchSubstring(df, b, s"$root/sub"),
      docBatch)

    def fmt(d: Double) = f"$d%.3f"
    def arr(xs: Seq[Double]) = xs.map(fmt).mkString("[", ",", "]")
    val json =
      s"""{
  "probe": "per-batch ingest wall as the stored corpus grows to ${batches}x the batch size; $batchRows unique rows per batch; growth_ratio = median(last quarter)/median(batches 2..1+quarter) - flat ~= 1, the pre-r18 full-corpus semantic probe would read ~= the growth factor",
  "host": "local[$cpus], AQE on",
  "batches": $batches,
  "batch_rows": $batchRows,
  "semantic_centroid": {
    "wall_sec": ${arr(semWalls)},
    "growth_ratio": ${fmt(growthRatio(semWalls))},
    "note": "bounded representative probe (repCap 256, k=8 -> reps saturate ~batch 4); stored-corpus reads per batch: the vec_id drain column scan + the k*repCap reps table"
  },
  "substring": {
    "wall_sec": ${arr(subWalls)},
    "growth_ratio": ${fmt(growthRatio(subWalls))},
    "note": "stored-side occCap filter reads the maintained wincnt table (pre-r18: re-aggregated every stored window occurrence per batch); the remaining growth term is the wins equi-join probe scan, the documented compacted-table posture at 100 TB"
  }
}"""
    Option(Paths.get(outPath).getParent).foreach(Files.createDirectories(_))
    Files.write(Paths.get(outPath), json.getBytes(StandardCharsets.UTF_8))
    println(json)
    spark.stop()
  }
}
