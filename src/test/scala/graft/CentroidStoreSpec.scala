package graft

import java.nio.file.{Files, Paths}

import graft.ext.{CentroidStore, EmbedOps}

/** The persisted k-means centroid artifact: load-path parity with the
  * session-trained geometry (the frozen-centroid contract incremental
  * semantic dedup relies on) and the manifest protocol's
  * crash-atomicity / format-guard / retrain-epoch pins — mirroring
  * TokenizerStoreSpec, which shares the commit discipline. */
class CentroidStoreSpec extends SparkSpec {

  private def tmpDir(tag: String): String = {
    val d = Files.createTempDirectory(s"graft_cent_$tag")
    d.toFile.deleteOnExit()
    d.toString + "/cents"
  }

  /** Two tight orthogonal groups — any sane clustering separates
    * them, and every fit is integer-deterministic. */
  private def vecs = {
    import spark.implicits._
    (0 until 12).map { i =>
      val base = if (i % 2 == 0) Array(1.0f, 0.0f, 1.0f, 0.0f)
      else Array(0.0f, 1.0f, 0.0f, -1.0f)
      (i.toLong, base.map(_ + i * 0.001f))
    }.toDF("vec_id", "embedding")
  }

  test("loaded centroids reproduce the session training; assignAgainst equals the session chain bit-for-bit") {
    val dir = tmpDir("parity")
    CentroidStore.build(vecs, dir)
    val m = CentroidStore.manifest(dir).get
    assert(m.gen == 0L && m.k == 8 && m.iters == 2, m)
    val trained = EmbedOps.kmeansCentroids(vecs, k = m.k, iters = m.iters)
      .collect().map(_.toSeq).toSet
    val loaded = CentroidStore.centroids(spark, dir)
      .collect().map(_.toSeq).toSet
    assert(loaded == trained && loaded.nonEmpty)
    // the frozen-geometry contract: assignment through the LOADED
    // artifact is bit-equal to the session-shared kmeans chain
    val viaStore = EmbedOps.assignAgainst(
      vecs, CentroidStore.centroids(spark, dir))
      .collect().map(_.toSeq).toSet
    val viaSession = EmbedOps.kmeansAssignments(vecs, k = m.k, iters = m.iters)
      .collect().map(_.toSeq).toSet
    assert(viaStore == viaSession && viaStore.size == 12)
  }

  test("a torn build (orphan dir + manifest temp, no commit) is invisible") {
    val dir = tmpDir("torn")
    CentroidStore.build(vecs, dir)
    val before = CentroidStore.centroids(spark, dir)
      .collect().map(_.toSeq).toSet
    Files.createDirectories(Paths.get(dir, "e1-centroids"))
    Files.write(Paths.get(dir, "_commits", ".manifest-1.tmp"),
      "format=1\nepoch=1\nk=8\niters=2\ncentroids=e1-centroids\n"
        .getBytes("UTF-8"))
    val m = CentroidStore.manifest(dir).get
    assert(m.gen == 0L && m.centroids == "e0-centroids", m)
    assert(CentroidStore.centroids(spark, dir)
      .collect().map(_.toSeq).toSet == before)
  }

  test("a future-format manifest fails loudly instead of being reinterpreted") {
    val dir = tmpDir("fmt")
    Files.createDirectories(Paths.get(dir, "_commits"))
    Files.write(Paths.get(dir, "_commits", "manifest-0"),
      "format=99\nepoch=0\nk=8\niters=2\ncentroids=e0-centroids\n"
        .getBytes("UTF-8"))
    val e = intercept[IllegalStateException] { CentroidStore.manifest(dir) }
    assert(e.getMessage.contains("format 99") &&
      e.getMessage.contains("build()"), e.getMessage)
  }

  test("retrain publishes a new epoch; old generation time-travels; vacuum reclaims dead dirs") {
    val dir = tmpDir("retrain")
    CentroidStore.build(vecs, dir)
    val gen0 = CentroidStore.centroids(spark, dir)
      .collect().map(_.toSeq).toSet
    CentroidStore.build(vecs, dir, iters = 1)
    val m1 = CentroidStore.manifest(dir).get
    assert(m1.gen == 1L && m1.epoch == 1L && m1.iters == 1, m1)
    // time travel: generation 0 still reads its historical snapshot
    assert(CentroidStore.centroidsAt(spark, dir, 0L)
      .collect().map(_.toSeq).toSet == gen0)
    // drop gen 0's manifest, vacuum: its data dir is reclaimed, the
    // live epoch survives
    Files.delete(Paths.get(dir, "_commits", "manifest-0"))
    CentroidStore.vacuum(dir)
    assert(!Files.exists(Paths.get(dir, "e0-centroids")))
    assert(CentroidStore.centroids(spark, dir).count() == 8L)
  }
}
