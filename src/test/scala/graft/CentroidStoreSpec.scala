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
    assert(m.gen == 0L && m.centroids.startsWith("e0-centroids-"), m)
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

  test("retrain publishes a new epoch; old generation time-travels; vacuum retention reclaims it") {
    val dir = tmpDir("retrain")
    CentroidStore.build(vecs, dir)
    val m0 = CentroidStore.manifest(dir).get
    val gen0 = CentroidStore.centroids(spark, dir)
      .collect().map(_.toSeq).toSet
    CentroidStore.build(vecs, dir, iters = 1)
    val m1 = CentroidStore.manifest(dir).get
    assert(m1.gen == 1L && m1.epoch == 1L && m1.iters == 1, m1)
    // nonce-suffixed attempt dirs: no two builds can share a data dir
    assert(m0.centroids != m1.centroids &&
      m1.centroids.startsWith("e1-centroids-"), s"$m0 / $m1")
    // time travel: generation 0 still reads its historical snapshot
    assert(CentroidStore.centroidsAt(spark, dir, 0L)
      .collect().map(_.toSeq).toSet == gen0)
    // the in-flight grace: with the default window, a recently-touched
    // non-live dir is NOT wiped (it may be a concurrent builder's
    // un-published attempt) — and since r19 the same window covers
    // _commits entries: a fresh superseded manifest stays readable
    // (time travel keeps working within grace, and a generation
    // published concurrently with the vacuum can never be
    // un-published) and a publisher's mid-link .tmp is never yanked
    // from under it
    val midLink = Paths.get(dir, "_commits", ".manifest-9.tmp-racer")
    Files.write(midLink, "v1\n".getBytes("UTF-8"))
    CentroidStore.vacuum(dir)
    assert(Files.exists(Paths.get(dir, m0.centroids)))
    assert(Files.exists(Paths.get(dir, "_commits", "manifest-0")))
    assert(Files.exists(midLink))
    assert(CentroidStore.centroidsAt(spark, dir, 0L)
      .collect().map(_.toSeq).toSet == gen0) // time travel intact
    // retention (the r17 ADVICE hole: vacuum kept EVERY manifested
    // generation, so a build-per-session store grew one epoch per
    // session forever): keepGenerations=1 with no grace drops gen 0's
    // manifest, its data dir, and the abandoned temp; the live epoch
    // is NEVER retired (its gen is the snapshot max, not below it)
    CentroidStore.vacuum(dir, graceMs = 0L)
    assert(!Files.exists(Paths.get(dir, m0.centroids)))
    assert(!Files.exists(Paths.get(dir, "_commits", "manifest-0")))
    assert(!Files.exists(midLink))
    assert(Files.exists(Paths.get(dir, "_commits", s"manifest-${m1.gen}")))
    assert(CentroidStore.centroids(spark, dir).count() == 8L)
    intercept[IllegalArgumentException] {
      CentroidStore.centroidsAt(spark, dir, 0L)
    }
  }

  test("a racing publish of an already-committed generation fails loudly and cannot clobber it") {
    val dir = tmpDir("race")
    CentroidStore.build(vecs, dir)
    val m0 = CentroidStore.manifest(dir).get
    // a concurrent builder that computed the SAME generation number
    // loses the hard-link race: its manifest must NOT replace the
    // committed one (a rename-based publish would), and it errors
    // loudly so the losing stream never believes it published
    val e = intercept[IllegalStateException] {
      CentroidStore.publish(dir, CentroidStore.Manifest(
        gen = 0L, epoch = 0L, k = 8, iters = 2,
        centroids = "e0-centroids-deadbeef"))
    }
    assert(e.getMessage.contains("concurrent builder"), e.getMessage)
    val after = CentroidStore.manifest(dir).get
    assert(after == m0, s"committed manifest changed: $m0 -> $after")
  }
}
