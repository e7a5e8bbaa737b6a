package graft

import org.apache.spark.sql.functions._

import graft.ext.Sketches

/** The deterministic sketches: KMV distinct estimation and count-min
  * frequency estimation. Load-bearing properties: KMV's error shrinks
  * with k and its shard sketches merge; CMS NEVER underestimates and
  * its counter frames merge by position-wise sum. */
class SketchesSpec extends SparkSpec {

  private def docs(n: Int, dup: Int = 0) = {
    import spark.implicits._
    // n distinct texts + `dup` repeats of the first one
    ((0 until n).map(i => (i.toLong, s"unique document number $i payload")) ++
      (0 until dup).map(i => (n + i.toLong, "unique document number 0 payload")))
      .toDF("doc_id", "text")
  }

  test("KMV estimates distinct count within the k=64 error regime, ignoring duplicates") {
    val r = Sketches.kmvDistinct(docs(400, dup = 50)).head
    assert(r.getAs[Long]("k") == 64L)
    assert(r.getAs[Long]("n_distinct_exact") == 400L)
    val est = r.getAs[Double]("n_distinct_est")
    // stddev ≈ n/sqrt(k) = 50 for k=64; allow 3 sigma
    assert(math.abs(est - 400.0) < 150.0, s"estimate $est")
  }

  test("KMV below capacity: the sketch is the distinct set, estimate exact") {
    val r = Sketches.kmvDistinct(docs(30, dup = 5)).head
    assert(r.getAs[Long]("k") == 30L)
    assert(r.getAs[Double]("n_distinct_est") == 30.0) // refinement path
    assert(r.getAs[Long]("n_distinct_exact") == 30L)
  }

  test("KMV shard sketches merge: k smallest of the union of two shard sketches") {
    import spark.implicits._
    val all = docs(300)
    val hv = (d: org.apache.spark.sql.DataFrame) => d
      .select(conv(substring(md5(col("text").cast("binary")), 1, 15), 16, 10)
        .cast("bigint").as("hv")).distinct()
    val shardA = hv(all.filter(col("doc_id") % 2 === 0)).orderBy("hv").limit(64)
    val shardB = hv(all.filter(col("doc_id") % 2 === 1)).orderBy("hv").limit(64)
    val merged = shardA.unionByName(shardB).distinct()
      .orderBy("hv").limit(64).collect().map(_.getLong(0)).toSeq
    val whole = hv(all).orderBy("hv").limit(64).collect().map(_.getLong(0)).toSeq
    assert(merged == whole)
  }

  test("quantile sketch: below capacity the estimates are exact; shard sketches merge") {
    import spark.implicits._
    // 3 types x 400 events with a deterministic skewed value shape
    val events = (0 until 1200).map { i =>
      (i.toLong, s"t${i % 3}", ((i * 37) % 400).toDouble)
    }.toDF("event_id", "event_type", "value")
    // k = 1000 > per-type population: the sample IS the population,
    // so est == exact at every percentile, per type
    val full = Sketches.quantileSketch(events, k = 1000).collect()
    assert(full.length == 3)
    full.foreach { r =>
      assert(r.getAs[Long]("sample_k") == 400L)
      assert(r.getAs[Double]("p50_est") == r.getAs[Double]("p50_exact"))
      assert(r.getAs[Double]("p90_est") == r.getAs[Double]("p90_exact"))
      assert(r.getAs[Double]("p99_est") == r.getAs[Double]("p99_exact"))
    }
    // k = 64: estimates land inside the per-type value range and the
    // sample really is 64 rows
    val sub = Sketches.quantileSketch(events, k = 64).collect()
    sub.foreach { r =>
      assert(r.getAs[Long]("sample_k") == 64L)
      assert(r.getAs[Double]("p50_est") >= 0.0 &&
        r.getAs[Double]("p50_est") <= 399.0)
      assert(r.getAs[Double]("p50_est") <= r.getAs[Double]("p90_est") &&
        r.getAs[Double]("p90_est") <= r.getAs[Double]("p99_est"))
    }
    // MERGE LAW: bottom-k of (bottomK(A) ∪ bottomK(B)) == bottom-k of
    // A ∪ B — the property that makes the stream maintenance exact
    val a = events.filter(col("event_id") % 2 === 0)
    val b = events.filter(col("event_id") % 2 === 1)
    def sampleSet(df: org.apache.spark.sql.DataFrame) =
      df.select("event_type", "event_id", "value")
        .collect().map(_.toSeq).toSet
    val whole = sampleSet(Sketches.quantileSample(events, 64))
    val merged = sampleSet(Sketches.quantileSample(
      Sketches.quantileSample(a, 64).select("event_type", "event_id", "value")
        .unionByName(
          Sketches.quantileSample(b, 64).select("event_type", "event_id", "value")),
      64))
    assert(merged == whole)
  }

  test("quantile sample executes as WindowGroupLimit (partial bottom-k per task)") {
    import spark.implicits._
    val events = (0 until 300).map(i =>
      (i.toLong, s"t${i % 3}", i.toDouble)).toDF("event_id", "event_type", "value")
    val plan = Sketches.quantileSketch(events, k = 64)
      .queryExecution.executedPlan.toString
    // the rank <= k filter must rewrite to WindowGroupLimit so k rows
    // per map task reach the exchange, never the event volume
    assert(plan.contains("WindowGroupLimit"), plan)
  }

  test("CMS never underestimates; exact at ample width, >= exact under forced collisions") {
    import spark.implicits._
    val events = (0 until 500).map { i =>
      (i.toLong, if (i % 5 == 0) "click" else if (i % 5 == 1) "view"
        else if (i % 5 == 2) "purchase" else if (i % 5 == 3) "scroll" else "hover")
    }.toDF("event_id", "event_type")
    val wide = Sketches.countMinTypes(events, depth = 4, width = 1024).collect()
    wide.foreach { r =>
      assert(r.getAs[Long]("cms_est") == r.getAs[Long]("n_exact"))
    }
    // width 2 over 5 types MUST collide somewhere (pigeonhole)
    val tight = Sketches.countMinTypes(events, depth = 2, width = 2).collect()
    tight.foreach { r =>
      assert(r.getAs[Long]("cms_est") >= r.getAs[Long]("n_exact"))
    }
    assert(tight.exists(r =>
      r.getAs[Long]("cms_est") > r.getAs[Long]("n_exact")))
  }

  test("CMS counter frames from disjoint shards merge by position-wise sum") {
    import spark.implicits._
    val events = (0 until 200).map(i =>
      (i.toLong, s"type${i % 7}")).toDF("event_id", "event_type")
    def counters(d: org.apache.spark.sql.DataFrame) = {
      val pos = conv(substring(md5(concat(col("j").cast("string"), lit(":"),
        col("event_type")).cast("binary")), 1, 15), 16, 10)
        .cast("bigint") % 64
      d.select(col("event_type"), explode(sequence(lit(0), lit(3))).as("j"))
        .select(col("j"), pos.as("pos"))
        .groupBy("j", "pos").agg(count(lit(1)).as("cnt"))
    }
    val whole = counters(events).collect()
      .map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    val a = counters(events.filter(col("event_id") < 100))
    val b = counters(events.filter(col("event_id") >= 100))
    val summed = a.unionByName(b).groupBy("j", "pos")
      .agg(sum(col("cnt")).as("cnt")).collect()
      .map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(summed == whole)
  }

  // ------------------------------------------------------------- HLL

  private def userEvents(n: Int, types: Int = 3, dup: Int = 0) = {
    import spark.implicits._
    // n distinct users per type + `dup` repeat rows of user 0
    ((0 until n * types).map(i =>
      (i.toLong, s"t${i % types}", (i / types).toLong)) ++
      (0 until dup).map(i =>
        (n * types + i.toLong, s"t${i % types}", 0L)))
      .toDF("event_id", "event_type", "user_id")
  }

  /** Plain-Scala HLL reference: md5 → 60-bit hash → top-4-bit bucket,
    * rank = 57 − bitlength of the low 56 bits — independent of every
    * Spark expression under test (bin/shiftright/bitwiseAND). */
  private def refRegisters(rows: Seq[(String, Long)]): Map[(String, Long), Int] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    rows.foldLeft(Map.empty[(String, Long), Int]) { case (acc, (t, u)) =>
      val hex = md.digest(u.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(15)
      val hv = java.lang.Long.parseLong(hex, 16)
      val bucket = hv >>> 56
      val w = hv & ((1L << 56) - 1)
      val rank =
        if (w == 0L) 57
        else 57 - (64 - java.lang.Long.numberOfLeadingZeros(w))
      val k = (t, bucket)
      acc.updated(k, math.max(acc.getOrElse(k, 0), rank))
    }
  }

  test("HLL registers are bit-identical to a plain-Scala md5 reference") {
    val df = userEvents(500, types = 3, dup = 40)
    val engine = Sketches.hllRegisters(df).collect()
      .map(r => (r.getAs[String]("event_type"), r.getAs[Long]("bucket")) ->
        r.getAs[Int]("mreg")).toMap
    val rows = df.select(col("event_type"), col("user_id"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(engine == refRegisters(rows))
  }

  test("HLL estimates distinct users within the m=16 error regime; duplicates don't move registers") {
    val rs = Sketches.hllDistinct(userEvents(500, dup = 200)).collect()
    assert(rs.length == 3)
    rs.foreach { r =>
      assert(r.getAs[Long]("n_distinct_exact") == 500L)
      assert(r.getAs[Long]("z_empty") == 0L)
      // branch dormant: hll_est IS raw_est when no bucket is empty
      assert(r.getAs[Double]("hll_est") == r.getAs[Double]("raw_est"))
      // stddev ≈ 1.04/√16 = 26%; allow ~3 sigma
      assert(math.abs(r.getAs[Double]("hll_est") - 500.0) < 400.0,
        s"estimate ${r.getAs[Double]("hll_est")}")
    }
  }

  test("HLL small-range branch: linear counting replaces the biased-low raw estimate") {
    val r = Sketches.hllDistinct(userEvents(4, types = 1)).head
    val z = r.getAs[Long]("z_empty")
    assert(z >= 12L && z < 16L) // 4 users fill at most 4 of 16 buckets
    val expected = 16.0 * math.log(16.0 / z.toDouble)
    assert(r.getAs[Double]("hll_est") == expected) // same JVM Math.log
    assert(r.getAs[Double]("hll_est") != r.getAs[Double]("raw_est"))
    assert(math.abs(expected - 4.0) < 2.0) // linear counting is accurate here
  }

  test("HLL register frames from disjoint shards merge by position-wise max") {
    val df = userEvents(300)
    val whole = Sketches.hllRegisters(df).collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getInt(2)).toMap
    val a = Sketches.hllRegisters(df.filter(col("user_id") % 2 === 0))
    val b = Sketches.hllRegisters(df.filter(col("user_id") % 2 === 1))
    val merged = a.unionByName(b)
      .groupBy(col("event_type"), col("bucket"))
      .agg(max(col("mreg")).as("mreg")).collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getInt(2)).toMap
    assert(merged == whole)
  }

  // 10-token texts → 3 stride-1 8-token shingles per doc; per-doc
  // unique vocab keeps shingle sets disjoint unless texts are copied.
  private def halfDocs(shared: Int, perHalf: Int = 30) = {
    import spark.implicits._
    def text(tag: String) = (0 until 10).map(j => s"$tag$j").mkString(" ")
    (0 until perHalf).flatMap { i =>
      val even = (2L * i, text(s"e${i}_"))
      val odd =
        if (i < shared) (2L * i + 1, text(s"e${i}_")) // copy of even text
        else (2L * i + 1, text(s"o${i}_"))
      Seq(even, odd)
    }.toDF("doc_id", "text")
  }

  test("KMV overlap: sketch estimators are EXACT once k covers the union") {
    val r = Sketches.kmvShingleOverlap(halfDocs(shared = 10)).head
    // 30 docs × 3 shingles per half; 10 texts copied across halves
    assert(r.getAs[Long]("n_a_exact") == 90L)
    assert(r.getAs[Long]("n_b_exact") == 90L)
    assert(r.getAs[Long]("n_inter_exact") == 30L)
    assert(r.getAs[Long]("ku") == 150L) // |A ∪ B| < k=512 → full coverage
    assert(r.getAs[Long]("c") == 30L)
    // with the union fully inside the sketch, ρ IS the exact Jaccard,
    // est_union is the exact union size (small-set refinement), and
    // est_inter collapses to the exact intersection (150·30/150)
    assert(r.getAs[Double]("est_jaccard") == r.getAs[Double]("jaccard_exact"))
    assert(r.getAs[Double]("jaccard_exact") == 0.2)
    assert(r.getAs[Double]("est_union") == 150.0)
    assert(r.getAs[Double]("est_inter") == 30.0)
  }

  test("KMV overlap: a degenerate half counts 0, not NULL") {
    import spark.implicits._
    // every doc has even doc_id → the odd half has NO shingles
    val d = (0 until 10).map(i =>
      (2L * i, (0 until 10).map(j => s"e${i}_$j").mkString(" ")))
      .toDF("doc_id", "text")
    val r = Sketches.kmvShingleOverlap(d).head
    assert(r.getAs[Long]("n_a_exact") == 30L)
    assert(r.getAs[Long]("n_b_exact") == 0L) // pivot NULL coalesced
    assert(r.getAs[Long]("n_inter_exact") == 0L)
    assert(r.getAs[Long]("c") == 0L)
    assert(r.getAs[Double]("est_jaccard") == 0.0)
    assert(r.getAs[Double]("jaccard_exact") == 0.0)
  }

  test("KMV overlap: identical halves → Jaccard estimate exactly 1") {
    val r = Sketches.kmvShingleOverlap(halfDocs(shared = 30)).head
    assert(r.getAs[Long]("c") == r.getAs[Long]("ku"))
    assert(r.getAs[Double]("est_jaccard") == 1.0)
    assert(r.getAs[Long]("n_inter_exact") == r.getAs[Long]("n_a_exact"))
  }

  test("KMV overlap per-half k-min executes as WindowGroupLimit (partial top-k per task)") {
    val df = Sketches.kmvShingleOverlap(halfDocs(shared = 5))
    // the sketch subtree is cached, so the window lives inside the
    // InMemoryRelation's cached physical plan, not the outer plan
    val cached = df.queryExecution.optimizedPlan.collect {
      case r: org.apache.spark.sql.execution.columnar.InMemoryRelation =>
        r.cachedPlan.toString
    }
    assert(cached.exists(_.contains("WindowGroupLimit")), cached.mkString("\n"))
  }
}
