package graft

import scala.util.Random

import org.apache.spark.sql.functions._

import graft.pipeline.{MatchFixture, MatchPipeline}
import graft.rules.Rules
import graft.streaming.StreamPipeline

/** Property-style invariants (SURVEY.md §5.4) over seeded random key
  * samples of the deterministic fixture. */
class PropertySpec extends SparkSpec {

  private val Actions =
    Set("email_triggered", "skipped", "duplicate_prevented", "error")

  private def randomKeys(seed: Int, n: Int): Seq[Long] = {
    val r = new Random(seed)
    Seq.fill(n)(1L + r.nextInt(5000)).distinct
  }

  private def envelopeFor(ks: Seq[Long]) = {
    import spark.implicits._
    MatchFixture.envelope(
      ks.map(k => (k, s"Customer#$k")).toDF("c_custkey", "c_name"))
  }

  test("as-of join equals the brute-force definition on random timelines") {
    import spark.implicits._
    for (seed <- 1 to 3) {
      val r = new Random(seed)
      // small ts domain (0..49s) forces same-user and same-ts collisions
      val rows = (1L to 300L).map { id =>
        (id,
          java.sql.Timestamp.valueOf(s"2024-01-01 00:00:${
            f"${r.nextInt(50)}%02d"}"),
          r.nextInt(8).toLong,
          if (r.nextBoolean()) "click" else "purchase")
      }
      val df = rows.toDF("event_id", "ts", "user_id", "event_type")
      val got = graft.ext.TemporalJoins.clickAsOfPurchase(df)
        .select("purchase_event_id", "click_event_id").collect()
        .map(x => x.getLong(0) ->
          Option(x.getAs[java.lang.Long]("click_event_id")).map(_.toLong)).toMap
      // brute force: for each purchase, max-event_id click among those
      // with the latest ts ≤ purchase ts, same user
      val clicks = rows.filter(_._4 == "click")
      val expected = rows.filter(_._4 == "purchase").map { p =>
        val cands = clicks.filter(c => c._3 == p._3 && !c._2.after(p._2))
        p._1 -> (if (cands.isEmpty) None
                 else {
                   val maxTs = cands.map(_._2.getTime).max
                   Some(cands.filter(_._2.getTime == maxTs).map(_._1).max)
                 })
      }.toMap
      assert(got == expected, s"seed=$seed")
    }
  }

  test("totality: every record gets a valid (action, reason), no throws") {
    for (seed <- 1 to 3) {
      val ks = randomKeys(seed, 400)
      val out = MatchPipeline.decide(envelopeFor(ks))
        .select("record_id", "action", "reason").collect()
      assert(out.length == ks.length)
      out.foreach { r =>
        assert(Actions.contains(r.getString(1)), r.toString)
        assert(r.getString(2) != null && r.getString(2).nonEmpty)
      }
    }
  }

  test("effectively-once intent: no two triggered records collide on the dedup key") {
    for (seed <- 4 to 6) {
      val trig = MatchPipeline.decide(envelopeFor(randomKeys(seed, 500)))
        .filter(col("action") === "email_triggered")
        .select(col("event_id"), col("guest_email"),
          Rules.asciiLower(col("guest_email")).as("lower_email"))
        .collect()
      // reference semantics: a later probe only sees a stored email that
      // is itself lowercase — so two triggered records may not share
      // (event_id, lower(email)) when the earlier one's raw address is
      // already lowercase
      val byKey = trig.groupBy(r => (r.getString(0), r.getString(2)))
      byKey.foreach { case (_, rows) =>
        val lowercaseRaw = rows.count(r => r.getString(1) == r.getString(2))
        assert(lowercaseRaw <= 1,
          s"duplicate email intent: ${rows.mkString(", ")}")
      }
    }
  }

  test("streaming state machine: at most one trigger per email key, ever") {
    for (seed <- 7 to 8) {
      val out = StreamPipeline.outcomes(envelopeFor(randomKeys(seed, 500)))
        .filter(col("action") === "email_triggered")
        .groupBy(col("emailKey")).count().collect()
      out.foreach(r => assert(r.getLong(1) == 1L, r.toString))
    }
  }

  test("connected components equal a driver-side union-find on random graphs") {
    import spark.implicits._
    for (seed <- 1 to 3) {
      val r = new Random(seed)
      val n = 120
      val edges = Seq.fill(100)((r.nextInt(n).toLong, r.nextInt(n).toLong))
        .filter { case (a, b) => a != b }
      // reference: union-find with min-id representative
      val parent = Array.tabulate(n)(identity)
      def find(x: Int): Int =
        if (parent(x) == x) x else { parent(x) = find(parent(x)); parent(x) }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a.toInt), find(b.toInt))
        if (ra != rb) { val lo = math.min(ra, rb); parent(math.max(ra, rb)) = lo }
      }
      val expect = (0 until n).map(i => i.toLong -> find(i).toLong).toMap
      val got = graft.ext.Graph.connectedComponents(
          (0L until n.toLong).toDF("id"), edges.toDF("a", "b"))
        .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
      assert(got == expect, s"seed=$seed")
    }
  }

  test("k-means assignments equal a driver-side Lloyd reference on random vectors") {
    import spark.implicits._
    for (seed <- 1 to 3) {
      val r = new Random(seed)
      val vecs = (0L until 30L).map(id =>
        id -> Array.fill(4)(r.nextFloat() * 2f - 1f))
      val q = vecs.map { case (id, v) =>
        id -> v.map(x => math.round(x.toDouble * 1000)) }.toMap
      def d2(a: Array[Long], b: Array[Long]): Long =
        a.zip(b).map { case (x, c) => (x - c) * (x - c) }.sum
      def assign(cents: Seq[(Long, Array[Long])]) = q.map { case (id, v) =>
        id -> cents.map { case (c, cv) => (c, d2(v, cv)) }
          .minBy { case (c, dd) => (dd, c) } }
      // same Knuth-hash spread order as EmbedOps.seedSpread
      def spread(id: Long): Long = {
        val h = ((id % 4194304 + 99991) * 2654435761L) % 4294967296L
        h ^ (h / 65536)
      }
      var cents = vecs.map(_._1).sortBy(id => (spread(id), id)).take(3)
        .map(id => id -> q(id))
      for (_ <- 1 to 2) {
        val a = assign(cents)
        cents = cents.map { case (cid, old) =>
          val ms = a.collect { case (id, (c, _)) if c == cid => q(id) }.toSeq
          if (ms.isEmpty) cid -> old
          else cid -> old.indices.map { i =>
            val s = ms.map(_(i)).sum; val n = ms.size.toLong
            (s - (((s % n) + n) % n)) / n
          }.toArray
        }
      }
      val expect = assign(cents)
      val got = graft.ext.EmbedOps.kmeansAssignments(
          vecs.map { case (id, v) => (id, v, 0) }
            .toDF("vec_id", "embedding", "label"), k = 3, iters = 2)
        .collect().map(x => x.getAs[Long]("vec_id") ->
          (x.getAs[Long]("centroid_id"), x.getAs[Long]("d2"))).toMap
      assert(got == expect, s"seed=$seed")
    }
  }

  test("Morton z-value equals the bit-by-bit interleave on random keys") {
    import spark.implicits._
    def morton(a: Long, b: Long): Long = (0 until 16).map { i =>
      (((a >> i) & 1L) << (2 * i)) | (((b >> i) & 1L) << (2 * i + 1))
    }.reduce(_ | _)
    for (seed <- 1 to 3) {
      val r = new Random(seed)
      val keys = Seq.fill(200)(
        (math.abs(r.nextLong()) % 100000L, math.abs(r.nextLong()) % 100000L))
      val got = keys.zipWithIndex.map { case ((a, b), i) => (i, a, b) }
        .toDF("i", "a", "b")
        .select(col("i"), graft.ext.Layout.zvalue2(col("a"), col("b")).as("z"))
        .collect().map(x => x.getInt(0) -> x.getLong(1)).toMap
      keys.zipWithIndex.foreach { case ((a, b), i) =>
        assert(got(i) == morton(a & 0xFFFFL, b & 0xFFFFL), s"seed=$seed i=$i")
      }
    }
  }

  test("KMV overlap equals a driver-side set computation whenever the sketch covers the union") {
    import spark.implicits._
    for (seed <- 1 to 3) {
      val r = new Random(seed)
      // random 10-token docs from a shared tiny phrase pool: cross-half
      // shingle overlap arises naturally from pool collisions
      val pool = (0 until 12).map(p => (0 until 10).map(j => s"p${p}_$j"))
      val rows = (0L until 60L).map(i => (i, pool(r.nextInt(12)).mkString(" ")))
      val d = rows.toDF("doc_id", "text")
      val row = graft.ext.Sketches.kmvShingleOverlap(d).head
      // driver-side reference over the same 8-token shingles
      def shingles(t: String): Set[Seq[String]] = {
        val tk = t.split(" ").toSeq
        (0 to tk.length - 8).map(i => tk.slice(i, i + 8)).toSet
      }
      val a = rows.filter(_._1 % 2 == 0).flatMap(x => shingles(x._2)).toSet
      val b = rows.filter(_._1 % 2 == 1).flatMap(x => shingles(x._2)).toSet
      val inter = (a & b).size
      val union = (a | b).size
      assert(union < 512, "fixture must stay under sketch capacity")
      assert(row.getAs[Long]("n_a_exact") == a.size, s"seed=$seed")
      assert(row.getAs[Long]("n_b_exact") == b.size, s"seed=$seed")
      assert(row.getAs[Long]("n_inter_exact") == inter, s"seed=$seed")
      assert(row.getAs[Long]("ku") == union, s"seed=$seed")
      // below capacity every estimator is exact, not approximate
      assert(row.getAs[Double]("est_union") == union.toDouble, s"seed=$seed")
      assert(row.getAs[Double]("est_inter") == inter.toDouble, s"seed=$seed")
    }
  }

  test("BM25 scores are bounded by idf·(k1+1) and monotone in tf at fixed dl") {
    import spark.implicits._
    for (seed <- 1 to 3) {
      val r = new Random(seed)
      // every doc: 20 tokens, tf(q) of the query term, rest unique filler
      val rows = (0L until 40L).map { i =>
        val tf = 1 + r.nextInt(10)
        val toks = Seq.fill(tf)("q") ++
          (0 until (20 - tf)).map(j => s"f${i}_$j")
        (i, tf, toks.mkString(" "))
      }
      val d = rows.map(x => (x._1, x._3)).toDF("doc_id", "text")
      val out = graft.ext.TextOps.bm25TopDocs(d, query = Seq("q"), k = 40)
        .collect().map(x => x.getAs[Long]("doc_id") -> x.getAs[Long]("score"))
      val tfOf = rows.map(x => x._1 -> x._2).toMap
      // uniform dl → score strictly increases with tf (saturating, so
      // never past idf·(k1+1)); equal tf → equal score
      val byTf = out.groupBy { case (id, _) => tfOf(id) }
        .map { case (tf, xs) => tf -> xs.map(_._2).distinct }
      byTf.foreach { case (tf, scores) =>
        assert(scores.size == 1, s"seed=$seed tf=$tf not score-pure")
      }
      val ordered = byTf.toSeq.sortBy(_._1).map(_._2.head)
      assert(ordered == ordered.sorted, s"seed=$seed not monotone in tf")
      // bound: core < (k1+1)=2.2 scaled by 1e6, idf ≤ 1000·(2N+1)/3
      val n = rows.size
      val idfMax = (1000L * (2 * n + 1)) / 3
      assert(out.forall(_._2 <= idfMax * 2200000L), s"seed=$seed over bound")
    }
  }

  test("GIF LZW roundtrip is pixel-exact on random images incl. width growth and dict reset") {
    import graft.ext.{GifCodec, ImageCodec}
    val r = new Random(1234)
    // sizes chosen to cross the 9->10->11-bit widths and, in the
    // low-color cases, long-chain dictionaries; the 80x64 random-color
    // image emits ~1 code per pixel, overflowing the 4096-entry
    // dictionary and forcing the Clear-reset path
    val cases = Seq(
      (1, 1, 256), (3, 2, 256), (17, 13, 256), (34, 26, 256),
      (40, 30, 4), (100, 80, 2), (80, 64, 256))
    for ((w, h, colors) <- cases) {
      val px = Array.fill(w * h)(r.nextInt(colors))
      val pal = Array.tabulate(256)(i => (i, (i * 3) % 256, (i * 11) % 256))
      val bytes = GifCodec.encode(w, h, px(_), pal(_))
      val img = ImageCodec.decode(bytes)
      assert(img.format == "gif" && img.width == w && img.height == h)
      var p = 0
      while (p < w * h) {
        val (er, eg, eb) = pal(px(p))
        assert(img.r(p) == er && img.g(p) == eg && img.b(p) == eb,
          s"pixel $p of ${w}x$h/$colors")
        p += 1
      }
    }
  }

  test("PNG roundtrip is pixel-exact on random images across all filter rows") {
    import graft.ext.{ImageCodec, PngCodec}
    val r = new Random(4321)
    // h >= 6 exercises every filter type (row % 5); the 1xN / Nx1
    // degenerate shapes stress the left/up predecessor edge cases
    // (a=0 column, b=0 row); random bytes are the worst case for the
    // Paeth/Average arithmetic (no structure to hide a sign bug);
    // sizes large enough that the DEFLATE stream splits across the
    // two-IDAT path
    val cases = Seq((1, 8), (9, 1), (2, 6), (16, 11), (33, 7), (24, 26))
    for ((w, h) <- cases) {
      val px = Array.fill(w * h)((r.nextInt(256), r.nextInt(256), r.nextInt(256)))
      val bytes = PngCodec.encode(w, h, px(_))
      val img = ImageCodec.decode(bytes)
      assert(img.format == "png" && img.width == w && img.height == h)
      var p = 0
      while (p < w * h) {
        assert((img.r(p), img.g(p), img.b(p)) == px(p),
          s"pixel $p of ${w}x$h")
        p += 1
      }
    }
  }

}
