package graft

import graft.ext.EmbedOps

/** The knn_join TVF: SQL-composable similarity search. Pins the
  * engine/SQL equivalence, the generic two-table contract against a
  * plain-Scala brute force, the bounded-output plan shape, and the
  * loud-rejection validation surface. */
class KnnSqlSpec extends SparkSpec {

  private val d = "/root/testdata/sf0.001"

  test("knn_join TVF is row-identical to the engine call; self-match ranks first at 1.0") {
    val df = SparkEntry.queries("sql_knn")(spark, d)
    val rows = df.collect()
    assert(rows.nonEmpty)
    // engine call on the same sides
    val emb = Tables.embeddings(spark, d)
    val viaDf = EmbedOps.knnJoin(
      emb.filter(org.apache.spark.sql.functions.col("vec_id") % 97 === 0),
      emb, "vec_id", "embedding", 5)
    assert(rows.map(_.toSeq).toSet == viaDf.collect().map(_.toSeq).toSet)
    // the corpus contains every query row → rank 1 is the self-match
    rows.filter(_.getInt(1) == 1).foreach { r =>
      assert(r.getLong(0) == r.getLong(2) && r.getDouble(3) == 1.0, r)
    }
    // bounded output: per-query rank <= k via WindowGroupLimit
    assert(df.queryExecution.executedPlan.toString
      .contains("WindowGroupLimit"))
  }

  test("knnJoin on two disjoint tables equals a plain-Scala brute force") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    def vec() = Array.fill(8)(rnd.nextFloat() * 2f - 1f)
    val corpus = (0L until 40L).map(i => (i, vec()))
    val queries = (100L until 106L).map(i => (i, vec()))
    def q(v: Array[Float]): Array[Long] =
      v.map(x => math.round(x.toDouble * 1000))
    def cos(a: Array[Long], b: Array[Long]): Double = {
      val dot = a.zip(b).map { case (x, y) => x * y }.sum
      dot.toDouble / math.sqrt(
        (a.map(x => x * x).sum * b.map(x => x * x).sum).toDouble)
    }
    val expect = queries.flatMap { case (qid, qv) =>
      corpus.map { case (cid, cv) => (qid, cid, cos(q(qv), q(cv))) }
        .sortBy { case (_, cid, c) => (-c, cid) }.take(3).zipWithIndex
        .map { case ((_, cid, c), i) => (qid, i + 1, cid, c) }
    }.toSet
    val got = EmbedOps.knnJoin(
      queries.toDF("vec_id", "embedding"), corpus.toDF("vec_id", "embedding"),
      "vec_id", "embedding", 3)
      .collect().map(r =>
        (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSet
    assert(got == expect)
  }

  test("knn_join TVF composes: TABLE(subquery) equals the registered-view form") {
    graft.GraftSql.attach(spark, d)
    spark.sql("SELECT vec_id, embedding FROM embeddings WHERE vec_id % 97 = 0")
      .createOrReplaceTempView("knn_queries_v")
    val viaView = spark.sql(
      "SELECT * FROM knn_join('knn_queries_v', 'embeddings', " +
        "'vec_id', 'embedding', 5)").collect().map(_.toSeq).toSet
    val viaTable = SparkEntry.queries("sql_knn")(spark, d)
      .collect().map(_.toSeq).toSet
    assert(viaView.nonEmpty && viaView == viaTable)
    spark.catalog.dropTempView("knn_queries_v")
  }

  test("knn_join rejects bad arguments loudly at resolution time") {
    graft.GraftSql.attach(spark, d)
    val eK = intercept[Exception] {
      spark.sql("SELECT * FROM knn_join('embeddings', 'embeddings', " +
        "'vec_id', 'embedding', 5000)").collect()
    }
    assert(eK.getMessage.contains("WindowGroupLimit"), eK.getMessage)
    val eCol = intercept[Exception] {
      spark.sql("SELECT * FROM knn_join('embeddings', 'embeddings', " +
        "'nope', 'embedding', 5)").collect()
    }
    assert(eCol.getMessage.contains("not found"), eCol.getMessage)
    val eVec = intercept[Exception] {
      spark.sql("SELECT * FROM knn_join('embeddings', 'embeddings', " +
        "'vec_id', 'label', 5)").collect()
    }
    assert(eVec.getMessage.contains("array"), eVec.getMessage)
    val eArity = intercept[Exception] {
      spark.sql("SELECT * FROM knn_join('embeddings', 'embeddings', " +
        "'vec_id', 'embedding')").collect()
    }
    assert(eArity.getMessage.contains("5 arguments"), eArity.getMessage)
  }
}
