package graft

import graft.ext.EmbedOps

/** The semdedup TVF: SQL-composable semantic dedup. Pins the
  * engine/SQL equivalence, TABLE(subquery) composition, and the
  * loud-rejection validation surface. */
class SemDedupSqlSpec extends SparkSpec {

  private val d = "/root/testdata/sf0.001"
  private val thr = GraftConf.DefaultCosineThreshold

  test("semdedup TVF is row-identical to the engine call") {
    val rows = SparkEntry.queries("sql_semdedup")(spark, d)
      .collect().map(_.toSeq).toSet
    assert(rows.nonEmpty)
    val emb = Tables.embeddings(spark, d)
    val viaDf = EmbedOps.semDedupFrom(
        emb, EmbedOps.kmeansAssignments(emb, 8), thr)
      .collect().map(_.toSeq).toSet
    assert(rows == viaDf)
    // exactly one keeper per group
    val byGroup = rows.groupBy(_(2))
    assert(byGroup.values.forall(g => g.count(_(4) == true) == 1))
  }

  test("semdedup composes over TABLE(subquery)") {
    graft.GraftSql.attach(spark, d)
    val viaTvf = spark.sql(
      s"SELECT * FROM semdedup(TABLE(SELECT vec_id, embedding " +
        s"FROM embeddings WHERE vec_id < 300), 8, $thr)")
      .collect().map(_.toSeq).toSet
    val sub = Tables.embeddings(spark, d).filter("vec_id < 300")
      .select("vec_id", "embedding")
    val viaDf = EmbedOps.semDedupFrom(
        sub, EmbedOps.kmeansAssignments(sub, 8), thr)
      .collect().map(_.toSeq).toSet
    assert(viaTvf == viaDf && viaTvf.nonEmpty)
  }

  test("semdedup rejects bad arguments loudly at resolution time") {
    graft.GraftSql.attach(spark, d)
    val eK = intercept[Exception] {
      spark.sql("SELECT * FROM semdedup('embeddings', 0, 0.9)").collect()
    }
    assert(eK.getMessage.contains("[1, 1048576]"), eK.getMessage)
    // a BIGINT k beyond Int range must be rejected on its REAL value
    val eWrap = intercept[Exception] {
      spark.sql(
        "SELECT * FROM semdedup('embeddings', 4294967297, 0.9)").collect()
    }
    assert(eWrap.getMessage.contains("4294967297"), eWrap.getMessage)
    val eThr = intercept[Exception] {
      spark.sql("SELECT * FROM semdedup('embeddings', 8, 0.1)").collect()
    }
    assert(eThr.getMessage.contains("[0.3, 1.0]"), eThr.getMessage)
    val eCol = intercept[Exception] {
      spark.sql("SELECT * FROM semdedup('documents', 8, 0.9)").collect()
    }
    assert(eCol.getMessage.contains("not found"), eCol.getMessage)
    val eArity = intercept[Exception] {
      spark.sql("SELECT * FROM semdedup('embeddings', 8)").collect()
    }
    assert(eArity.getMessage.contains("3 arguments"), eArity.getMessage)
  }
}
