package graft

import graft.ext.TextOps

/** The dsir_sample TVF: SQL-composable importance resampling. Pins
  * the engine/SQL equivalence, TABLE(subquery) composition, and the
  * loud-rejection validation surface. */
class DsirSqlSpec extends SparkSpec {

  private val d = "/root/testdata/sf0.001"

  test("dsir_sample TVF is row-identical to the engine call") {
    val rows = SparkEntry.queries("sql_dsir")(spark, d).collect()
    assert(rows.nonEmpty)
    val viaDf = TextOps.dsirResample(
      Tables.documents(spark, d), Seq("src0", "src1"), k = 200)
    assert(rows.map(_.toSeq).toSeq == viaDf.collect().map(_.toSeq).toSeq)
    // no target-source doc ever appears in the sample
    assert(rows.forall(r => !Set("src0", "src1")(r.getAs[String]("source"))))
  }

  test("dsir_sample composes over TABLE(subquery)") {
    import spark.implicits._
    graft.GraftSql.attach(spark, d)
    val viaTvf = spark.sql(
      "SELECT * FROM dsir_sample(TABLE(SELECT * FROM documents " +
        "WHERE lang = 'en'), 'src0', 50)").collect().map(_.toSeq).toSeq
    val viaDf = TextOps.dsirResample(
      Tables.documents(spark, d).filter($"lang" === "en"),
      Seq("src0"), k = 50).collect().map(_.toSeq).toSeq
    assert(viaTvf == viaDf && viaTvf.nonEmpty)
  }

  test("dsir_sample rejects bad arguments loudly at resolution time") {
    graft.GraftSql.attach(spark, d)
    val eK = intercept[Exception] {
      spark.sql(
        "SELECT * FROM dsir_sample('documents', 'src0', 1000000)").collect()
    }
    assert(eK.getMessage.contains("TakeOrdered"), eK.getMessage)
    val eT = intercept[Exception] {
      spark.sql(
        "SELECT * FROM dsir_sample('documents', ' , ', 10)").collect()
    }
    assert(eT.getMessage.contains("at least one source"), eT.getMessage)
    val eCol = intercept[Exception] {
      spark.sql(
        "SELECT * FROM dsir_sample('embeddings', 'src0', 10)").collect()
    }
    assert(eCol.getMessage.contains("not found"), eCol.getMessage)
    val eArity = intercept[Exception] {
      spark.sql("SELECT * FROM dsir_sample('documents', 'src0')").collect()
    }
    assert(eArity.getMessage.contains("3 arguments"), eArity.getMessage)
    // a BIGINT k beyond Int.MaxValue must be rejected on its REAL
    // value, not silently wrapped by toInt into an in-range one
    // (4294967297 ≡ 1 mod 2³²)
    val eWrap = intercept[Exception] {
      spark.sql(
        "SELECT * FROM dsir_sample('documents', 'src0', 4294967297)").collect()
    }
    assert(eWrap.getMessage.contains("4294967297"), eWrap.getMessage)
  }

  test("dsir_sample resolves columns case-insensitively, like SQL") {
    import spark.implicits._
    graft.GraftSql.attach(spark, d)
    // upper-cased column NAMES in the table resolve for the TVF's
    // fixed (doc_id, source, text) contract exactly where a plain
    // SQL reference would
    spark.sql("SELECT doc_id AS DOC_ID, source AS Source, text AS TEXT " +
      "FROM documents").createOrReplaceTempView("upper_docs_v")
    val viaUpper = spark.sql(
      "SELECT * FROM dsir_sample('upper_docs_v', 'src0', 50)")
      .collect().map(_.toSeq).toSeq
    val viaDf = TextOps.dsirResample(
      Tables.documents(spark, d), Seq("src0"), k = 50)
      .collect().map(_.toSeq).toSeq
    assert(viaUpper == viaDf && viaUpper.nonEmpty)
    spark.catalog.dropTempView("upper_docs_v")
  }
}
