package graft

import graft.ext.TextOps

/** The dup_spans / dedup_excise TVFs: SQL-composable unbounded
  * exact-substring dedup. Pins the engine/SQL equivalence (both
  * spellings), TABLE(subquery) + column-rename composition, and the
  * loud-rejection validation surface (shared decode). */
class DupSpansSqlSpec extends SparkSpec {

  private val d = "/root/testdata/sf0.001"

  test("dup_spans TVF is row-identical to the engine call") {
    val rows = SparkEntry.queries("sql_dup_spans")(spark, d)
      .collect().map(_.toSeq).toSet
    val viaDf = TextOps.maximalDupSpans(Tables.documents(spark, d))
      .collect().map(_.toSeq).toSet
    assert(rows == viaDf && rows.nonEmpty)
  }

  test("dup_islands TVF is row-identical to the engine call") {
    val rows = SparkEntry.queries("sql_dup_islands")(spark, d)
      .collect().map(_.toSeq).toSet
    val viaDf = TextOps.maximalDupIslands(Tables.documents(spark, d))
      .collect().map(_.toSeq).toSet
    assert(rows == viaDf && rows.nonEmpty)
  }

  test("dedup_excise TVF is row-identical to the engine call") {
    val rows = SparkEntry.queries("sql_excise")(spark, d)
      .collect().map(_.toSeq).toSet
    val viaDf = TextOps.dedupExcise(Tables.documents(spark, d))
      .collect().map(_.toSeq).toSet
    assert(rows == viaDf && rows.nonEmpty)
  }

  test("dup_spans composes over TABLE(subquery) with renamed columns") {
    graft.GraftSql.attach(spark, d)
    val viaTvf = spark.sql(
      "SELECT * FROM dup_spans(TABLE(SELECT doc_id AS id, text AS body " +
        "FROM documents WHERE doc_id < 300), 'id', 'body', 6, 32)")
      .collect().map(_.toSeq).toSet
    val sub = Tables.documents(spark, d).filter("doc_id < 300")
      .select("doc_id", "text")
    val viaDf = TextOps.maximalDupSpans(sub, w = 6, occCap = 32)
      .collect().map(_.toSeq).toSet
    assert(viaTvf == viaDf && viaTvf.nonEmpty)
  }

  test("both spellings reject bad arguments loudly at resolution time") {
    graft.GraftSql.attach(spark, d)
    val eW = intercept[Exception] {
      spark.sql(
        "SELECT * FROM dup_spans('documents', 'doc_id', 'text', 1, 64)")
        .collect()
    }
    assert(eW.getMessage.contains("[2, 4096]"), eW.getMessage)
    // a BIGINT literal beyond Int range is rejected on its REAL value
    // (never wrapped in-range by toInt) — the DsirSql rule
    val eWrap = intercept[Exception] {
      spark.sql("SELECT * FROM dedup_excise('documents', 'doc_id', " +
        "'text', 8, 4294967296)").collect()
    }
    assert(eWrap.getMessage.contains("4294967296"), eWrap.getMessage)
    val eCap = intercept[Exception] {
      spark.sql("SELECT * FROM dedup_excise('documents', 'doc_id', " +
        "'text', 8, 1)").collect()
    }
    assert(eCap.getMessage.contains("occ_cap"), eCap.getMessage)
    val eCol = intercept[Exception] {
      spark.sql("SELECT * FROM dup_spans('documents', 'doc_id', " +
        "'nope', 8, 64)").collect()
    }
    assert(eCol.getMessage.contains("not found"), eCol.getMessage)
    val eType = intercept[Exception] {
      spark.sql("SELECT * FROM dup_spans('documents', 'text', " +
        "'doc_id', 8, 64)").collect()
    }
    assert(eType.getMessage.contains("must be string"), eType.getMessage)
    val eArity = intercept[Exception] {
      spark.sql("SELECT * FROM dup_spans('documents', 'doc_id', 8, 64)")
        .collect()
    }
    assert(eArity.getMessage.contains("5 arguments"), eArity.getMessage)
    // the table arg resolves case-insensitively like a plain reference
    val viaCase = spark.sql(
      "SELECT * FROM dup_spans('documents', 'DOC_ID', 'TEXT', 8, 64)")
      .collect().map(_.toSeq).toSet
    val viaDf = TextOps.maximalDupSpans(Tables.documents(spark, d))
      .collect().map(_.toSeq).toSet
    assert(viaCase == viaDf)
  }
}
