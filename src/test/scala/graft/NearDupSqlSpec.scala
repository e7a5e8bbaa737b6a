package graft

import graft.ext.DedupOps

/** The neardup_pairs TVF: SQL-composable MinHash-LSH dedup. Pins the
  * engine/SQL equivalence, TABLE(subquery) composition, renamed-column
  * handling, and the loud-rejection validation surface. */
class NearDupSqlSpec extends SparkSpec {

  private val d = "/root/testdata/sf0.001"

  test("neardup_pairs TVF is row-identical to the engine call") {
    val df = SparkEntry.queries("sql_neardup")(spark, d)
    val rows = df.collect()
    assert(rows.nonEmpty)
    val viaDf = DedupOps.minhashNearDups(Tables.documents(spark, d), 0.5)
    assert(rows.map(_.toSeq).toSet == viaDf.collect().map(_.toSeq).toSet)
    // every verified pair is at or above the threshold, ordered a < b
    rows.foreach { r =>
      assert(r.getLong(0) < r.getLong(1), r)
      assert(r.getDouble(2) >= 0.5, r)
    }
  }

  test("neardup_pairs composes: TABLE(subquery) filter and renamed columns work") {
    import spark.implicits._
    graft.GraftSql.attach(spark, d)
    // subset via TABLE(subquery) ≡ engine call on the same subset
    val viaTvf = spark.sql(
      "SELECT * FROM neardup_pairs(TABLE(SELECT * FROM documents " +
        "WHERE lang = 'en'), 'doc_id', 'text', 0.5)")
      .collect().map(_.toSeq).toSet
    val viaDf = DedupOps.minhashNearDups(
      Tables.documents(spark, d).filter($"lang" === "en"), 0.5)
      .collect().map(_.toSeq).toSet
    assert(viaTvf == viaDf)
    // arbitrary column names resolve through the rename shim
    val rich = "the quick brown fox jumps over a lazy dog and then " +
      "the fox runs far away to a quiet den where it rests until dawn"
    Seq((1L, rich), (2L, rich.replace("dawn", "dusk")), (3L, "unrelated short"))
      .toDF("item_id", "body").createOrReplaceTempView("renamed_docs_v")
    val got = spark.sql(
      "SELECT * FROM neardup_pairs('renamed_docs_v', 'item_id', 'body', 0.5)")
      .collect()
    assert(got.map(r => (r.getLong(0), r.getLong(1))).toSet == Set((1L, 2L)))
    spark.catalog.dropTempView("renamed_docs_v")
  }

  test("neardup_pairs rejects bad arguments loudly at resolution time") {
    graft.GraftSql.attach(spark, d)
    val eThr = intercept[Exception] {
      spark.sql("SELECT * FROM neardup_pairs('documents', 'doc_id', " +
        "'text', 0.1)").collect()
    }
    assert(eThr.getMessage.contains("recall"), eThr.getMessage)
    val eCol = intercept[Exception] {
      spark.sql("SELECT * FROM neardup_pairs('documents', 'nope', " +
        "'text', 0.5)").collect()
    }
    assert(eCol.getMessage.contains("not found"), eCol.getMessage)
    val eType = intercept[Exception] {
      spark.sql("SELECT * FROM neardup_pairs('documents', 'doc_id', " +
        "'n_chars', 0.5)").collect()
    }
    assert(eType.getMessage.contains("string"), eType.getMessage)
    val eArity = intercept[Exception] {
      spark.sql("SELECT * FROM neardup_pairs('documents', 'doc_id', " +
        "'text')").collect()
    }
    assert(eArity.getMessage.contains("4 arguments"), eArity.getMessage)
    val eSame = intercept[Exception] {
      spark.sql("SELECT * FROM neardup_pairs('documents', 'text', " +
        "'text', 0.5)").collect()
    }
    assert(eSame.getMessage.contains("differ"), eSame.getMessage)
  }

  test("neardup_pairs resolves column arguments case-insensitively, like SQL") {
    graft.GraftSql.attach(spark, d)
    // 'DOC_ID'/'TEXT' must resolve against doc_id/text exactly where a
    // plain SQL reference would (analyzer resolver, not a
    // case-sensitive columns.contains)
    val viaUpper = spark.sql(
      "SELECT * FROM neardup_pairs('documents', 'DOC_ID', 'TEXT', 0.5)")
      .collect().map(_.toSeq).toSet
    val viaExact = spark.sql(
      "SELECT * FROM neardup_pairs('documents', 'doc_id', 'text', 0.5)")
      .collect().map(_.toSeq).toSet
    assert(viaUpper == viaExact && viaUpper.nonEmpty)
    // ambiguity under the resolver is rejected loudly
    spark.sql("SELECT doc_id, text, text AS TEXT FROM documents")
      .createOrReplaceTempView("ambig_docs_v")
    val eAmbig = intercept[Exception] {
      spark.sql(
        "SELECT * FROM neardup_pairs('ambig_docs_v', 'doc_id', 'Text', 0.5)")
        .collect()
    }
    assert(eAmbig.getMessage.contains("ambiguous"), eAmbig.getMessage)
    spark.catalog.dropTempView("ambig_docs_v")
  }
}
