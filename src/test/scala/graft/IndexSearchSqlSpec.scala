package graft

import java.nio.file.Files

import graft.ext.EmbedIndex

/** The index_search TVF: SQL access to the persisted IVF-PQ index.
  * Pins the engine/SQL equivalence (search through the TVF ==
  * EmbedIndex.search on the same committed store) and the
  * loud-rejection validation surface, including the missing-store
  * resolution-time error. */
class IndexSearchSqlSpec extends SparkSpec {

  private val d = "/root/testdata/sf0.001"

  private def builtIndex(tag: String): String = {
    val dir = Files.createTempDirectory(s"graft_idx_sql_$tag").toString + "/ix"
    EmbedIndex.build(Tables.embeddings(spark, d), dir)
    dir
  }

  test("index_search TVF is row-identical to EmbedIndex.search on the same store") {
    graft.GraftSql.attach(spark, d)
    val dir = builtIndex("parity")
    val viaTvf = spark.sql(
      s"SELECT * FROM index_search('$dir', TABLE(SELECT vec_id, " +
        "embedding FROM embeddings WHERE vec_id % 97 = 0), 5, 2)")
      .collect().map(_.toSeq).toSet
    val viaEngine = EmbedIndex.search(spark, dir,
      Tables.embeddings(spark, d).filter("vec_id % 97 = 0")
        .select("vec_id", "embedding"), k = 5, nprobe = 2)
      .collect().map(_.toSeq).toSet
    assert(viaTvf == viaEngine && viaTvf.nonEmpty)
  }

  test("index_search rejects bad arguments loudly at resolution time") {
    graft.GraftSql.attach(spark, d)
    val dir = builtIndex("rej")
    // a missing store errors at RESOLUTION, naming the dir
    val eDir = intercept[Exception] {
      spark.sql("SELECT * FROM index_search('/nonexistent/store', " +
        "TABLE(SELECT vec_id, embedding FROM embeddings), 5, 2)").collect()
    }
    assert(eDir.getMessage.contains("/nonexistent/store"), eDir.getMessage)
    val eK = intercept[Exception] {
      spark.sql(s"SELECT * FROM index_search('$dir', " +
        "TABLE(SELECT vec_id, embedding FROM embeddings), 0, 2)").collect()
    }
    assert(eK.getMessage.contains("[1, 1000]"), eK.getMessage)
    // Long-wrap guard: 4294967297 rejected on its real value
    val eWrap = intercept[Exception] {
      spark.sql(s"SELECT * FROM index_search('$dir', " +
        "TABLE(SELECT vec_id, embedding FROM embeddings), 4294967297, 2)")
        .collect()
    }
    assert(eWrap.getMessage.contains("4294967297"), eWrap.getMessage)
    val eProbe = intercept[Exception] {
      spark.sql(s"SELECT * FROM index_search('$dir', " +
        "TABLE(SELECT vec_id, embedding FROM embeddings), 5, 0)").collect()
    }
    assert(eProbe.getMessage.contains("[1, 64]"), eProbe.getMessage)
    val eCol = intercept[Exception] {
      spark.sql(s"SELECT * FROM index_search('$dir', " +
        "TABLE(SELECT doc_id, text FROM documents), 5, 2)").collect()
    }
    assert(eCol.getMessage.contains("not found"), eCol.getMessage)
    val eArity = intercept[Exception] {
      spark.sql(s"SELECT * FROM index_search('$dir', " +
        "TABLE(SELECT vec_id, embedding FROM embeddings), 5)").collect()
    }
    assert(eArity.getMessage.contains("4 arguments"), eArity.getMessage)
  }
}
