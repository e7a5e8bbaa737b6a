package graft

import java.nio.file.Files

import graft.ext.{CentroidStore, EmbedOps}

/** The centroid_assign TVF: SQL-composable frozen-geometry assignment
  * off a persisted CentroidStore. Pins the engine/SQL equivalence,
  * TABLE(subquery) composition, and the loud-rejection surface
  * (missing store, bad args). */
class CentroidAssignSqlSpec extends SparkSpec {
  import spark.implicits._

  private def freshStore(tag: String): String = {
    val dir = Files.createTempDirectory(s"graft_casql_$tag").toString + "/c"
    val training = (0 until 12).map { i =>
      val base = if (i % 2 == 0) Array(1.0f, 0.0f, 1.0f, 0.0f)
      else Array(0.0f, 1.0f, 0.0f, -1.0f)
      (100L + i, base.map(_ + i * 0.001f))
    }.toDF("vec_id", "embedding")
    CentroidStore.build(training, dir)
    dir
  }

  test("centroid_assign TVF is row-identical to assignAgainst over the loaded store") {
    val store = freshStore("parity")
    graft.GraftSql.attach(spark, "/root/testdata/sf0.001")
    val vecs = Seq(
      (1L, Array(1.0f, 0.0f, 1.0f, 0.0f)),
      (2L, Array(0.99f, 0.0f, 1.01f, 0.0f)),
      (3L, Array(0.0f, 1.0f, 0.0f, -1.0f))).toDF("vec_id", "embedding")
    vecs.createOrReplaceTempView("new_vectors")
    val viaTvf = spark.sql(
      s"SELECT * FROM centroid_assign('$store', 'new_vectors')")
      .collect().map(_.toSeq).toSet
    val viaDf = EmbedOps.assignAgainst(
        vecs, CentroidStore.centroids(spark, store))
      .collect().map(_.toSeq).toSet
    assert(viaTvf == viaDf && viaTvf.size == 3)
    // composes over TABLE(subquery) with renamed columns resolved
    // case-insensitively
    val viaSub = spark.sql(
      s"SELECT * FROM centroid_assign('$store', " +
        "TABLE(SELECT vec_id AS VEC_ID, embedding FROM new_vectors " +
        "WHERE vec_id < 3))")
      .collect().map(_.toSeq).toSet
    assert(viaSub == viaDf.filter(_.head.asInstanceOf[Long] < 3L) &&
      viaSub.size == 2)
  }

  test("centroid_assign rejects bad arguments loudly at resolution time") {
    graft.GraftSql.attach(spark, "/root/testdata/sf0.001")
    // a missing store errors at resolution, naming the dir
    val eStore = intercept[Exception] {
      spark.sql(
        "SELECT * FROM centroid_assign('/nonexistent/store', 'embeddings')")
        .collect()
    }
    assert(eStore.getMessage.contains("/nonexistent/store"),
      eStore.getMessage)
    val store = freshStore("reject")
    val eDir = intercept[Exception] {
      spark.sql(s"SELECT * FROM centroid_assign(42, 'embeddings')")
        .collect()
    }
    assert(eDir.getMessage.contains("string literal"), eDir.getMessage)
    val eCol = intercept[Exception] {
      spark.sql(s"SELECT * FROM centroid_assign('$store', 'documents')")
        .collect()
    }
    assert(eCol.getMessage.contains("not found"), eCol.getMessage)
    val eArity = intercept[Exception] {
      spark.sql(s"SELECT * FROM centroid_assign('$store')").collect()
    }
    assert(eArity.getMessage.contains("2 arguments"), eArity.getMessage)
  }
}
