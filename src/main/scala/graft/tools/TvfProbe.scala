package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev probe: what does Spark 4.1's parser hand a registry TVF for a
  * TABLE(...) / subquery argument? Determines whether asof_join can
  * accept inline subqueries or whether temp views remain the
  * composability boundary. */
object TvfProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (sql <- Seq(
      "SELECT * FROM asof_join(TABLE(SELECT 1 AS x), 'r', 'k', 'ts', 'rts')",
      "SELECT * FROM asof_join((SELECT 1 AS x), 'r', 'k', 'ts', 'rts')")) {
      println(s"--- $sql")
      try println(spark.sessionState.sqlParser.parsePlan(sql).treeString)
      catch { case e: Exception => println(s"PARSE FAIL: ${e.getMessage.take(300)}") }
    }
    // does RESOLUTION reach the registry builder with the table arg?
    graft.GraftSql.attach(spark, "/root/testdata/sf0.001")
    val q = "SELECT * FROM asof_join(" +
      "TABLE(SELECT * FROM purchases_v WHERE user_id % 3 = 0), " +
      "'clicks_v', 'user_id', 'ts', 'c_ts')"
    try {
      val n = spark.sql(q).count()
      println(s"RESOLVED AND RAN: $n rows")
    } catch { case e: Exception =>
      println(s"RESOLVE FAIL: ${e.getClass.getSimpleName}: " +
        e.getMessage.take(500))
    }
    spark.stop()
  }
}
