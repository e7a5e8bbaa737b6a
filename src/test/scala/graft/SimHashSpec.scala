package graft

import org.apache.spark.sql.functions._

import graft.ext.DedupOps
import graft.functions.SimHash32

/** The native codegen'd SimHash expression: bit-equality with the
  * declarative (built-ins-only) form it replaced, and codegen vs
  * interpreted agreement. */
class SimHashSpec extends SparkSpec {
  import spark.implicits._

  test("native simhash32 equals the declarative 32-pass form on real docs") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val native = DedupOps.simhash(docs)
    val declarative = DedupOps.simhashDeclarative(docs)
    val diff = native.withColumnRenamed("simhash32", "a")
      .join(declarative.withColumnRenamed("simhash32", "b"), Seq("doc_id"))
      .filter(col("a") =!= col("b"))
    assert(diff.isEmpty)
  }

  test("native simhash32 equals the declarative form on adversarial strings") {
    // repeated tokens (distinctness), double spaces (empty tokens),
    // trailing space (split limit -1), single token, unicode
    val docs = Seq(
      (1L, "the the the fox"),
      (2L, "a  b"),
      (3L, "trailing space "),
      (4L, "single"),
      (5L, "héllo wörld héllo"))
      .toDF("doc_id", "text")
    val native = DedupOps.simhash(docs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val declarative = DedupOps.simhashDeclarative(docs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(native == declarative)
  }

  test("codegen and interpreted eval agree") {
    val s = org.apache.spark.unsafe.types.UTF8String.fromString(
      "a document with some repeated words a document")
    val interp = SimHash32(
      org.apache.spark.sql.catalyst.expressions.Literal(s)).eval(null)
    SimHash32.register(spark)
    val gen = Seq(s.toString).toDF("s")
      .withColumn("h", expr("simhash32(s)")).head.getLong(1)
    assert(interp == gen)
  }
}
