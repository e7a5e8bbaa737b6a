package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.decode.DynamoDecode
import graft.pipeline.MatchFixture

/** The full AttributeValue type surface (r19 extension): per-tag
  * combinators for all nine standard DynamoDB wire tags, null/absence
  * discipline, nesting, and the oracle-gated demo projection. The
  * reference reads only S/N/BOOL (index.js:350-385); these generalize
  * its decode to the schema evolutions a real CDC user makes first. */
class DynamoDecodeSpec extends SparkSpec {
  import spark.implicits._

  private def attrRow(k: Long) =
    MatchFixture.attrItems(Seq(k).toDF("c_custkey"))

  test("every tag decodes: S, N, BOOL, NULL, B, SS, NS, BS, L, M, and the L-of-M-of-N nesting") {
    val out = DynamoDecode.decodeAttrItems(attrRow(11L)).collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getAs[String]("rid") == "a11")
    assert(r.getAs[String]("name_s") == "guest 11")     // S (11%9=2: present)
    assert(r.getAs[Int]("age_n") == 18 + 11)            // N → int
    assert(!r.getAs[Boolean]("vip_b"))                  // BOOL (11%3 != 0)
    assert(!r.getAs[Boolean]("note_isnull"))            // no typed NULL (11%7=4)
    // B: base64 round-trip — md5 of the decoded bytes equals md5 of
    // the original string content
    assert(r.getAs[String]("avatar_md5") ==
      java.security.MessageDigest.getInstance("MD5")
        .digest("av11".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString)
    assert(r.getAs[Int]("avatar_len") == 4)
    assert(r.getAs[String]("tags_cat") == "t1,u4")      // SS sorted
    assert(r.getAs[Int]("scores_sum") == 11 % 10 + 11 % 13 + 11 % 17) // NS
    assert(r.getAs[Int]("gallery_n") == 3)              // L (11%4)
    assert(r.getAs[String]("gallery_first") == "g/11/1")
    assert(r.getAs[String]("city_s") == "c11")          // M → S
    assert(r.getAs[Int]("zip_n") == 10011)              // M → N
    assert(r.getAs[Int]("nested_sum") ==                // L of M of N
      (11 % 7) + (22 % 7))
  }

  test("absence discipline: an absent attribute defaults; a typed NULL reads as null, not absent") {
    val absent = DynamoDecode.decodeAttrItems(attrRow(4L)).head() // 4%9=4
    assert(absent.getAs[String]("name_s") == "absent")
    val nulled = DynamoDecode.decodeAttrItems(attrRow(9L)).head() // 9%7=2
    assert(nulled.getAs[Boolean]("note_isnull"))
    val plain = DynamoDecode.decodeAttrItems(attrRow(13L)).head()
    assert(!plain.getAs[Boolean]("note_isnull"))
    // empty L decodes to an empty array, not null (4%4=0)
    assert(absent.getAs[Int]("gallery_n") == 0)
    assert(absent.getAs[String]("gallery_first") == "none")
  }

  test("combinators are null-safe on a wholly absent item (optional-chaining discipline)") {
    val df = Seq(Tuple1(Option.empty[Long])).toDF("x")
      .select(lit(null).cast(
        MatchFixture.attrItems(Seq(1L).toDF("c_custkey"))
          .schema("item").dataType).as("item"),
        lit("a0").as("rid"))
    val r = DynamoDecode.decodeAttrItems(df).head()
    assert(r.getAs[String]("name_s") == "absent")
    assert(r.getAs[Int]("age_n") == 0)
    assert(!r.getAs[Boolean]("vip_b"))
    assert(!r.getAs[Boolean]("note_isnull"))
    assert(r.getAs[String]("avatar_md5") == null)
    assert(r.getAs[String]("gallery_first") == "none")
    assert(r.getAs[Int]("zip_n") == 0)
  }

  test("binary set decodes element-wise through base64 (BS)") {
    val r = DynamoDecode.decodeAttrItems(attrRow(7L)).head()
    assert(r.getAs[String]("blobs_md5") ==
      java.security.MessageDigest.getInstance("MD5")
        .digest("p7q7".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString)
  }

  test("the decode plan stays codegen'd column ops: no UDFs, no shuffles") {
    val plan = DynamoDecode.decodeAttrItems(
      MatchFixture.attrItems(Seq(1L, 2L).toDF("c_custkey")))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
    assert(!plan.contains("BatchEvalPython") && !plan.contains("ScalaUDF"),
      plan)
  }
}
