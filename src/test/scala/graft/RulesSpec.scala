package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.rules.Rules

/** Unit coverage of the rule predicates against the reference's cited
  * behavior (file:line refs in Rules.scala). */
class RulesSpec extends SparkSpec {

  private def evalBool(c: org.apache.spark.sql.Column): Any =
    spark.range(1).select(c.as("v")).head.get(0)

  test("email regex accepts plain addresses, rejects spaces and missing parts") {
    assert(evalBool(Rules.isValidEmail(lit("a@b.co"))) == true)
    assert(evalBool(Rules.isValidEmail(lit("bad email@x.com"))) == false)
    assert(evalBool(Rules.isValidEmail(lit("nodomain@"))) == false)
    assert(evalBool(Rules.isValidEmail(lit("noat.example.com"))) == false)
    assert(evalBool(Rules.isValidEmail(lit(null).cast("string"))) == false)
  }

  test("deny list: example.com / test.com substrings and unknown@ prefix") {
    assert(evalBool(Rules.denyListed(lit("x@example.com"))) == true)
    assert(evalBool(Rules.denyListed(lit("x@test.com"))) == true)
    assert(evalBool(Rules.denyListed(lit("unknown@hapzea.com"))) == true)
    assert(evalBool(Rules.denyListed(lit("guest@hapzea.com"))) == false)
    // substring (not suffix) semantics, like the reference's includes()
    assert(evalBool(Rules.denyListed(lit("x@example.com.org"))) == true)
  }

  test("asciiLower lowercases A-Z only") {
    assert(evalBool(Rules.asciiLower(lit("Guest5@Hapzea.COM"))) ==
      "guest5@hapzea.com")
  }

  test("alreadySentNew: sent status or boolean flag") {
    assert(evalBool(Rules.alreadySentNew(lit("sent"), lit(false))) == true)
    assert(evalBool(Rules.alreadySentNew(lit("pending"), lit(true))) == true)
    assert(evalBool(
      coalesce(Rules.alreadySentNew(lit(null).cast("string"), lit(false)),
        lit(false))) == false)
  }

  test("priority and delay boundaries at totalMatches = 10") {
    import graft.pipeline.EmailJobs
    val r = spark.range(1).select(
      EmailJobs.priority(lit(9)).as("p9"),
      EmailJobs.priority(lit(10)).as("p10"),
      EmailJobs.delaySeconds(lit(9)).as("d9"),
      EmailJobs.delaySeconds(lit(10)).as("d10")).head
    assert(r == Row("normal", "high", 5, 0))
  }
}
