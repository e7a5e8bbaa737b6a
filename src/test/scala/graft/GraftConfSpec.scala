package graft

/** Eager conf validation ([[GraftConf.validate]]) — the init-time
  * fail-fast mirroring the reference's config check (index.js:662-665):
  * a malformed `--conf` must throw at session init, naming the key,
  * never mid-query. */
class GraftConfSpec extends SparkSpec {

  private def withConf(kvs: (String, String)*)(body: => Unit): Unit = {
    try { kvs.foreach { case (k, v) => spark.conf.set(k, v) }; body }
    finally kvs.foreach { case (k, _) => spark.conf.unset(k) }
  }

  test("default confs validate cleanly") {
    GraftConf.validate(spark)
  }

  test("a non-numeric threshold fails at init, naming the key") {
    withConf(GraftConf.NearDupThresholdKey -> "very-similar") {
      val e = intercept[IllegalArgumentException](GraftConf.validate(spark))
      assert(e.getMessage.contains(GraftConf.NearDupThresholdKey))
      assert(e.getMessage.contains("very-similar"))
    }
  }

  test("an out-of-range threshold fails at init") {
    withConf(GraftConf.CosineThresholdKey -> "1.7") {
      val e = intercept[IllegalArgumentException](GraftConf.validate(spark))
      assert(e.getMessage.contains("[0, 1]"))
    }
  }

  test("a non-integer minMatches fails at init") {
    withConf(GraftConf.MinMatchesKey -> "two") {
      val e = intercept[IllegalArgumentException](GraftConf.validate(spark))
      assert(e.getMessage.contains(GraftConf.MinMatchesKey))
    }
  }

  test("a full address in the deny-DOMAIN list validates (matching is substring containment)") {
    // Rules.denyListed matches domains by email.contains(entry), so a
    // full address entry is legal and blocks exactly that address
    withConf(GraftConf.DenyDomainsKey -> "example.com,bob@spam.net") {
      GraftConf.validate(spark)
    }
  }

  test("uppercase / whitespace deny entries fail at init") {
    withConf(GraftConf.DenyDomainsKey -> "Example.com") {
      intercept[IllegalArgumentException](GraftConf.validate(spark))
    }
    withConf(GraftConf.DenyPrefixesKey -> "no reply@") {
      intercept[IllegalArgumentException](GraftConf.validate(spark))
    }
  }

  test("a tuned-but-well-formed deployment validates") {
    withConf(
      GraftConf.MinMatchesKey -> "3",
      GraftConf.QualityThresholdKey -> "0.8",
      GraftConf.DenyDomainsKey -> "spam.net,junk.org",
      GraftConf.DenyPrefixesKey -> "noreply@,bot-") {
      GraftConf.validate(spark)
    }
  }
}
