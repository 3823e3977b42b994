package graft

import graft.operators.Domains
import graft.plans.SortSegments
import org.apache.spark.sql.functions._

/** Native one-pass segment sort ≡ the HOF formulation
  * `array_join(array_sort(filter(split(q, sep), x =!= "")), sep)`,
  * across separators, empties, unicode (bytewise order!), duplicate
  * params, and both codegen modes — plus the urlCanonicalize swap-in.
  */
class SortSegmentsSpec extends SparkSpec {
  import spark.implicits._

  private def witness(texts: Seq[String], sep: String,
                      dropEmpty: Boolean): Seq[String] = {
    val q = java.util.regex.Pattern.quote(sep)
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "text")
    val parts0 = split(col("text"), q, -1)
    val parts = if (dropEmpty) filter(parts0, x => x =!= "") else parts0
    df.select(col("id"), array_join(array_sort(parts), sep).as("s"))
      .orderBy("id").collect().map(_.getString(1)).toSeq
  }

  private def native(texts: Seq[String], sep: String,
                     dropEmpty: Boolean): Seq[String] = {
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "text")
    df.select(col("id"),
        SortSegments.sorted(col("text"), sep, dropEmpty).as("s"))
      .orderBy("id").collect().map(_.getString(1)).toSeq
  }

  private def compare(texts: Seq[String], sep: String,
                      dropEmpty: Boolean = true): Unit =
    assert(native(texts, sep, dropEmpty) == witness(texts, sep, dropEmpty),
      s"sep='$sep' dropEmpty=$dropEmpty")

  test("hand-picked edges ≡ witness: params, empties, dups, unicode order") {
    val cases = Seq(
      "b=1&a=2",                  // plain out-of-order
      "a=2&b=1",                  // already sorted → fast path
      "b=1&&a=2&",                // empty params dropped
      "&&&",                      // all empty
      "",                         // empty query
      "only=1",
      "a=1&a=1&a=0",              // duplicates kept, sorted
      "z=%C3%A9&a=1",             // percent-encoded
      "é=1&e=2",                  // multi-byte é (0xC3A9) sorts AFTER e
      "😀=1&z=2",                 // supplementary char: bytewise = code-point order
      "B=1&a=2")                  // capitals sort before lowercase bytewise
    compare(cases, "&")
    compare(cases, "&", dropEmpty = false)
    // multi-byte separator
    compare(Seq("x||y||a", "||b||||a", "a||", ""), "||")
    compare(Seq("x||y||a", "||b||||a", "a||", ""), "||", dropEmpty = false)
  }

  test("property: 300 random param soups ≡ witness") {
    val rnd = new scala.util.Random(42L)
    val atoms = Vector("a=1", "b=2", "zz=9", "", "k", "é=x", "a=1",
      "utm_source=mail", "q=hello+world", "0", "=", "😀")
    val texts = (1 to 300).map { _ =>
      (0 until rnd.nextInt(12)).map(_ => atoms(rnd.nextInt(atoms.size)))
        .mkString("&")
    }
    compare(texts, "&")
    compare(texts, "&", dropEmpty = false)
  }

  test("null propagates; empty separator refused") {
    val df = Seq((1L, Some("b&a")), (2L, None)).toDF("id", "text")
    val got = df.select(SortSegments.sorted(col("text"), "&").as("s"))
      .orderBy("id").collect()
    assert(got(0).getString(0) == "a&b" && got(1).isNullAt(0))
    intercept[IllegalArgumentException] { SortSegments.sorted(col("t"), "") }
  }

  test("codegen and interpreted paths agree") {
    val texts = Seq("b=1&a=2", "&&", "", "é=1&e=2", "😀=1&z=2")
    val saved = spark.conf.getOption("spark.sql.codegen.factoryMode")
    try {
      spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
      val interp = native(texts, "&", dropEmpty = true)
      spark.conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
      val gen = native(texts, "&", dropEmpty = true)
      assert(interp == gen)
    } finally saved match {
      case Some(v) => spark.conf.set("spark.sql.codegen.factoryMode", v)
      case None => spark.conf.unset("spark.sql.codegen.factoryMode")
    }
  }

  test("urlCanonicalize still sorts/dedups-empties params via the native expr") {
    val df = Seq(
      "https://Example.com:443/a/?b=2&a=1&",
      "http://u@host.org:80//p//?z=1&y=2#frag",
      "HTTP://X.Y/?",
      "no-scheme-opaque?b&a").toDF("url")
    val got = df.select(Domains.urlCanonicalize(col("url")).as("c"))
      .collect().map(_.getString(0)).toSeq
    assert(got == Seq(
      "https://example.com/a?a=1&b=2",
      "http://host.org//p?y=2&z=1",
      "http://x.y/",
      "no-scheme-opaque?b&a"))
    // and the canonical path stays HOF/regex-split free: no
    // CodegenFallback node in the projection
    val plan = df.select(Domains.urlCanonicalize(col("url")).as("c"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"map-only:\n$plan")
  }
}
