package graft

import graft.operators.TextDedup
import graft.plans.DedupSegments
import org.apache.spark.sql.functions._

/** Native one-pass segment dedup ≡ the list-HOF keep-first formulation
  * (`array_position(x) == index`), across separators, empty segments,
  * unicode, hash-table stress, and both codegen modes.
  */
class DedupSegmentsSpec extends SparkSpec {
  import spark.implicits._

  private def witness(texts: Seq[String], sep: String): Seq[String] = {
    val q = java.util.regex.Pattern.quote(sep)
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "text")
    val ls = split(col("text"), q, -1)
    df.select(col("id"), array_join(
        filter(ls, (x, i) => array_position(ls, x) === i + 1), sep).as("d"))
      .orderBy("id").collect().map(_.getString(1)).toSeq
  }

  private def native(texts: Seq[String], sep: String): Seq[String] = {
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "text")
    df.select(col("id"), DedupSegments.dedup(col("text"), sep).as("d"))
      .orderBy("id").collect().map(_.getString(1)).toSeq
  }

  private def compare(texts: Seq[String], sep: String): Unit =
    assert(native(texts, sep) == witness(texts, sep), s"sep='$sep'")

  test("hand-picked edges ≡ witness: dups, empties, trailing seps, unicode") {
    compare(Seq(
      "a\nb\na\nc\nb",            // plain dups
      "a\na\na\na",               // all one value
      "\n\na\n\nb\n",             // empty segments: first empty kept
      "single-line no separator",
      "",                          // empty doc
      "x\n",                       // trailing sep → trailing empty
      "日本語\nétude\n日本語\n😀\n😀",
      "tab\tnot sep\ntab\tnot sep"), "\n")
    // multi-byte separator, including self-overlap potential
    compare(Seq("x||y||x||z", "||a||||a", "aaa", "a||"), "||")
    compare(Seq("one aa two aa one aa three"), " aa ")
  }

  test("property: 200 random line soups ≡ witness (hash-table stress)") {
    val rnd = new scala.util.Random(12L)
    val lines = Vector("alpha", "beta", "gamma", "", "alpha beta", "x",
      "42", "中文", "😀", "long line with several words in it")
    val texts = (1 to 200).map { _ =>
      (0 until rnd.nextInt(40)).map(_ => lines(rnd.nextInt(lines.size)))
        .mkString("\n")
    }
    compare(texts, "\n")
  }

  test("dedupIntraDoc: counts and text; null text propagates null") {
    val df = Seq((1L, Some("a\nb\na")), (2L, Some("c")), (3L, None))
      .toDF("id", "text")
    val got = TextDedup.dedupIntraDoc(df, "text", "id")
      .orderBy("id").collect()
    assert(got(0).getLong(1) == 3 && got(0).getLong(2) == 2 &&
      got(0).getString(3) == "a\nb")
    assert(got(1).getLong(1) == 1 && got(1).getLong(2) == 1 &&
      got(1).getString(3) == "c")
    assert(got(2).isNullAt(1) && got(2).isNullAt(3))
  }

  test("codegen and interpreted paths agree") {
    val texts = Seq("a\nb\na", "\n\n", "x", "", "日本語\n日本語")
    val saved = spark.conf.getOption("spark.sql.codegen.factoryMode")
    try {
      spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
      val interp = native(texts, "\n")
      spark.conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
      val gen = native(texts, "\n")
      assert(interp == gen)
    } finally saved match {
      case Some(v) => spark.conf.set("spark.sql.codegen.factoryMode", v)
      case None => spark.conf.unset("spark.sql.codegen.factoryMode")
    }
  }

  test("zero-shuffle plan: dedup is pure map work on the scan") {
    val df = Seq((1L, "a\nb\na")).toDF("id", "text")
    val plan = TextDedup.dedupIntraDoc(df, "text", "id")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"must be map-only:\n$plan")
  }

  test("empty separator refused") {
    intercept[IllegalArgumentException] {
      DedupSegments.dedup(col("text"), "")
    }
  }
}
