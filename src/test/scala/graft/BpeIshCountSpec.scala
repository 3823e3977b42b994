package graft

import graft.functions.TextFunctions
import org.apache.spark.sql.functions._

/** BpeIshCount native ≡ the regex formulation it replaced, across
  * ASCII, Unicode (multi-byte and astral code points), whitespace
  * variants, and degenerate inputs.
  */
class BpeIshCountSpec extends SparkSpec {
  import spark.implicits._

  private def both(texts: Seq[String]): Seq[(String, Int, Int)] = {
    val df = texts.toDF("text")
    df.select(col("text"),
        TextFunctions.tokenCountBpeIsh(col("text")).as("native"),
        TextFunctions.tokenCountBpeIshRegex(col("text")).as("regex"))
      .collect()
      .map(r => (r.getString(0), r.getInt(1), r.getInt(2))).toSeq
  }

  test("hand-picked edges: runs, unicode, whitespace family, empty") {
    val cases = Seq(
      "", " ", "\t\n\f\r", "abc", "ABC123", "a1b2",
      "hello, world! 42 times.", "..,,;;", "a  b\tc\nd",
      "naïve café", "日本語テキスト", "汉字 and ascii 123",
      "emoji 😀 pair", "mixé42!", " ", // nbsp is NOT \s
      "x y", "trailing space ", " leading", "áéíóú")
    for ((t, native, regex) <- both(cases))
      assert(native == regex, s"'$t': native $native vs regex $regex")
  }

  test("property: native == regex on 500 random mixed strings") {
    val rnd = new scala.util.Random(20260814L)
    val pieces = Vector(
      "word", "Abc", "x", "42", "7", "longishtoken",
      " ", "\t", "\n", "  ", "", "\f", "\r",
      ".", ",", "!", "?", ";", "-", "_", "#",
      "\u00e9", "\u00df", "\u4e2d", "\u6587", "\ud83d\ude00", "\u00a0", "\u00bd")
    val texts = (1 to 500).map { _ =>
      (0 until rnd.nextInt(30)).map(_ => pieces(rnd.nextInt(pieces.size))).mkString
    }
    for ((t, native, regex) <- both(texts))
      assert(native == regex, s"'$t': native $native vs regex $regex")
  }

  test("translate-diff class counts == regexp_count (qualityStruct's punct/digit path)") {
    val texts = Seq("a.b,c;d:e!f?g", "no punct here", "123 4 5,6", "", "é!½?")
    val df = texts.toDF("text")
    val got = df.select(
      (length(col("text")) - length(translate(col("text"), ".,;:!?", ""))).as("p1"),
      regexp_count(col("text"), lit("[.,;:!?]")).as("p2"),
      (length(col("text")) - length(translate(col("text"), "0123456789", ""))).as("d1"),
      regexp_count(col("text"), lit("[0-9]")).as("d2")).collect()
    for (r <- got)
      assert(r.getInt(0) == r.getInt(1) && r.getInt(2) == r.getInt(3), r.toString)
  }

  test("null text yields null, matching the regex form") {
    val df = Seq(Some("ab"), None).toDF("text")
    val got = df.select(
      TextFunctions.tokenCountBpeIsh(col("text")).as("n")).collect()
    assert(got(0).getInt(0) == 1 && got(1).isNullAt(0))
  }

  test("codegen and interpreted paths agree") {
    val texts = Seq("a b! 12", "日本 abc", "", "😀x9")
    val saved = spark.conf.getOption("spark.sql.codegen.factoryMode")
    try {
      spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
      val interp = both(texts).map(_._2)
      spark.conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
      val gen = both(texts).map(_._2)
      assert(interp == gen)
    } finally saved match {
      case Some(v) => spark.conf.set("spark.sql.codegen.factoryMode", v)
      case None => spark.conf.unset("spark.sql.codegen.factoryMode")
    }
  }
}
