package graft

import graft.operators.TextQuality
import org.apache.spark.sql.functions._

/** HashedFeatScore native ≡ the composed HOF formulation it replaced —
  * including the java-split edge cases (leading `\s` token, empty
  * text), Unicode lowercasing, and both codegen modes.
  */
class HashedFeatScoreSpec extends SparkSpec {
  import spark.implicits._

  private def compare(texts: Seq[String], buckets: Int = 4096): Unit = {
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val native = TextQuality.hashedLinearScore(df, "text", "doc_id", buckets)
      .orderBy("doc_id").collect().map(_.toSeq).toSeq
    val composed = TextQuality.hashedLinearScoreComposed(df, "text", "doc_id", buckets)
      .orderBy("doc_id").collect().map(_.toSeq).toSeq
    for (((n, c), t) <- native.zip(composed).zip(texts))
      assert(n == c, s"'$t': native $n vs composed $c")
  }

  test("hand-picked edges: split semantics, unicode lower, empty, punctuation") {
    compare(Seq(
      "", " ", "  ", "\tleading tab", "\n\nnewlines\n", "one",
      "the quick brown fox", "Mixed CASE Words", "ÄÖÜ ß İ",
      "日本語 テキスト", "a  b   c", "trailing  ", "  both  ",
      "punct, here! and? there;", "12 34 x9"))
  }

  test("property: native == composed on 300 random mixed strings, two bucket counts") {
    val rnd = new scala.util.Random(41L)
    val pieces = Vector("Word", "abc", "X", "42", " ", "\t", "\n", "  ",
      ".", ",", "!", "é", "Ü", "中", "😀", "ß")
    val texts = (1 to 300).map { _ =>
      (0 until rnd.nextInt(25)).map(_ => pieces(rnd.nextInt(pieces.size))).mkString
    }
    compare(texts)
    compare(texts.take(50), buckets = 257)
  }

  test("null text: null score, keep = false (native path)") {
    val df = Seq((1L, Some("ok text")), (2L, Option.empty[String]))
      .toDF("doc_id", "text")
    val got = TextQuality.hashedLinearScore(df, "text", "doc_id")
      .orderBy("doc_id").collect()
    assert(got(1).isNullAt(got(1).fieldIndex("score")))
    assert(!got(1).getBoolean(got(1).fieldIndex("keep")))
  }

  test("codegen and interpreted paths agree") {
    val texts = Seq("a b! 12", "日本 abc", "", "\tlead")
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val saved = spark.conf.getOption("spark.sql.codegen.factoryMode")
    def run() = TextQuality.hashedLinearScore(df, "text", "doc_id")
      .orderBy("doc_id").collect().map(_.toSeq).toSeq
    try {
      spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
      val interp = run()
      spark.conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
      assert(interp == run())
    } finally saved match {
      case Some(v) => spark.conf.set("spark.sql.codegen.factoryMode", v)
      case None => spark.conf.unset("spark.sql.codegen.factoryMode")
    }
  }
}
