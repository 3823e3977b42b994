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

  test("weighted table: native lookup matches a hand replay; size mismatch refused") {
    val w = Array.tabulate(8)(i => (i * 37 - 100).toLong)
    val docs = Seq((1L, "alpha beta"), (2L, "x")).toDF("doc_id", "text")
    val got = TextQuality.hashedLinearScoreWeighted(
        docs, "text", "doc_id", w, scale = 1e6)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    def bucket(f: String): Int = {
      val hex = org.apache.commons.codec.digest.DigestUtils.md5Hex(
        f.getBytes("UTF-8")).substring(0, 8)
      (java.lang.Long.parseLong(hex, 16) % 8).toInt
    }
    def replay(text: String): (Long, Long) = {
      val ts = text.split("\\s+").toSeq
      val fs = ts ++ ts.sliding(2).filter(_.size == 2).map(_.mkString("_"))
      (fs.size.toLong, fs.map(f => w(bucket(f))).sum)
    }
    val r1 = replay("alpha beta")
    val r2 = replay("x")
    assert(got(0) == ((1L, r1._1, r1._2)), s"${got(0)} vs $r1")
    assert(got(1) == ((2L, r2._1, r2._2)), s"${got(1)} vs $r2")
    val e = intercept[IllegalArgumentException] {
      graft.plans.HashedFeatScore.featScore(col("text"), 4, Some(w))
    }
    assert(e.getMessage.contains("exactly `buckets` entries"))
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

  test("trained expressions with equal tables compare equal (plan canonicalization)") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    // two SEPARATELY constructed but identical tables: the synthesized
    // case-class equals compared the arrays by reference, defeating
    // subexpression elimination for trained scoring
    val t1 = Array.tabulate(8)(i => (i * 3 - 7).toLong)
    val t2 = Array.tabulate(8)(i => (i * 3 - 7).toLong)
    val c = Literal("x")
    val (a, b) = (plans.HashedFeatScore(c, 8, Some(t1)),
      plans.HashedFeatScore(c, 8, Some(t2)))
    assert(a == b && a.hashCode == b.hashCode)
    assert(a.semanticEquals(b))
    val diff = plans.HashedFeatScore(c, 8, Some(t1.updated(0, 99L)))
    assert(a != diff)
    assert(a != plans.HashedFeatScore(c, 8, None))
    assert(plans.HashedFeatScore(c, 8, None) ==
      plans.HashedFeatScore(c, 8, None))
  }
}
