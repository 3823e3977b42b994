package graft

import graft.plans.FixMojibake
import org.apache.spark.sql.functions._

/** FixMojibake inverts exactly one UTF-8-read-as-cp1252 round trip —
  * the universal law, known pairs, no-op guarantees, and codegen
  * parity.
  */
class MojibakeSpec extends SparkSpec {
  import spark.implicits._

  /** The corruption under test: s's UTF-8 bytes decoded as sloppy
    * windows-1252 (what a mis-configured reader does to a UTF-8 file).
    */
  private def corrupt(s: String): String = {
    val bytes = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val sb = new StringBuilder(bytes.length)
    bytes.foreach(b => sb.append(FixMojibake.byteToCp(b & 0xFF)))
    sb.toString
  }

  private def repair(texts: Seq[String]): Seq[String] = {
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "text")
    df.select(col("id"), FixMojibake.of(col("text")).as("t"))
      .orderBy("id").collect().map(_.getString(1)).toSeq
  }

  test("known mojibake pairs repair to the intended characters") {
    assert(repair(Seq(
      "cafÃ©",              // Ã© → é
      "itâ€™s",        // â€™ → ’
      "â€œqâ€\u009d", // â€œ / â€+U+009D (sloppy C1) → “q”
      "Ã¤Ã¶Ã¼",  // Ã¤Ã¶Ã¼ → äöü
      "naÃ¯ve")) ==         // Ã¯ → ï
      Seq("café", "it’s", "“q”", "äöü", "naïve"))
  }

  test("clean text is untouched: ascii, healthy accents, CJK, emoji") {
    val clean = Seq("plain ascii only", "café déjà-vu ñ", "日本語テキスト",
      "emoji 😀 stays", "math: a < b ≤ c", "price € 5 — cheap", "")
    assert(repair(clean) == clean)
  }

  test("universal law: repair(corrupt(s)) == s, 400 random unicode strings") {
    val rnd = new scala.util.Random(99L)
    val atoms = Vector("word", "é", "ü", "ñ", "’", "“", "”", "—", "…",
      "漢字", "かな", "한글", "😀", "Ω", "≤", "€", " ", ".", "a<b",
      " ", "Ÿ", "ž", "ƒ")
    val texts = (1 to 400).map { _ =>
      (0 until rnd.nextInt(20)).map(_ => atoms(rnd.nextInt(atoms.size)))
        .mkString("")
    }
    assert(repair(texts.map(corrupt)) == texts)
  }

  test("double corruption needs two repairs (single-level by design)") {
    val s = "café"
    val twice = corrupt(corrupt(s))
    val once = repair(Seq(twice)).head
    assert(once == corrupt(s))       // one level peeled
    assert(repair(Seq(once)).head == s)
  }

  test("null propagates; codegen and interpreted agree") {
    val df = Seq((1L, Some("cafÃ©")), (2L, None)).toDF("id", "text")
    val got = df.select(FixMojibake.of(col("text")).as("t")).orderBy("id").collect()
    assert(got(0).getString(0) == "café" && got(1).isNullAt(0))
    val texts = Seq("cafÃ©", "x", "", "itâ€™s")
    val saved = spark.conf.getOption("spark.sql.codegen.factoryMode")
    try {
      spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
      val interp = repair(texts)
      spark.conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
      val gen = repair(texts)
      assert(interp == gen && interp.head == "café")
    } finally saved match {
      case Some(v) => spark.conf.set("spark.sql.codegen.factoryMode", v)
      case None => spark.conf.unset("spark.sql.codegen.factoryMode")
    }
  }
}
