package graft

import graft.operators.Html
import graft.plans.HtmlToText
import org.apache.spark.sql.functions._

/** Native three-scan HTML→text ≡ the declared regex/replace chain
  * (the executable spec and DuckDB-oracle form), across hand edges,
  * random tag soups, and a corpus-derived synthesis — plus link
  * extraction and codegen parity.
  */
class HtmlSpec extends SparkSpec {
  import spark.implicits._

  private def both(texts: Seq[String]): (Seq[String], Seq[String]) = {
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "html")
    val got = df.select(col("id"),
        HtmlToText.of(col("html")).as("nat"),
        Html.htmlToTextChain(col("html")).as("chain"))
      .orderBy("id").collect()
    (got.map(_.getString(1)).toSeq, got.map(_.getString(2)).toSeq)
  }

  private def pin(texts: Seq[String]): Unit = {
    val (nat, chain) = both(texts)
    texts.indices.foreach { i =>
      assert(nat(i) == chain(i),
        s"divergence on <<${texts(i)}>>:\n native: <<${nat(i)}>>\n chain:  <<${chain(i)}>>")
    }
  }

  test("hand edges: comments, blocks, entities, whitespace, unterminated everything") {
    pin(Seq(
      "<html><body><p>Hello <b>world</b></p></body></html>",
      "<p>a</p><p>b</p>",                              // block newlines
      "<!-- secret --><p>kept</p>",
      "<script>var x = '<p>not text</p>';</script>after",
      "<style>p { color: red }</style>body",
      "<SCRIPT SRC=\"x.js\">ignored()</SCRIPT>ok",     // case-mixed
      "<script deferred>a</script><script>b</script>c", // two blocks
      "<scriptx>not a script</scriptx>",               // \b guard
      "<pre>not a p tag</pre>",                        // \b guard on block
      "<p class=\"x\" id='y'>attrs</p>",
      "&lt;tag&gt; &amp;co &quot;q&quot; &#39;s&#39; a&nbsp;b",
      "&amp;lt; stays half-decoded",                   // decode order
      "a   b\t\tc\r\nd",                               // ws collapse
      "  <p>  spaced  </p>  ",
      "plain text, no html at all",
      "unterminated <p never closes",
      "unterminated <!-- comment to EOF",
      "<!-- partial > inside --> done",
      "<script>no close tag ever",
      "<style>open</style",                            // close tag cut off
      "a < b and c > d",                               // bare angle math
      "<  >",                                          // empty-name tag
      "</>",
      "<>",
      "<3> hearts <3",
      "<p/><br/><div/>",                               // self-closing blocks
      "<TABLE><TR><TD>cell</TD></TR></TABLE>",
      "<h1>one</h1><h6>six</h6><h7>seven</h7>",        // h7 not a block
      "nested <div><div>twice</div></div> out",
      "",
      "<p>&nbsp;</p><p>&nbsp;</p>"))                   // entity-only paragraphs
  }

  test("random tag soup ≡ chain (500 documents)") {
    val rnd = new scala.util.Random(7L)
    val atoms = Vector(
      "<p>", "</p>", "<div class=\"a\">", "</div>", "<br>", "<b>", "</b>",
      "<script>", "</script>", "<style>", "</style>", "<!--", "-->",
      "<li>", "</li>", "<span>", "</span>", "word", "two words", "&amp;",
      "&lt;x&gt;", "&nbsp;", " ", "  ", "\t", "\n", "a<b", "c>d", "<img src=\"i.png\">",
      "<h2 id=x>", "</h2>", "<table>", "</table>", "<tr>", "<td>", "&quot;q&quot;")
    val texts = (1 to 500).map { _ =>
      (0 until 2 + rnd.nextInt(30)).map(_ => atoms(rnd.nextInt(atoms.size)))
        .mkString("")
    }
    pin(texts)
  }

  test("corpus-derived synthesis ≡ chain (the q_html_extract shape)") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
      .select(col("doc_id"), col("text")).limit(200)
    val html = docs.select(col("doc_id"), concat(
      lit("<!DOCTYPE html><html><head><title>Doc "), col("doc_id"),
      lit("</title><style type=\"text/css\">body { margin: 0; }</style>"),
      lit("<script>if (a < b && c > d) { x = \"y\"; }</script></head>"),
      lit("<body><!-- id "), col("doc_id"), lit(" --><h1>Doc "), col("doc_id"),
      lit("</h1><div class=\"main\"><p>"),
      regexp_replace(col("text"), "(\\S+ \\S+ \\S+ \\S+ \\S+) ", "$1</p><p>"),
      lit("</p><p>&quot;x&quot; &lt;tag&gt; &amp;co&nbsp;end</p></div>"),
      lit("<br><ul><li>a</li><li>b</li></ul></body></html>")).as("html"))
    val got = html.select(
        HtmlToText.of(col("html")).as("nat"),
        Html.htmlToTextChain(col("html")).as("chain"))
      .where(col("nat") =!= col("chain")).count()
    assert(got == 0L)
    // sanity on the extracted shape: title/h1 present, script/style gone
    val one = html.orderBy("doc_id")
      .select(HtmlToText.of(col("html")).as("t")).head().getString(0)
    assert(one.startsWith("Doc "), one.take(80))
    assert(!one.contains("margin") && !one.contains("x = \"y\""), one.take(200))
    assert(one.contains("\"x\" <tag> &co end"), one.takeRight(120))
  }

  test("null propagates; codegen and interpreted agree") {
    val df = Seq((1L, Some("<p>a</p>")), (2L, None)).toDF("id", "html")
    val got = df.select(HtmlToText.of(col("html")).as("t")).orderBy("id").collect()
    assert(got(0).getString(0) == "a" && got(1).isNullAt(0))
    val texts = Seq("<p>a</p><script>b</script>", "&amp;lt;", "x<!-- -->y", "")
    val saved = spark.conf.getOption("spark.sql.codegen.factoryMode")
    try {
      spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
      val interp = both(texts)._1
      spark.conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
      val gen = both(texts)._1
      assert(interp == gen)
    } finally saved match {
      case Some(v) => spark.conf.set("spark.sql.codegen.factoryMode", v)
      case None => spark.conf.unset("spark.sql.codegen.factoryMode")
    }
  }

  test("hrefTargets and domainLinkGraph extract and roll up edges") {
    val pages = Seq(
      ("https://news.example.com/a",
       """<a href="https://www.other.org/x">x</a> <a href="https://sub.other.org/y">y</a>
         |<a href="/relative">r</a> <img href="https://img.example.com/i">""".stripMargin),
      ("https://example.com/b",
       """<a href="https://other.org/z">z</a>""")
    ).toDF("url", "html")
    val g = Html.domainLinkGraph(pages, "url", "html")
      .orderBy("src_domain", "dst_domain").collect()
    val rows = g.map(r =>
      (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3))).toSeq
    // relative href "/relative" canonicalizes to an opaque id with no
    // dot-host → registeredDomain("") is "" → filtered
    assert(rows == Seq(
      ("example.com", "example.com", 1L, 1L), // img.example.com rolls up
      ("example.com", "other.org", 3L, 2L)))
  }

  test("anchorPairs: simple anchors only; markup/relative/empty handling") {
    val html =
      """<a href="https://a.com/x">Docs</a> <a class="m" href="https://b.org">B page</a>
        |<a href="/rel">rel text</a> <a href="https://c.io"><b>bold</b></a>
        |<a href="https://d.net"></a> <a>no href</a>""".stripMargin
    val got = Seq(html).toDF("h")
      .select(explode(Html.anchorPairs(col("h"))).as("p"))
      .select("p.href", "p.anchor")
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq
    // markup-bodied anchor excluded (([^<]*) can't span <b>), no-href
    // anchor excluded; relative href and empty anchor text COME OUT
    // (callers filter) — the pairs stay positionally zipped
    assert(got == Seq(
      ("https://a.com/x", "Docs"),
      ("https://b.org", "B page"),
      ("/rel", "rel text"),
      ("https://d.net", "")))
  }

  test("domainAnchorText: per-target rollup, top anchor by count then lexicographic") {
    val pages = Seq(
      ("https://s1.com/a",
       """<a href="https://t.org/1">Official docs</a> <a href="https://t.org/2">Official docs</a>
         |<a href="https://u.io">Alpha</a>""".stripMargin),
      ("https://s2.com/b",
       """<a href="https://t.org/3">API ref</a> <a href="https://www.u.io">Alpha</a>
         |<a href="/rel">skip</a> <a href="https://t.org/4"></a>""".stripMargin)
    ).toDF("url", "html")
    val got = Html.domainAnchorText(pages, "url", "html")
      .orderBy("dst_domain")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getString(3), r.getLong(4))).toSeq
    // t.org: 3 anchors from 2 pages, "Official docs" ×2 tops "API ref";
    // u.io: www. rolls up to the registered domain, tie 1-1 → "Alpha"
    // is its only anchor
    assert(got == Seq(
      ("t.org", 3L, 2L, "Official docs", 2L),
      ("u.io", 2L, 2L, "Alpha", 2L)))
  }
}
