package graft

import graft.operators.Domains
import org.apache.spark.sql.functions._

/** URL canonicalization, registrable-domain reduction, per-domain caps,
  * and the domain quality rollup (round-12 curation family).
  */
class DomainsSpec extends SparkSpec {
  import spark.implicits._

  private def canon(urls: String*): Seq[String] =
    urls.toDF("u").select(Domains.urlCanonicalize(col("u")).as("c"))
      .collect().map(_.getString(0)).toSeq

  test("urlCanonicalize: scheme/host case, userinfo, default ports, param sort, fragment") {
    val got = canon(
      "HTTP://User@WWW.Example.COM:80/a/b/?b=2&a=1#frag",
      "https://Example.com:443",
      "http://example.com:8080//",
      "https://example.com:80/x",
      "http://a.com/x?&&",
      "  http://pad.com/p  ")
    assert(got == Seq(
      "http://www.example.com/a/b?a=1&b=2",
      "https://example.com/",
      "http://example.com:8080/",
      "https://example.com:80/x",   // :80 is only default for http
      "http://a.com/x",
      "http://pad.com/p"), got.toString)
  }

  test("urlCanonicalize: no scheme → lowercased opaque id; duplicate params keep both, sorted") {
    val got = canon(
      "Example.com/Path#f",
      "http://h.org?z=9&y=8&z=1&")
    assert(got == Seq(
      "example.com/path",
      "http://h.org/?y=8&z=1&z=9"), got.toString)
  }

  test("urlCanonicalize is idempotent") {
    val raw = Seq(
      "HTTP://User@WWW.Example.COM:80/a/b/?b=2&a=1#frag",
      "https://Example.com:443", "http://example.com:8080//",
      "Example.com/Path#f", "http://h.org?z=9&y=8&z=1&")
    val once = canon(raw: _*)
    val twice = once.toDF("u")
      .select(Domains.urlCanonicalize(col("u")).as("c"))
      .collect().map(_.getString(0)).toSeq
    assert(once == twice, s"not idempotent:\n$once\n$twice")
  }

  test("registeredDomain: two-label default, multi-part suffix snapshot, degenerate hosts") {
    val got = Seq("news.bbc.co.uk", "a.b.example.com", "example.com",
        "localhost", "x.co.uk", "co.uk", "deep.ac.jp.example.org")
      .toDF("h").select(Domains.registeredDomain(col("h")).as("d"))
      .collect().map(_.getString(0)).toSeq
    assert(got == Seq("bbc.co.uk", "example.com", "example.com",
      "localhost", "x.co.uk", "co.uk", "example.org"), got.toString)
  }

  test("domainCap: keeps the k md5-smallest per domain; salted ≡ unsalted exactly") {
    val docs = (1L to 200L).map(i =>
        (i, s"http://site${i % 5}.example${i % 3}.com/p"))
      .toDF("id", "url")
    def kept(salt: Int): Set[Long] =
      Domains.domainCap(docs, "url", "id", k = 4, salt = salt)
        .select("id").as[Long].collect().toSet
    val unsalted = kept(1)
    assert(kept(4) == unsalted && kept(7) == unsalted,
      "salt changed the kept set — two-phase top-k must be exact")
    // replay: per domain (example{0,1,2}.com) the 4 smallest md5(id)
    val byDom = (1L to 200L).groupBy(i => s"example${i % 3}.com")
    val expect = byDom.values.flatMap { ids =>
      ids.sortBy(i => org.apache.commons.codec.digest.DigestUtils
        .md5Hex(i.toString)).take(4)
    }.toSet
    assert(unsalted == expect, s"got $unsalted want $expect")
    // cap honored per domain
    val perDom = Domains.domainCap(docs, "url", "id", k = 4)
      .groupBy("domain").count().as[(String, Long)].collect().toMap
    assert(perDom.values.forall(_ <= 4) && perDom.size == 3)
  }

  test("domainQualityRollup: counts and mean agree with the per-doc scorer") {
    val docs = Seq(
      (1L, "http://a.com/1", "the quick brown fox"),
      (2L, "http://sub.a.com/2", "word"),
      (3L, "http://b.org/3", "another document with words"),
      (4L, "http://b.org/4", null.asInstanceOf[String]))
      .toDF("id", "url", "text")
    val got = Domains.domainQualityRollup(docs, "url", "text")
      .orderBy("domain")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.map(t => (t._1, t._2)).toSeq == Seq(("a.com", 2L), ("b.org", 2L)))
    // null text: counted in n_docs, absent from n_scored
    assert(got.find(_._1 == "b.org").get._3 == 1L)
    // cross-check mean against the per-doc operator
    val perDoc = graft.operators.TextQuality
      .hashedLinearScore(docs.filter(col("id") === 1L || col("id") === 2L), "text", "id")
      .select("score").as[Option[Double]].collect().flatten
    val mean = Domains.domainQualityRollup(docs, "url", "text")
      .filter(col("domain") === "a.com")
      .select("mean_score").as[Double].head()
    val expect = perDoc.map(s => BigDecimal(s).setScale(9, BigDecimal.RoundingMode.HALF_UP)).sum / 2
    assert(math.abs(mean - expect.toDouble) < 1e-12, s"$mean vs $expect")
  }

  test("registeredDomain: regex-free form ≡ the split-based witness, adversarial hosts") {
    // the split(limit = -1) semantics the rewrite must preserve:
    // trailing dots keep empty labels, consecutive dots keep empties
    val hosts = Seq("news.bbc.co.uk", "a.b.example.com", "example.com",
      "localhost", "", "a.b.", "a..b", ".a", "x.co.uk", "co.uk",
      "deep.sub.domain.gov.au", "trailing.dot.com.", "..", ".",
      "single.", "a.b.c.d.e.f.co.jp")
    val df = hosts.toDF("h")
    val witness = {
      val labels = split(col("h"), "\\.")
      val last2 = concat_ws(".", element_at(labels, -2), element_at(labels, -1))
      val last3 = concat_ws(".",
        element_at(labels, -3), element_at(labels, -2), element_at(labels, -1))
      val suffixes = Domains.multiPartSuffixes.map(lit(_))
      when(size(labels) <= 2, col("h"))
        .otherwise(when(array_contains(array(suffixes: _*), last2), last3)
          .otherwise(last2))
    }
    val rows = df.select(col("h"), Domains.registeredDomain(col("h")).as("fast"),
        witness.as("slow")).collect()
    for (r <- rows)
      assert(r.getString(1) == r.getString(2),
        s"host '${r.getString(0)}': fast '${r.getString(1)}' vs split '${r.getString(2)}'")
  }

  private def sampleDocs(n: Int) = {
    val texts = Seq("the quick brown fox", "word", "longer document with many words here",
      "x", "some mediocre middle text", "")
    (1 to n).map(i => (i.toLong,
        s"http://site${i % 7}.${if (i % 3 == 0) "co.uk" else "com"}/p$i",
        texts(i % texts.size)))
      .toDF("id", "url", "text")
  }

  test("domain state algebra: merge(state(parts)) ≡ state(whole), any split, any tree") {
    val docs = sampleDocs(90)
    val whole = Domains.domainQualityState(docs, "url", "text")
    def canon(df: org.apache.spark.sql.DataFrame) =
      Domains.finishDomainQuality(df).orderBy("domain").collect().toSeq
    // two-way split on one column, three-way on another: both merge
    // trees (pairwise-then-merge and flat 3-way) land on the whole
    val p2 = Seq(docs.filter(col("id") % 2 === 0), docs.filter(col("id") % 2 === 1))
    val p3 = (0 to 2).map(r => docs.filter(col("id") % 3 === r))
    assert(canon(Domains.mergeDomainQuality(p2.map(
      Domains.domainQualityState(_, "url", "text")): _*)) == canon(whole))
    assert(canon(Domains.mergeDomainQuality(p3.map(
      Domains.domainQualityState(_, "url", "text")): _*)) == canon(whole))
    // nested tree: merge(merge(a, b), c)
    val st = p3.map(Domains.domainQualityState(_, "url", "text"))
    assert(canon(Domains.mergeDomainQuality(
      Domains.mergeDomainQuality(st(0), st(1)), st(2))) == canon(whole))
    // and the public rollup is exactly finish∘state
    assert(canon(whole) ==
      Domains.domainQualityRollup(docs, "url", "text").orderBy("domain").collect().toSeq)
  }

  test("domainPriorSample: null-URL docs are excluded (equi-join semantics), helper names collision-safe") {
    val docs = (sampleDocs(30).collect().toSeq.map(r =>
        (r.getLong(0), Option(r.getString(1)), r.getString(2))) ++
      Seq((997L, None, "null url doc one"), (998L, None, "null url doc two")))
      .toDF("id", "url", "text")
    val kept = Domains.domainPriorSample(docs, "url", "id", "text", floor = 1.0)
    // floor=1 keeps every NON-null-domain doc; the null-URL docs must
    // NOT leak through the null-safe join
    assert(kept.count() == 30, s"got ${kept.count()}")
    assert(kept.filter(col("id") >= 997L).count() == 0)
    // a pre-existing column named like a helper must survive untouched
    val withH = sampleDocs(20).withColumnRenamed("id", "_h")
    val out = Domains.domainPriorSample(withH, "url", "_h", "text", floor = 1.0)
    assert(out.columns.contains("_h") && out.count() == 20)
    // output-name collisions refuse loudly instead of destroying data
    intercept[IllegalArgumentException] {
      Domains.domainPriorSample(
        sampleDocs(5).withColumn("domain", lit("x")), "url", "id", "text")
    }
    intercept[IllegalArgumentException] {
      Domains.domainCap(
        sampleDocs(5).withColumn("domain", lit("x")), "url", "id", k = 1)
    }
  }

  test("domainPriorSample: deterministic, weight-bounded, monotone in the floor") {
    val docs = sampleDocs(120)
    val s1 = Domains.domainPriorSample(docs, "url", "id", "text")
      .select("id").as[Long].collect().toSet
    val s2 = Domains.domainPriorSample(docs, "url", "id", "text")
      .select("id").as[Long].collect().toSet
    assert(s1 == s2, "same inputs must keep the same docs")
    assert(s1.nonEmpty && s1.subsetOf((1L to 120L).toSet))
    // weights live in [floor, 1]
    val w = Domains.domainPriorSample(docs, "url", "id", "text", floor = 0.2)
      .select("weight").as[Double].collect()
    assert(w.forall(x => x >= 0.2 && x <= 1.0), w.mkString(","))
    // floor = 1 keeps EVERY doc of every domain (threshold 2^60 > any h)
    val all = Domains.domainPriorSample(docs, "url", "id", "text", floor = 1.0)
    assert(all.count() == 120)
    // a different seed keeps a different set (not a constant function)
    val s3 = Domains.domainPriorSample(docs, "url", "id", "text", seed = "s2")
      .select("id").as[Long].collect().toSet
    assert(s3 != s1, "seed must move the kept set")
  }

  test("domainCapTiered: per-domain budget, defaultK fallback, salted ≡ unsalted, dup caps refused") {
    // 30 docs on a.com, 30 on b.org, 10 on c.io (no cap row → defaultK)
    val docs = ((1L to 30L).map(i => (i, s"https://a.com/$i")) ++
      (31L to 60L).map(i => (i, s"https://b.org/$i")) ++
      (61L to 70L).map(i => (i, s"https://c.io/$i"))).toDF("id", "url")
    val caps = Seq(("a.com", 25), ("b.org", 5)).toDF("dom", "k")
    val kept = Domains.domainCapTiered(docs, "url", "id", caps, "dom", "k",
        defaultK = 7)
      .groupBy("domain").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(kept == Map("a.com" -> 25L, "b.org" -> 5L, "c.io" -> 7L))
    // salted two-phase keeps the IDENTICAL set (not just identical counts)
    val ids = Domains.domainCapTiered(docs, "url", "id", caps, "dom", "k", 7)
      .select("id").as[Long].collect().toSet
    val idsSalted = Domains.domainCapTiered(docs, "url", "id", caps, "dom",
        "k", 7, salt = 4)
      .select("id").as[Long].collect().toSet
    assert(idsSalted == ids, "salted phase changed the kept set")
    // duplicate, null-k, and non-positive-k cap rows all fail loudly
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Seq.empty
      else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    val bads = Seq(
      Seq(("a.com", Integer.valueOf(5)), ("a.com", Integer.valueOf(9))),
      Seq(("a.com", null.asInstanceOf[Integer])),
      Seq(("a.com", Integer.valueOf(0))),
      Seq(("a.com", Integer.valueOf(-3))))
    for (bad <- bads) {
      val ex = intercept[Exception] {
        Domains.domainCapTiered(docs, "url", "id", bad.toDF("dom", "k"),
          "dom", "k", 7).collect()
      }
      assert(msgs(ex).exists(_.contains("one row per domain")),
        s"caps $bad not refused: $ex")
    }
  }

  test("blocklistVerdict (per-row form) == blocklistScreen row for row") {
    val entries = Seq("site3.com", "www.site3.com", "api.site7.io")
    val docs = Seq(
      (1L, "www.site3.com"), (2L, "news.site3.com"), (3L, "notsite3.com"),
      (4L, "API.Site7.io"), (5L, "x.api.site7.io"), (6L, "site9.org"),
      (7L, "site3.com"), (8L, "")
    ).toDF("id", "host")
    val viaScreen = Domains.blocklistScreen(docs, "id", "host",
        entries.toDF("entry"), "entry")
      .select("id", "blocked_by")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val viaVerdict = docs
      .select(col("id"),
        Domains.blocklistVerdict(col("host"), entries).as("v"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(viaVerdict == viaScreen, s"$viaVerdict != $viaScreen")
  }

  test("blocklistScreen refuses an input that already carries a blocked_by column") {
    val docs = Seq((1L, "a.com", "old")).toDF("id", "host", "blocked_by")
    val blk = Seq("a.com").toDF("entry")
    val ex = intercept[IllegalArgumentException] {
      Domains.blocklistScreen(docs, "id", "host", blk, "entry")
    }
    assert(ex.getMessage.contains("blocked_by"))
  }

  test("hostSuffixes: dot-position form, no split, degenerate hosts") {
    val got = Seq("a.b.c", "x", "", ".y", "z.").toDF("h")
      .select(col("h"), Domains.hostSuffixes(col("h")).as("s"))
      .collect().map(r => r.getString(0) -> r.getSeq[String](1)).toMap
    assert(got("a.b.c") == Seq("a.b.c", "b.c", "c"))
    assert(got("x") == Seq("x"))
    assert(got("") == Seq(""))
    assert(got(".y") == Seq(".y", "y")) // leading dot: suffix after it
    assert(got("z.") == Seq("z.", "")) // trailing dot: empty suffix
  }

  test("blocklistScreen: label-boundary suffix match, most-specific entry wins") {
    val docs = Seq(
      (1L, "www.site3.com"),   // matches site3.com AND www.site3.com
      (2L, "news.site3.com"),  // matches site3.com only
      (3L, "notsite3.com"),    // must NOT match (label boundary)
      (4L, "API.Site7.io"),    // case-folds, exact entry
      (5L, "x.api.site7.io"),  // subdomain of a 3-label entry
      (6L, "site9.org")        // kept
    ).toDF("id", "host")
    val blk = Seq("site3.com", "www.site3.com", "api.site7.io")
      .toDF("entry")
    val got = Domains.blocklistScreen(docs, "id", "host", blk, "entry")
      .select("id", "blocked_by")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(1L -> "www.site3.com", 2L -> "site3.com",
      3L -> "", 4L -> "api.site7.io", 5L -> "api.site7.io", 6L -> ""))
  }
}
