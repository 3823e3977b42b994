package graft

import graft.operators.BpeTrain
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** BPE merge training vs a plain-collections reference implementation
  * (the textbook Sennrich algorithm), including the adversarial cases
  * where positional pair counting and left-to-right merging diverge
  * from naive alternatives: overlapping pairs ("aaa"), merges whose
  * output abuts another rule site, and count ties.
  */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  /** Reference BPE on word frequencies: positional (overlapping) pair
    * counts, (count DESC, lhs, rhs) argmax, left-to-right
    * non-overlapping application.
    */
  private def refBpe(words: Map[String, Long], k: Int): Seq[(Int, String, String, String, Long)] = {
    var seqs: Seq[(Vector[String], Long)] =
      words.toSeq.map { case (w, f) => (w.map(_.toString).toVector, f) }
    val out = Seq.newBuilder[(Int, String, String, String, Long)]
    var step = 1
    var done = false
    while (step <= k && !done) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      for ((s, f) <- seqs; i <- 0 until s.length - 1)
        counts((s(i), s(i + 1))) = counts.getOrElse((s(i), s(i + 1)), 0L) + f
      if (counts.isEmpty) done = true
      else {
        val ((l, r), c) = counts.toSeq.minBy { case ((l, r), c) => (-c, l, r) }
        out += ((step, l, r, l + r, c))
        seqs = seqs.map { case (s, f) =>
          val b = Vector.newBuilder[String]
          var i = 0
          while (i < s.length) {
            if (i + 1 < s.length && s(i) == l && s(i + 1) == r) { b += l + r; i += 2 }
            else { b += s(i); i += 1 }
          }
          (b.result(), f)
        }
        step += 1
      }
    }
    out.result()
  }

  private def learned(texts: Seq[String], k: Int, checkpointEvery: Int = 20) = {
    val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    BpeTrain.learnMerges(docs, "text", k, checkpointEvery)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getString(3), r.getLong(4)))
      .toSeq
  }

  private def refOn(texts: Seq[String], k: Int) = {
    val words = texts.flatMap(_.toLowerCase.split("[^a-z0-9]+")).filter(_.nonEmpty)
      .groupBy(identity).map { case (w, ws) => w -> ws.size.toLong }
    refBpe(words, k)
  }

  test("learnMerges matches the reference on an adversarial fixture") {
    // "aaa" exercises overlapping counts; "abab" re-merge adjacency;
    // identical counts exercise the lexicographic tie-break; the
    // low/lower/lowest family is the textbook example
    val texts = Seq(
      "low low low lower lower lowest",
      "aaa aaa aaab abab abab",
      "newest newest widest b a")
    val k = 10
    assert(learned(texts, k) == refOn(texts, k))
  }

  test("localCheckpoint path (checkpointEvery=2) changes nothing") {
    val texts = Seq("banana bandana ban ban banana")
    assert(learned(texts, 6, checkpointEvery = 2) == refOn(texts, 6))
  }

  test("merge table property: Spark == reference on random corpora") {
    val word = Gen.chooseNum(1, 6).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf('a', 'b', 'c')).map(_.mkString))
    val corpus = Gen.chooseNum(1, 25).flatMap(n => Gen.listOfN(n, word))
    val prop = Prop.forAll(corpus) { ws =>
      val text = Seq(ws.mkString(" "))
      learned(text, 5) == refOn(text, 5)
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(15), prop)
    assert(res.passed, res.status.toString)
  }

  test("exhausted corpus stops early: single-char words learn no merges") {
    assert(learned(Seq("a b c a b"), 4).isEmpty)
  }

  private def learnedBatched(texts: Seq[String], k: Int, batch: Int) = {
    val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    BpeTrain.learnMergesBatched(docs, "text", k, batchSize = batch, checkpointEvery = 3)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getString(3), r.getLong(4)))
      .toSeq
  }

  test("learnMergesBatched ≡ sequential: fixture + chained-merge adversary, several widths") {
    val texts = Seq(
      "low low low lower lower lowest",
      "aaa aaa aaab abab abab",
      "newest newest widest b a")
    for (b <- Seq(1, 4, 16))
      assert(learnedBatched(texts, 10, b) == refOn(texts, 10),
        s"batchSize=$b diverged from sequential")
    // chained-merge adversary: (a,b) then (ab,c) then (abc,d) — each
    // rule's tokens include the previous rule's merged string, so every
    // batch must degrade to a singleton; any wider acceptance would
    // score (ab,c) on a pre-merge snapshot
    val chained = Seq("abcd abcd abcd abcd abcd")
    for (b <- Seq(2, 8))
      assert(learnedBatched(chained, 4, b) == refOn(chained, 4),
        s"chained-merge corpus diverged at batchSize=$b")
  }

  test("learnMergesBatched ≡ sequential on random corpora (property)") {
    val word = Gen.chooseNum(1, 6).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf('a', 'b', 'c')).map(_.mkString))
    val corpus = Gen.chooseNum(1, 25).flatMap(n => Gen.listOfN(n, word))
    val prop = Prop.forAll(corpus, Gen.oneOf(2, 3, 5)) { (ws, b) =>
      val text = Seq(ws.mkString(" "))
      learnedBatched(text, 6, b) == refOn(text, 6)
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(12), prop)
    assert(res.passed, res.status.toString)
  }

  test("encodeWords: fold path ≡ mapPartitions path ≡ reference on random words") {
    val merges = Seq("a" -> "b", "ab" -> "c", "b" -> "b", "c" -> "abc")
    def refEncode(w: String): Vector[String] =
      merges.foldLeft(w.split("").filter(_.nonEmpty).toVector) { case (toks, (l, r)) =>
        val b = Vector.newBuilder[String]
        var i = 0
        while (i < toks.length) {
          if (i + 1 < toks.length && toks(i) == l && toks(i + 1) == r) { b += l + r; i += 2 }
          else { b += toks(i); i += 1 }
        }
        b.result()
      }
    val word = Gen.chooseNum(1, 10).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf('a', 'b', 'c')).map(_.mkString))
    val prop = Prop.forAll(Gen.listOfN(12, word)) { ws0 =>
      val ws = ws0.distinct
      val df = ws.toDF("word")
      def run(limit: Int) =
        BpeTrain.encodeWords(df, "word", merges, foldLimit = limit)
          .collect().map(r => r.getString(0) -> r.getSeq[String](1).toVector).toMap
      val (fold, imp) = (run(64), run(0))
      val ref = ws.map(w => w -> refEncode(w)).toMap
      fold == ref && imp == ref
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(20), prop)
    assert(res.passed, res.status.toString)
  }

  test("learnMergesLocal ≡ learnMerges (reference) on fixture and random corpora") {
    val texts = Seq(
      "low low low lower lower lowest",
      "aaa aaa aaab abab abab",
      "newest newest widest b a")
    val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    assert(BpeTrain.learnMergesLocal(docs, "text", 10) ==
      refOn(texts, 10).map(m => (m._2, m._3)))
    val word = Gen.chooseNum(1, 6).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf('a', 'b', 'c')).map(_.mkString))
    val corpus = Gen.chooseNum(1, 25).flatMap(n => Gen.listOfN(n, word))
    val prop = Prop.forAll(corpus) { ws =>
      val text = Seq(ws.mkString(" "))
      val df = text.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
      BpeTrain.learnMergesLocal(df, "text", 5) == refOn(text, 5).map(m => (m._2, m._3))
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(10), prop)
    assert(res.passed, res.status.toString)
  }

  test("maxVocab guard trips loudly before collecting an oversized vocab; result is take()-order-insensitive") {
    val texts = Seq("low low low lower lower lowest",
      "aaa aaa aaab abab abab", "newest newest widest b a")
    val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    // the fixture holds 10 distinct words: a cap of 9 must trip with the
    // actionable minFreq pointer, never an OOM-shaped failure
    val ex = intercept[IllegalArgumentException] {
      BpeTrain.learnMergesLocal(docs, "text", 10, maxVocab = 9)
    }
    assert(ex.getMessage.contains("minFreq") && ex.getMessage.contains("maxVocab=9"))
    // cap exactly at the vocab size passes and learns the identical table
    // (take() vs collect() partition-order differences cannot matter:
    // pair counting sums frequencies, argmax is a total order)
    assert(BpeTrain.learnMergesLocal(docs, "text", 10, maxVocab = 10) ==
      BpeTrain.learnMergesLocal(docs, "text", 10))
    // minFreq is the documented remedy: the hapax cut (4 words survive
    // freq >= 2) brings the same corpus back under the 9-word cap
    assert(BpeTrain.learnMergesLocal(docs, "text", 10, minFreq = 2L, maxVocab = 9) ==
      BpeTrain.learnMergesLocal(docs, "text", 10, minFreq = 2L))
  }

  test("production regime: >=256-rule table trains and encodes through the mapPartitions path") {
    // the driver corpus's 31-word vocab ceilings at 89 merges, so the
    // 256+-rule regime real tokenizers run in is proven here on a wider
    // deterministic vocab: 600 pseudo-words over 10 letters
    val rng = new scala.util.Random(42)
    val letters = "abcdefghij"
    val vocab = (0 until 600).map { _ =>
      val n = 3 + rng.nextInt(6)
      (0 until n).map(_ => letters(rng.nextInt(letters.length))).mkString
    }.distinct
    val text = vocab.zipWithIndex
      .flatMap { case (w, i) => Seq.fill(1 + (i % 7))(w) }.mkString(" ")
    val docs = Seq((1L, text)).toDF("doc_id", "text")

    val merges = BpeTrain.learnMergesLocal(docs, "text", 300)
    assert(merges.size >= 256, s"vocab too narrow: only ${merges.size} merges learned")
    assert(merges == refOn(Seq(text), 300).map(m => (m._2, m._3)))

    // 300 rules > foldLimit=64 → encodeWords takes the mapPartitions
    // path; verify every word against the plain-Scala reference encoder
    def refEncode(w: String): Vector[String] =
      merges.foldLeft(w.split("").filter(_.nonEmpty).toVector) { case (toks, (l, r)) =>
        val b = Vector.newBuilder[String]
        var i = 0
        while (i < toks.length) {
          if (i + 1 < toks.length && toks(i) == l && toks(i + 1) == r) { b += l + r; i += 2 }
          else { b += toks(i); i += 1 }
        }
        b.result()
      }
    val got = BpeTrain.encodeWords(vocab.toDF("word"), "word", merges)
      .collect().map(r => r.getString(0) -> r.getSeq[String](1).toVector).toMap
    assert(got == vocab.map(w => w -> refEncode(w)).toMap)
  }

  test("encodeDocs: per-doc token runs concatenate in document order") {
    val docs = Seq((1L, "Banana ban!  Banana."), (2L, "ban banana"), (3L, ""))
      .toDF("doc_id", "text")
    val merges = Seq("a" -> "n", "b" -> "an")
    // "banana" -> ban|an|a ; "ban" -> ban
    val got = BpeTrain.encodeDocs(docs, "text", "doc_id", merges)
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1).toList).toMap
    assert(got(1L) == List("ban", "an", "a", "ban", "ban", "an", "a"))
    assert(got(2L) == List("ban", "ban", "an", "a"))
    assert(!got.contains(3L) || got(3L).isEmpty) // empty doc: no words
  }
}
