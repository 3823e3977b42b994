package graft

import graft.operators.TextDedup
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** WinnowFp native ≡ the Column-composition witness (per-gram md5
  * prefixes, per-window array_min + array_position, array_distinct),
  * the winnowing guarantee through dupSpanPairs, and the hot-
  * fingerprint cap.
  */
class WinnowFpSpec extends SparkSpec {
  import spark.implicits._

  /** The composed form the native expression replaced — retained here
    * as the property witness (and the shape the DuckDB oracle replays).
    */
  private def witness(df: DataFrame, k: Int, w: Int): DataFrame = {
    val txt = col("_t")
    val hs = transform(sequence(lit(1), length(txt) - k + 1),
      i => conv(substring(md5(txt.substr(i, lit(k))), 1, 15), 16, 10)
        .cast("long"))
    df.select(col("id"), col("text").as("_t"))
      .filter(length(txt) >= k)
      .withColumn("_hs", hs)
      .select(col("id"), explode(array_distinct(
        transform(sequence(lit(1), greatest(size(col("_hs")) - w + 1, lit(1))),
          j => {
            val win = slice(col("_hs"), j, lit(w))
            val m = array_min(win)
            struct(m.as("fp"),
              (j + array_position(win, m) - 1).cast("int").as("pos"))
          }))).as("_x"))
      .select(col("id"), col("_x.fp").as("fp"), col("_x.pos").as("pos"))
  }

  private def compare(texts: Seq[String], k: Int, w: Int): Unit = {
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "text")
    val native = TextDedup.winnowedFingerprints(df, "text", "id", k, w)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val comp = witness(df, k, w)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(native == comp,
      s"k=$k w=$w: native-only=${(native -- comp).take(5)} " +
        s"witness-only=${(comp -- native).take(5)}")
  }

  test("hand-picked edges ≡ witness: repeats, ties, unicode, short docs") {
    val texts = Seq(
      "abcdefghijklmnopqrstuvwxyz0123456789",
      "aaaaaaaaaaaaaaaaaaaaaa",            // all grams identical (ties)
      "abababababababababababab",          // period-2 repeats
      "short",                             // < k → no fingerprints
      "exactly-k-chars!",                  // == k → one gram
      "naïve café — résumé 日本語テキスト padded to length",
      "emoji 😀 pair 😀 emoji 😀 pair padding padding")
    compare(texts, k = 8, w = 4)
    compare(texts, k = 16, w = 1)          // w=1: every gram selected
    compare(texts, k = 5, w = 20)          // w > grams: single window
  }

  test("property: native ≡ witness on 120 random mixed strings") {
    val rnd = new scala.util.Random(20260814L)
    val pieces = Vector("the", "cat", "sat", "on", "mat", " ", "  ",
      "x", "42", ".", ",", "é", "中", "😀", " ")
    val texts = (1 to 120).map { _ =>
      (0 until rnd.nextInt(60)).map(_ => pieces(rnd.nextInt(pieces.size))).mkString
    }
    compare(texts, k = 10, w = 5)
  }

  test("dedupeByFp ≡ groupBy(fp, id).agg(min(pos)) on repeat-heavy strings") {
    val rnd = new scala.util.Random(20260815L)
    val motifs = Vector("lorem ipsum dolor sit amet ", "REPEATED-BLOCK-A ",
      "the cat sat on the mat ", "中文重复段落内容 ", "😀😀 emoji run ")
    // repeat-heavy: the same motif recurs inside one doc, so the same
    // fp value appears at several positions — the case dedupe must
    // collapse to min pos
    val texts = (1 to 80).map { _ =>
      (0 until 2 + rnd.nextInt(10))
        .map(_ => motifs(rnd.nextInt(motifs.size))).mkString
    }
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "text")
    for ((k, w) <- Seq((10, 5), (8, 4), (5, 12))) {
      val deduped = TextDedup.winnowedFingerprints(df, "text", "id", k, w,
          dedupeByFp = true)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
      val grouped = TextDedup.winnowedFingerprints(df, "text", "id", k, w)
        .groupBy("fp", "id").agg(min(col("pos")).as("pos"))
        .collect().map(r => (r.getAs[Long]("id"), r.getAs[Long]("fp"),
          r.getAs[Int]("pos"))).toSet
      assert(deduped == grouped,
        s"k=$k w=$w: native-only=${(deduped -- grouped).take(5)} " +
          s"group-only=${(grouped -- deduped).take(5)}")
    }
  }

  test("winnowing guarantee: a shared span >= k+w-1 chars is found at ANY alignment") {
    val k = 10; val w = 5
    val span = "SHARED-VERBATIM-SPAN-" + ("s" * (k + w - 1))  // > k+w-1 chars
    val docs = Seq(
      (1L, "left padding text " + span + " tail one"),
      (2L, "a completely different and much longer prefix here " + span),
      (3L, span + " suffix only on this one"),
      (4L, "no shared content in this document at all, nothing"))
      .toDF("id", "text")
    val pairs = TextDedup.dupSpanPairs(docs, "text", "id", k, w)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(Set((1L, 2L), (1L, 3L), (2L, 3L)).subsetOf(pairs), pairs.toString)
    assert(!pairs.exists(p => p._1 == 4L || p._2 == 4L),
      s"doc 4 shares no span: $pairs")
  }

  test("verification is character-exact: positions index a real shared span") {
    val k = 10; val w = 5
    val span = "0123456789ABCDEFGHIJKLMNOP"
    val a = "xx" + span + " then unrelated"
    val b = "yyyyyyy" + span + " other tail"
    val docs = Seq((1L, a), (2L, b)).toDF("id", "text")
    val r = TextDedup.dupSpanPairs(docs, "text", "id", k, w).collect()
    assert(r.length == 1)
    val (posA, posB) = (r(0).getAs[Int]("pos_a"), r(0).getAs[Int]("pos_b"))
    assert(a.substring(posA - 1, posA - 1 + k) ==
      b.substring(posB - 1, posB - 1 + k))
  }

  test("hot fingerprints are dropped (boilerplate regime, observable cap)") {
    val k = 10; val w = 5
    val boiler = "BOILERPLATE-FOOTER-" + ("b" * (k + w))
    val docs = (1L to 6L).map(i => (i, s"doc $i unique-part-$i$i$i " + boiler))
      .toDF("id", "text")
    val capped = TextDedup.dupSpanPairs(docs, "text", "id", k, w, maxDocFreq = 2)
    assert(capped.count() == 0, "6-doc boilerplate span must be capped away")
    val uncapped = TextDedup.dupSpanPairs(docs, "text", "id", k, w, maxDocFreq = 64)
    assert(uncapped.count() == 15, "all 15 pairs without the cap")
  }

  test("stripDupSpans: keep-first — the loser's shared run is removed, unique residue survives") {
    val k = 10; val w = 5
    val span = "DUPLICATED-RUN-" + ("d" * 30)   // long shared run
    val a = "winner document unique head " + span + " winner tail"
    val b = "loser-unique-prefix " + span + " loser-unique-suffix"
    val docs = Seq((1L, a), (2L, b), (3L, "unrelated third document text entirely"))
      .toDF("id", "text")
    val out = TextDedup.stripDupSpans(docs, "text", "id", k, w)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    // only the higher-id copy is touched
    assert(out.map(_._1).toSeq == Seq(2L), out.mkString(";"))
    val (_, sites, removed, stripped) = out.head
    assert(sites > 0 && removed > 0)
    // every removed char existed verbatim in the winner: what was
    // removed is a substring-union of the shared run
    assert(!stripped.contains("DUPLICATED-RUN-"), s"run survived: '$stripped'")
    // the loser's unique material survives the strip
    assert(stripped.contains("loser-unique-prefix"), s"lost unique text: '$stripped'")
    assert(stripped.contains("loser-unique-suffix".drop(w - 1).dropRight(0)) ||
      stripped.contains("unique-suffix"), s"edge slack ate the suffix: '$stripped'")
    // winner untouched by construction (absent from output = untouched)
    assert(removed <= a.length)
  }

  test("crossCorpusDupSpans: drop×corpus only, planted re-arrival caught, index frame reused") {
    val k = 10; val w = 5
    val span = "CORPUS-SHARED-SPAN-" + ("c" * (k + w))
    val corpus = Seq(
      (1L, "corpus doc one holds " + span + " inside"),
      (2L, "corpus doc two " + span + " also holds it"),      // corpus×corpus pair NOT reported
      (3L, "corpus doc three shares nothing with anyone here"))
      .toDF("id", "text")
    val drop = Seq(
      (101L, "a re-arrival prefix " + span + " re-arrival tail"),
      (102L, "a completely fresh drop document with novel words only"))
      .toDF("id", "text")
    // the corpus fingerprint frame is an ARGUMENT — computed once,
    // persistable, reused per drop; the contract requires the
    // fp-deduped (min-pos) form
    val cfps = TextDedup.winnowedFingerprints(corpus, "text", "id", k, w,
      dedupeByFp = true)
    val got = TextDedup.crossCorpusDupSpans(drop, corpus, cfps, "text", "id", k, w)
      .select("new_id", "corpus_id").as[(Long, Long)].collect().toSet
    assert(got == Set((101L, 1L), (101L, 2L)), got.toString)
  }

  test("null and sub-k documents emit nothing") {
    val docs = Seq((1L, Some("tiny")), (2L, None), (3L, Some("")))
      .toDF("id", "text")
    assert(TextDedup.winnowedFingerprints(docs, "text", "id", 8, 4).count() == 0)
  }
}
