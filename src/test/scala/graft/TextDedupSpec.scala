package graft

import graft.functions.TextFunctions
import graft.operators.{Similarity, TextDedup}
import org.apache.spark.sql.functions._

/** Training-data operators: shingles, MinHash/SimHash dedup, ANN. */
class TextDedupSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Seq(
    (0L, "the quick brown fox jumps over the lazy dog"),
    (1L, "the quick brown fox jumps over the lazy cat"),   // near-dup of 0
    (2L, "completely different text with other words entirely present"),
    (3L, "the quick brown fox jumps over the lazy dog")    // exact dup of 0
  ).toDF("doc_id", "text")

  test("shingles: n-grams, short docs yield empty array not descending seq") {
    val got = Seq("a b c d", "a b").toDF("t")
      .select(TextFunctions.shingles(col("t"), 3).as("s")).collect()
    assert(got(0).getSeq[String](0).toSet == Set("a_b_c", "b_c_d"))
    assert(got(1).getSeq[String](0).isEmpty)
  }

  test("exactGroups collapses exact duplicates") {
    val got = TextDedup.exactGroups(docs, "text", "doc_id")
    assert(got.count() == 3)
    val g = got.filter(col("n_copies") === 2).head()
    assert(g.getLong(1) == 0L && g.getLong(2) == 2L)
  }

  test("jaccardPairs finds near-dups and exact dups") {
    val pairs = TextDedup.jaccardPairs(docs, "text", "doc_id", n = 3, threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((0L, 3L)))  // exact dup → jaccard 1.0
    assert(pairs.contains((0L, 1L)))  // near dup
    assert(!pairs.exists(p => p._1 == 2L || p._2 == 2L))
  }

  test("minhash LSH recovers the exact-dup pair with est_jaccard 1.0") {
    val pairs = TextDedup.minhashLshPairs(docs, "text", "doc_id",
      n = 3, k = 32, bands = 8, threshold = 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(pairs.exists(p => p._1 == 0L && p._2 == 3L && p._3 == 1.0))
  }

  test("simhash: identical docs hamming 0; near-dups close; others far") {
    val sigs = TextDedup.simhashSignatures(docs, "text", "doc_id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sigs(0L) == sigs(3L))
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(sigs(0L), sigs(1L)) < ham(sigs(0L), sigs(2L)))
  }

  test("bruteForceTopK: self-similarity excluded, ranks dense from 1") {
    val e = Tables.embeddings(spark, sf)
    val got = Similarity.bruteForceTopK(e, e.filter(col("vec_id") < 3),
      "vec_id", "embedding", k = 3).collect()
    assert(got.length == 9)
    assert(got.forall(r => r.getLong(0) != r.getLong(2)))
    val ranks = got.groupBy(_.getLong(0)).values.map(_.map(_.getInt(1)).sorted.toSeq)
    assert(ranks.forall(_ == Seq(1, 2, 3)))
  }

  test("ivfTopK with all-centroid probe ≈ brute force on top hit") {
    val e = Tables.embeddings(spark, sf)
    val queries = e.filter(col("vec_id") < 3)
    val cents = e.filter(col("vec_id") % 10 === 0)
    val ivf = Similarity.ivfTopK(e, queries, cents, "vec_id", "embedding",
      k = 3, nprobe = 50)   // probe everything → exact
    val bf = Similarity.bruteForceTopK(e, queries, "vec_id", "embedding", k = 3)
    // with every centroid probed the candidate set is the full corpus
    val ivfTop = ivf.filter(col("rank") === 1).orderBy("query_id")
      .collect().map(_.getLong(2)).toSeq
    val bfTop = bf.filter(col("rank") === 1).orderBy("query_id")
      .collect().map(_.getLong(2)).toSeq
    assert(ivfTop == bfTop)
  }

  test("containmentPairs catches a quoted subset that jaccard misses") {
    val base = Seq.tabulate(40)(i => s"w$i").mkString(" ")
    val quote = Seq.tabulate(10)(i => s"w$i").mkString(" ")  // first 10 words verbatim
    val corpus = Seq((1L, base), (2L, quote), (3L, "entirely unrelated other words here now"))
      .toDF("doc_id", "text")
    // doc 2's 8 shingles all appear in doc 1 → containment 1.0;
    // jaccard = 8/38 ≈ 0.21 — invisible at any sane jaccard threshold
    val cont = TextDedup.containmentPairs(corpus, "text", "doc_id", n = 3, threshold = 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(cont.toSeq == Seq((1L, 2L, 1.0)))
    val jac = TextDedup.jaccardPairs(corpus, "text", "doc_id", n = 3, threshold = 0.5)
    assert(jac.count() == 0)
  }

  test("contaminationReport flags docs sharing eval n-grams, with exact counts") {
    val corpus = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),   // contains eval 4-grams
      (2L, "one two three four five six seven"),     // clean
      (3L, "alpha beta gamma delta unrelated tail")  // one shared 4-gram
    ).toDF("doc_id", "text")
    val eval = Seq((100L, "alpha beta gamma delta epsilon")).toDF("doc_id", "text")
    val got = TextDedup.contaminationReport(corpus, eval, "text", "doc_id", n = 4)
      .orderBy("doc_id").collect()
    // doc 1: grams {a_b_g_d, b_g_d_e, g_d_e_z}; eval has {a_b_g_d, b_g_d_e} → 2/3
    assert(got.map(_.getLong(0)).toSeq == Seq(1L, 3L))
    assert(got(0).getLong(1) == 2L && got(0).getLong(2) == 3L)
    assert(got(1).getLong(1) == 1L && got(1).getLong(2) == 3L)
  }

  test("quantizedTopK: int8 scores track exact cosine (recall@5 and score error)") {
    val e = Tables.embeddings(spark, sf)
    val queries = e.filter(col("vec_id") < 5)
    val qz = Similarity.quantizedTopK(e, queries, "vec_id", "embedding", k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getDouble(3)))
    val bf = Similarity.bruteForceTopK(e, queries, "vec_id", "embedding", k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getDouble(3)))
    // recall@5: quantization on unit vectors moves each score by ≤
    // dim·(scale/2)² + cross terms ~ 1e-2 — neighbors deep in the list
    // can swap, the set stays nearly identical
    val qSets = qz.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val bSets = bf.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val recall = bSets.map { case (q, s) =>
      qSets(q).intersect(s).size.toDouble / s.size }.sum / bSets.size
    assert(recall >= 0.8, s"quantized recall@5 too low: $recall")
    // per-pair score error bound on the pairs both paths ranked
    val bfScore = bf.map(t => (t._1, t._2) -> t._3).toMap
    qz.foreach { case (q, n, sim) =>
      bfScore.get((q, n)).foreach { exact =>
        assert(math.abs(sim - exact) < 0.05, s"($q,$n): int8 $sim vs exact $exact")
      }
    }
  }

  test("quantized: tinyint codes in [-127,127], dequantized error ≤ scale/2") {
    val e = Tables.embeddings(spark, sf).limit(50)
    val got = Similarity.quantized(e, "vec_id", "embedding", "id", "scale", "q")
      .collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      val codes = r.getSeq[Byte](2)
      assert(codes.forall(c => c >= -127 && c <= 127))
      assert(codes.exists(c => math.abs(c.toInt) == 127),
        "max-|x| component must hit full range")
    }
  }

  test("IVF index persists: parquet round-trip of the assignment probes identically") {
    val e = Tables.embeddings(spark, sf)
    val queries = e.filter(col("vec_id") < 3)
    val cents = e.filter(col("vec_id") % 10 === 0)
    val index = Similarity.assignToCentroids(e, cents, "vec_id", "embedding")
    val dir = java.nio.file.Files.createTempDirectory("ivf_index").toString
    // partitioned by centroid: a probe with nprobe centroids reads only
    // those partitions — the index layout the operator documents
    index.write.partitionBy("cent_id").mode("overwrite").parquet(s"$dir/idx")
    val reloaded = spark.read.parquet(s"$dir/idx")
    def run(ix: org.apache.spark.sql.DataFrame) =
      Similarity.ivfTopKAssigned(ix, queries, cents, "vec_id", "embedding",
        k = 3, nprobe = 2)
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
        .sortBy(t => (t._1, t._2)).toSeq
    assert(run(reloaded) == run(index))
  }

  test("IVF hot-cell guard: report ranks cells, cap drops whole cells only") {
    val e = Tables.embeddings(spark, sf)
    val queries = e.filter(col("vec_id") < 3)
    val cents = e.filter(col("vec_id") % 100 === 0) // few centroids → fat cells
    val index = Similarity.assignToCentroids(e, cents, "vec_id", "embedding")

    val report = Similarity.ivfCellReport(index).collect()
    assert(report.map(_.getLong(1)).sum <= e.count())
    assert(report.map(_.getLong(1)).toSeq == report.map(_.getLong(1)).toSeq.sortBy(-_),
      "report must rank cells by occupancy")

    val sizes = index.groupBy("cent_id").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val cap = sizes.values.toSeq.sorted.apply(sizes.size / 2) // median occupancy
    val surviving = sizes.filter(_._2 <= cap).keySet
    val capped = Similarity.ivfTopKAssigned(index, queries, cents,
      "vec_id", "embedding", k = 5, nprobe = sizes.size, maxCellSize = cap)
    // with every centroid probed, results must draw exactly from the
    // surviving cells: a capped cell contributes NO neighbors, a kept
    // cell's members are still reachable
    val gotNeighbors = capped.select("neighbor_id").collect().map(_.getLong(0)).toSet
    val keptMembers = index.filter(col("cent_id").isin(surviving.toSeq: _*))
      .select("neighbor_id").collect().map(_.getLong(0)).toSet
    assert(gotNeighbors.subsetOf(keptMembers),
      "capped probe returned a neighbor from a dropped cell")
    assert(gotNeighbors.nonEmpty, "cap dropped everything")
    // default stays exact: maxCellSize = 0 ≡ the uncapped probe
    val plain = Similarity.ivfTopKAssigned(index, queries, cents,
      "vec_id", "embedding", k = 5, nprobe = 2)
    val plainDefault = Similarity.ivfTopKAssigned(index, queries, cents,
      "vec_id", "embedding", k = 5, nprobe = 2, maxCellSize = 0L)
    assert(plain.collect().toSeq == plainDefault.collect().toSeq)
  }

  test("crossCorpusNearDups: new batch screens against corpus, old pairs not re-reported") {
    val corpus = Seq(
      (1L, "the quick brown fox jumps over the lazy dog tonight"),
      (2L, "the quick brown fox jumps over the lazy dog tonight"), // internal dup of 1
      (3L, "completely different text with other words entirely present"),
      (4L, "numbers and letters mixed in a unique configuration here")
    ).toDF("doc_id", "text")
    val drop = Seq(
      (100L, "the quick brown fox jumps over the lazy dog tonight"), // re-arrival of 1/2
      (101L, "a genuinely fresh document with brand new content words")
    ).toDF("doc_id", "text")
    val pairs = TextDedup.crossCorpusNearDups(drop, corpus, "text", "doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    // the new doc matches BOTH copies in the corpus at est 1.0; the
    // fresh doc matches nothing; the (1,2) internal pair is absent
    assert(pairs == Set((100L, 1L, 1.0), (100L, 2L, 1.0)), s"got $pairs")
    // hot-bucket cap on the corpus side drops the planted matches
    // loudly (every bucket of the dup pair exceeds cap=1)
    val capped = TextDedup.crossCorpusNearDups(drop, corpus, "text", "doc_id",
      maxBucketSize = 1)
    assert(capped.isEmpty)
  }

  test("bandedSignatures parquet round-trip: reloaded index screens identically") {
    val corpus = Seq(
      (1L, "the quick brown fox jumps over the lazy dog tonight"),
      (2L, "the quick brown fox jumps over the lazy dog tonight"),
      (3L, "completely different text with other words entirely present"),
      (4L, "numbers and letters mixed in a unique configuration here")
    ).toDF("doc_id", "text")
    val drop = Seq(
      (100L, "the quick brown fox jumps over the lazy dog tonight"),
      (101L, "a genuinely fresh document with brand new content words")
    ).toDF("doc_id", "text")
    val index = TextDedup.bandedSignatures(corpus, "text", "doc_id")
    val dir = java.nio.file.Files.createTempDirectory("lsh_index").toString
    // partitioned by band: a drop's bucket join prunes to the bands it
    // actually probes — the cross-drop index layout the operator documents
    index.write.partitionBy("band").mode("overwrite").parquet(s"$dir/idx")
    val reloaded = spark.read.parquet(s"$dir/idx")
    def run(ix: org.apache.spark.sql.DataFrame) =
      TextDedup.crossCorpusNearDupsBanded(drop, ix, "text", "doc_id")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val direct = TextDedup.crossCorpusNearDups(drop, corpus, "text", "doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(run(reloaded) == direct && run(index) == direct,
      s"reloaded=${run(reloaded)} direct=$direct")
    // capped screening works against the reloaded index too
    assert(TextDedup.crossCorpusNearDupsBanded(drop, reloaded, "text", "doc_id",
      maxBucketSize = 1).isEmpty)
  }

  test("langId picks the language with most stopword hits") {
    val got = Seq("the cat and the dog of the house was here it is",
      "el perro y la casa de los gatos no se un",
      "zzz qqq www").toDF("t")
      .select(TextFunctions.langId(col("t")).as("l")).collect().map(_.getString(0))
    assert(got.toSeq == Seq("en", "es", "und"))
  }

  test("lshRecallReport: exact dup always recalled, confusion counts consistent") {
    val r = TextDedup.lshRecallReport(docs, "text", "doc_id",
      n = 3, k = 16, bands = 4, threshold = 0.8).head()
    val (nExact, nLsh, nHit) = (r.getLong(0), r.getLong(1), r.getLong(2))
    // ground truth at 0.8: only the exact dup (0,3) qualifies —
    // (0,1)'s 3-shingle jaccard is 6/8 = 0.75
    assert(nExact == 1L, s"n_exact = $nExact")
    // identical docs have identical signatures → always bucketed
    // together with est 1.0, so the true pair can never be missed
    assert(nHit >= 1L && nHit <= math.min(nExact, nLsh))
    assert(r.getDouble(3) == 1.0, s"recall = ${r.getDouble(3)}")
    val precision = r.getDouble(4)
    assert(precision > 0.0 && precision <= 1.0)
  }

  // Block-level substring dedup fixtures: 4-token blocks; "b1 b2 b3 b4"
  // is a span shared verbatim by docs 10/11/12 at block-aligned offsets.
  private lazy val blockDocs = Seq(
    (10L, "b1 b2 b3 b4 u10 u11 u12 u13"),          // shared block first
    (11L, "v20 v21 v22 v23 b1 b2 b3 b4"),          // shared block second
    (12L, "b1 b2 b3 b4"),                          // ONLY the shared block
    (13L, "w30 w31 w32 w33 w34")                   // unique, partial tail
  ).toDF("doc_id", "text")

  test("blockDedup: globally-first block kept, later copies removed, " +
    "reassembly preserves document order") {
    val got = TextDedup.blockDedup(blockDocs, "text", "doc_id", blockTokens = 4)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4))).toMap
    assert(got(10L) == ((2L, 2L, 0L, "b1 b2 b3 b4 u10 u11 u12 u13")))
    // doc 11 loses the duplicated span but keeps its own prefix
    assert(got(11L) == ((2L, 1L, 4L, "v20 v21 v22 v23")))
    // doc 12 was nothing BUT the duplicated span → empty text, row kept
    assert(got(12L) == ((1L, 0L, 4L, "")))
    // partial final block (1 token) survives untouched
    assert(got(13L) == ((2L, 2L, 0L, "w30 w31 w32 w33 w34")))
  }

  test("blockDedup: within-document repetition also collapses") {
    val d = Seq((1L, "x1 x2 x1 x2 x1 x2")).toDF("doc_id", "text")
    val r = TextDedup.blockDedup(d, "text", "doc_id", blockTokens = 2).head()
    assert(r.getLong(2) == 1L && r.getString(4) == "x1 x2",
      s"expected single kept block, got $r")
  }

  test("stripBoilerplate: hot block removed from EVERY doc including the first") {
    val got = TextDedup.stripBoilerplate(blockDocs, "text", "doc_id",
        blockTokens = 4, minDocFreq = 3)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(2), r.getLong(3), r.getString(4))).toMap
    assert(got(10L) == ((1L, 4L, "u10 u11 u12 u13")))   // first copy gone too
    assert(got(11L) == ((1L, 4L, "v20 v21 v22 v23")))
    assert(got(12L) == ((0L, 4L, "")))
    assert(got(13L)._3 == "w30 w31 w32 w33 w34")        // df 1 < 3 untouched
    // at minDocFreq 4 nothing qualifies → corpus unchanged
    val untouched = TextDedup.stripBoilerplate(blockDocs, "text", "doc_id",
      blockTokens = 4, minDocFreq = 4)
    assert(untouched.filter(col("n_tokens_removed") > 0).count() == 0)
  }

  test("boilerplateReport names the hot block with its frequencies") {
    val rep = TextDedup.boilerplateReport(blockDocs, "text", "doc_id",
      blockTokens = 4, minDocFreq = 3).collect()
    assert(rep.length == 1)
    assert(rep(0).getString(0) == "b1 b2 b3 b4")
    assert(rep(0).getLong(1) == 3L && rep(0).getLong(2) == 3L)
  }

  test("blockDedup accounting invariants hold on the corpus table") {
    val got = TextDedup.blockDedup(Tables.documents(spark, sf), "text",
      "doc_id", blockTokens = 16)
    // kept ≤ total per doc; removed tokens only when blocks were dropped;
    // total kept across the corpus = number of DISTINCT blocks
    assert(got.filter(col("n_blocks_kept") > col("n_blocks")).count() == 0)
    assert(got.filter(col("n_blocks_kept") === col("n_blocks") &&
      col("n_tokens_removed") > 0).count() == 0)
    val kept = got.agg(sum("n_blocks_kept")).head().getLong(0)
    val distinctBlocks = TextDedup.tokenBlocks(
      Tables.documents(spark, sf), "text", "doc_id", 16)
      .select(col("block_text")).distinct().count()
    assert(kept == distinctBlocks, s"kept $kept != distinct $distinctBlocks")
  }

  test("contentDefinedChunks: chunks tile each doc; shared runs chunk identically at any offset") {
    // a varied (non-periodic) shared run, long relative to the window
    val shared = (1 to 10).map(k =>
      s"section $k of the shared body with payload item $k done").mkString(" ")
    val docs = Seq(
      (1L, "pfx " + shared + " tail one"),
      (2L, "a much longer and different prefix here " + shared + " other"),
      (3L, shared),
      (4L, "x"), // single char: one chunk covering it
      (5L, "short doc under the window")
    ).toDF("id", "t")
    val ch = TextDedup.contentDefinedChunks(docs, "t", "id",
        maskBits = 6, windowChars = 16)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getString(3)))
    // tiling: per doc, sorted chunks are contiguous from 1 and cover n
    val lens = Map(1L -> ("pfx " + shared + " tail one").length,
      2L -> ("a much longer and different prefix here " + shared + " other").length,
      3L -> shared.length, 4L -> 1, 5L -> "short doc under the window".length)
    for ((id, n) <- lens) {
      val cs = ch.filter(_._1 == id).sortBy(_._2)
      assert(cs.head._2 == 1 && cs.map(_._3).sum == n &&
        cs.sliding(2).forall {
          case Array(a, b) => b._2 == a._2 + a._3
          case _ => true
        }, s"doc $id chunks don't tile: ${cs.toSeq}")
    }
    // offset invariance: interior chunks of the shared run appear in
    // ALL THREE carriers despite different offsets (expected ~8 cuts
    // at mask 64 over ~530 shared chars)
    val byDoc = ch.groupBy(_._1).map { case (k, v) => k -> v.map(_._4).toSet }
    val common = byDoc(1L) intersect byDoc(2L) intersect byDoc(3L)
    assert(common.size >= 3,
      s"shared run did not produce shared interior chunks: ${common.size}")
    // single char: exactly one chunk, md5 of the char itself
    val c4 = ch.filter(_._1 == 4L)
    assert(c4.length == 1 && c4.head._3 == 1)
    // empty text yields no rows, no throw
    assert(TextDedup.contentDefinedChunks(
      Seq((9L, "")).toDF("id", "t"), "t", "id").isEmpty)
  }
}
