package graft

import graft.pipelines.IncrementalCuration
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The incremental-curation capstone's identity contract: for every
  * published version, the incrementally-maintained edge ledger and the
  * curated assignment must be ROW-IDENTICAL to a full recompute over
  * that version's corpus — with adds, in-place revisions, AND removals
  * exercised at each transition (q_inc_curate carries the cross-engine
  * DuckDB proof of the same identity; this spec drives the Versioned
  * publish wrapper and the intermediate versions the oracle can't see).
  */
class IncrementalCurationSpec extends SparkSpec {
  import spark.implicits._

  // Near-dup fixture: docs 1/2 near-dups (one word differs in 12),
  // 3 a revision target, 4/5 exact twins, 6+ singletons. Texts are 12+
  // words so 3-shingle Jaccard is meaningful.
  private def doc(id: Long, tail: String) =
    (id, s"alpha bravo charlie delta echo foxtrot golf hotel india juliet kilo $tail")

  private val v1 = Seq(
    doc(1L, "lima mike"), doc(2L, "lima mike"),          // exact twins
    doc(3L, "november oscar papa"),
    doc(4L, "quebec romeo sierra"),
    doc(5L, "tango uniform victor"),
    doc(6L, "whiskey xray yankee")
  ).toDF("doc_id", "text")

  // v2: doc 4 REMOVED; doc 3 REVISED into a near-dup of 5's family;
  // docs 7 (twin of 1) and 8 (singleton) ADDED
  private val v2 = Seq(
    doc(1L, "lima mike"), doc(2L, "lima mike"),
    doc(3L, "tango uniform victor zulu"),                // revised
    doc(5L, "tango uniform victor"),
    doc(6L, "whiskey xray yankee"),
    doc(7L, "lima mike"),                                // added twin of 1/2
    doc(8L, "one two three")                             // added singleton
  ).toDF("doc_id", "text")

  // v3: doc 2 REMOVED (was a cluster member); doc 6 REVISED to join the
  // 1/7 twin cluster; doc 9 ADDED as a twin of 8
  private val v3 = Seq(
    doc(1L, "lima mike"),
    doc(3L, "tango uniform victor zulu"),
    doc(5L, "tango uniform victor"),
    doc(6L, "lima mike"),                                // revised into twins
    doc(7L, "lima mike"),
    doc(8L, "one two three"),
    doc(9L, "one two three")                             // added twin of 8
  ).toDF("doc_id", "text")

  private def sortedRows(df: DataFrame) =
    df.orderBy(df.columns.map(col): _*).collect().toSeq

  private def assertIdentity(corpus: DataFrame, edges: DataFrame,
                             curated: DataFrame, label: String): Unit = {
    val fullE = IncrementalCuration.fullEdges(corpus, "text", "doc_id")
    assert(sortedRows(edges) === sortedRows(fullE), s"$label: edge ledger")
    val fullC = IncrementalCuration.curatedFromEdges(corpus, "doc_id", fullE)
    assert(sortedRows(curated) === sortedRows(fullC), s"$label: curation")
  }

  test("3-version publish chain: each version identical to full recompute") {
    val root = java.nio.file.Files.createTempDirectory("inc-cur").toString
    assert(IncrementalCuration.bootstrap(v1, root, "text", "doc_id") === 0)
    assert(IncrementalCuration.publishIncrement(v2, root, "text", "doc_id") === 1)
    assert(IncrementalCuration.publishIncrement(v3, root, "text", "doc_id") === 2)

    for ((corpus, seq) <- Seq(v1 -> 0, v2 -> 1, v3 -> 2))
      assertIdentity(corpus,
        IncrementalCuration.edgesAt(spark, root, seq),
        IncrementalCuration.curatedAt(spark, root, seq), s"v$seq")

    // the fixture actually exercised every transition class
    val cur2 = IncrementalCuration.curatedAt(spark, root, 2)
    // clusters at v3: {1,6,7} (6,7 non-canonical), {3,5} (5 non-canonical
    // — 3 is the min id), {8,9} (9 non-canonical)
    assert(cur2.filter(!col("is_canonical")).count() === 4)
    // removal respected: doc 4 gone from v1 onward, doc 2 gone at v3
    assert(cur2.filter(col("doc_id").isin(2L, 4L)).count() === 0)
    // revision respected: 3 now clusters with 5 (near-dup after revision)
    val c3 = cur2.filter(col("doc_id") === 3L).select("cluster_id")
      .as[Long].head()
    assert(c3 === 3L || c3 === 5L)
    val c5 = cur2.filter(col("doc_id") === 5L).select("cluster_id")
      .as[Long].head()
    assert(c3 === c5, "revised doc 3 must share doc 5's cluster")
  }

  test("only the delta pays pair generation (stale edges dropped, kept edges survive)") {
    // drive incrementEdges directly: v1 -> v2 with a poisoned prevEdges
    // row touching the removed doc 4 and the revised doc 3 — both must
    // vanish; the 1-2 twin edge must survive untouched
    val e1 = IncrementalCuration.fullEdges(v1, "text", "doc_id")
    val e2 = IncrementalCuration.incrementEdges(v1, v2, e1, "text", "doc_id")
    val rows = e2.as[(Long, Long)].collect().toSet
    assert(rows.contains((1L, 2L)), "unchanged twin edge must be kept")
    assert(!rows.exists(r => r._1 == 4L || r._2 == 4L), "removed doc's edges")
    // new docs' edges present: 7 twins 1 and 2
    assert(rows.contains((1L, 7L)) && rows.contains((2L, 7L)))
  }

  test("ledger identity is robust to an id-disjointness violation guard case") {
    // jaccardPairsCross filters self-pairs defensively: feeding the same
    // frame on both sides yields only cross pairs among distinct ids
    val x = graft.operators.TextDedup.jaccardPairsCross(v1, v1, "text", "doc_id")
    assert(x.filter(col("new_id") === col("corpus_id")).count() === 0)
  }

  test("shingle store: valid segments ≡ in-flight shingles at every version") {
    // the r17-item-2 induction: segments + tombstones replayed through
    // validShingles/validSizes must be ROW-IDENTICAL (incl. multiplicity)
    // to hashing each version's corpus text directly
    import graft.operators.TextDedup
    var st = IncrementalCuration.bootstrapState(v1, "text", "doc_id")
    for ((prev, cur, label) <- Seq((v1, v2, "v1"), (v2, v3, "v2"))) {
      assert(sortedRows(IncrementalCuration.validShingles(st)) ===
        sortedRows(TextDedup.hashedShingles(prev, "text", "doc_id")),
        s"$label: shingle store diverged from in-flight hashing")
      assert(sortedRows(IncrementalCuration.validSizes(st)) ===
        sortedRows(TextDedup.shingleSizes(prev, "text", "doc_id")),
        s"$label: size store diverged")
      st = IncrementalCuration.applyTransition(st,
        IncrementalCuration.transitionState(prev, cur, st, "text", "doc_id"),
        _.localCheckpoint())
    }
    assert(sortedRows(IncrementalCuration.validShingles(st)) ===
      sortedRows(TextDedup.hashedShingles(v3, "text", "doc_id")))
    // and the transitioned ledger matches the full recompute at v3
    assert(sortedRows(st.edges) ===
      sortedRows(IncrementalCuration.fullEdges(v3, "text", "doc_id")))
  }

  test("jaccardPairsCrossStored ≡ jaccardPairsCross on the same inputs") {
    import graft.operators.TextDedup
    val delta = v2.filter(col("doc_id").isin(7L, 8L))
    val unchanged = v2.filter(!col("doc_id").isin(7L, 8L))
    assert(sortedRows(TextDedup.jaccardPairsCrossStored(delta,
        TextDedup.hashedShingles(unchanged, "text", "doc_id"),
        TextDedup.shingleSizes(unchanged, "text", "doc_id"),
        "text", "doc_id")) ===
      sortedRows(TextDedup.jaccardPairsCross(delta, unchanged, "text", "doc_id")))
  }

  test("pure-add release publishes corpus and ledger as deltas, not rewrites") {
    val root = java.nio.file.Files.createTempDirectory("inc-cur-delta").toString
    IncrementalCuration.bootstrap(v1, root, "text", "doc_id")
    // a pure-add drop: v1 plus two docs (one twin of 1, one singleton)
    val v1plus = v1.unionByName(Seq(
      doc(7L, "lima mike"), doc(8L, "one two three")).toDF("doc_id", "text"))
    assert(IncrementalCuration.publishIncrement(v1plus, root, "text", "doc_id") === 1)
    // delta-proportional: the corpus v00001 dir holds ONLY the 2 new docs
    assert(spark.read.parquet(s"$root/corpus/v00001").count() === 2)
    // but the published version reads as the full corpus
    assert(graft.sources.Sinks.Versioned.read(spark, s"$root/corpus").count() === 8)
    assertIdentity(v1plus,
      IncrementalCuration.edgesAt(spark, root, 1),
      IncrementalCuration.curatedAt(spark, root, 1), "pure-add v1")
  }

  test("publishDrop ≡ publishIncrement on a pure-add drop; idempotent; partial overlap refused") {
    val drop = Seq(doc(7L, "lima mike"), doc(8L, "one two three"))
      .toDF("doc_id", "text")
    val v1plus = v1.unionByName(drop)

    // reference: the diff-based publish of the same drop
    val refRoot = java.nio.file.Files.createTempDirectory("drop-ref").toString
    IncrementalCuration.bootstrap(v1, refRoot, "text", "doc_id")
    IncrementalCuration.publishIncrement(v1plus, refRoot, "text", "doc_id")

    val root = java.nio.file.Files.createTempDirectory("drop-fast").toString
    IncrementalCuration.bootstrap(v1, root, "text", "doc_id")
    assert(IncrementalCuration.publishDrop(drop, root, "text", "doc_id") === 1)
    for (store <- Seq("corpus", "edges", "curated", "sh", "sz"))
      assert(sortedRows(graft.sources.Sinks.Versioned.readAt(spark, s"$root/$store", 1)) ===
        sortedRows(graft.sources.Sinks.Versioned.readAt(spark, s"$refRoot/$store", 1)),
        s"publishDrop diverged from publishIncrement on $store")

    // re-publishing the SAME drop (the restart-after-crash shape) is a
    // no-op returning the live seq — no duplicate version
    assert(IncrementalCuration.publishDrop(drop, root, "text", "doc_id") === 1)
    assert(graft.sources.Sinks.Versioned.versions(spark, s"$root/corpus") === Seq(0, 1))

    // partial overlap is a contract violation, refused loudly
    val partial = drop.unionByName(Seq(doc(9L, "brand new")).toDF("doc_id", "text"))
    val e = intercept[IllegalArgumentException] {
      IncrementalCuration.publishDrop(partial, root, "text", "doc_id")
    }
    assert(e.getMessage.contains("pure-add"))
  }

  test("heal rolls a torn publish forward to an identical version") {
    // simulate every crash window: publish v1 fully, then write ONLY a
    // prefix of v2's stores (corpus, or corpus+edges, ...) and let heal
    // complete the rest — the healed version must equal a clean publish
    val cleanRoot = java.nio.file.Files.createTempDirectory("inc-heal-clean").toString
    IncrementalCuration.bootstrap(v1, cleanRoot, "text", "doc_id")
    IncrementalCuration.publishIncrement(v2, cleanRoot, "text", "doc_id")

    for (prefixLen <- 1 to 5) {
      val root = java.nio.file.Files.createTempDirectory(s"inc-heal-$prefixLen").toString
      IncrementalCuration.bootstrap(v1, root, "text", "doc_id")
      // a torn publish = the first prefixLen stores at seq 1 (write
      // order corpus, edges, sh, sz, tomb, curated)
      val st = IncrementalCuration.readState(spark, root)
      val t = IncrementalCuration.transitionState(v1, v2, st, "text", "doc_id")
      val Sinks = graft.sources.Sinks
      val stores: Seq[() => Unit] = Seq(
        () => { Sinks.Versioned.write(v2, s"$root/corpus"): Unit },
        () => { Sinks.Versioned.write(t.edges, s"$root/edges"): Unit },
        () => { Sinks.Versioned.writeDelta(t.shingleDelta, s"$root/sh"): Unit },
        () => { Sinks.Versioned.writeDelta(t.sizeDelta, s"$root/sz"): Unit },
        () => { Sinks.Versioned.writeDelta(t.tombDelta, s"$root/tomb"): Unit })
      stores.take(prefixLen).foreach(_.apply())
      // ...crash here; heal completes the suffix
      val healed = IncrementalCuration.heal(spark, root, "text", "doc_id")
      assert(healed === 6 - prefixLen, s"prefix $prefixLen healed $healed")
      assert(IncrementalCuration.heal(spark, root, "text", "doc_id") === 0)
      for (store <- Seq("edges", "curated", "sh", "sz", "tomb"))
        assert(sortedRows(Sinks.Versioned.readAt(spark, s"$root/$store", 1)) ===
          sortedRows(Sinks.Versioned.readAt(spark, s"$cleanRoot/$store", 1)),
          s"prefix $prefixLen: healed $store diverged from a clean publish")
      // and the pipeline continues normally after the heal
      assert(IncrementalCuration.publishIncrement(v3, root, "text", "doc_id") === 2)
      assertIdentity(v3,
        IncrementalCuration.edgesAt(spark, root, 2),
        IncrementalCuration.curatedAt(spark, root, 2), s"prefix $prefixLen v3")
    }
  }
}
