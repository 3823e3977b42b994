package graft

import graft.operators.Similarity
import graft.pipelines.StudyStartupMerge
import graft.sources.{FileSources, Sinks}
import graft.streaming.EventStreams
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.exchange.Exchange
import java.nio.file.{Files, Paths}

/** Round-2 additions: bucketed co-located joins, native session_window,
  * k-means centroid fit, directory walk (S15), study-startup merge.
  */
class Round2FeaturesSpec extends SparkSpec {
  import spark.implicits._

  test("bucketed tables join with zero Exchange (shuffle paid at write time)") {
    val facts = (1L to 1000L).map(i => (i % 50, s"f$i", i * 1.5)).toDF("k", "tag", "amt")
    val dims = (0L until 50L).map(i => (i, s"dim$i")).toDF("k", "name")
    // drop catalog entries AND orphaned warehouse dirs from prior sessions
    Seq("b_facts", "b_dims").foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val loc = new java.io.File(s"spark-warehouse/$t")
      if (loc.exists()) {
        def rm(f: java.io.File): Unit = {
          if (f.isDirectory) f.listFiles().foreach(rm)
          f.delete()
        }
        rm(loc)
      }
    }
    Sinks.writeBucketed(facts, "b_facts", Seq("k"), 8, Seq("k"))
    Sinks.writeBucketed(dims, "b_dims", Seq("k"), 8, Seq("k"))
    val j = spark.table("b_facts").join(spark.table("b_dims"), Seq("k"))
    // force a non-broadcast join so co-location is what's being tested
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val exchanges = j.queryExecution.executedPlan.collect { case e: Exchange => e }
      assert(exchanges.isEmpty,
        s"expected no Exchange on co-bucketed join:\n${j.queryExecution.executedPlan}")
      assert(j.count() == 1000)
    } finally spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
  }

  test("sessionizeNative (session_window) matches sessionizeBatch off-boundary") {
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val events = Seq(
      (1L, ts("2024-01-01 10:00:00"), 1.0), (1L, ts("2024-01-01 10:10:00"), 2.0),
      (1L, ts("2024-01-01 11:00:00"), 3.0), // > 30m after: new session
      (2L, ts("2024-01-01 09:00:00"), 4.0),
      (2L, ts("2024-01-01 09:29:00"), 5.0)  // in gap: same session
    ).toDF("user_id", "ts", "value")
    val native = EventStreams.sessionizeNative(events, "30 minutes")
      .orderBy("user_id", "session_seq").collect()
    val batch = EventStreams.sessionizeBatch(events, 30 * 60000L)
      .orderBy("user_id", "session_seq").collect()
    assert(native.length == batch.length)
    native.zip(batch).foreach { case (n, b) => assert(n == b, s"$n != $b") }
  }

  test("sessionizeNative on fixture events matches sessionizeBatch (sf0.001)") {
    val ev = Tables.events(spark, sf)
    val native = EventStreams.sessionizeNative(ev, "6 hours")
      .orderBy("user_id", "session_seq").collect()
    val batch = EventStreams.sessionizeBatch(ev, 6 * 3600 * 1000L)
      .orderBy("user_id", "session_seq").collect()
    assert(native.length == batch.length, s"${native.length} vs ${batch.length}")
    native.zip(batch).foreach { case (n, b) => assert(n == b, s"$n != $b") }
  }

  test("fitCentroids converges to cluster means; fitted IVF recalls brute-force top hit") {
    // three tight clusters in 4d
    def jitter(base: Array[Double], i: Int): Array[Float] =
      base.zipWithIndex.map { case (v, d) => (v + 0.01 * ((i + d) % 3)).toFloat }
    val a = Array(10.0, 0.0, 0.0, 0.0); val b = Array(0.0, 10.0, 0.0, 0.0)
    val c = Array(0.0, 0.0, 10.0, 0.0)
    val vecs = (0 until 30).map { i =>
      val base = Seq(a, b, c)(i % 3)
      ((i + 1).toLong, jitter(base, i))
    }.toDF("vec_id", "embedding")
    val cents = Similarity.fitCentroids(vecs, "vec_id", "embedding", k = 3, iters = 5)
    val got = cents.collect().map(_.getSeq[Double](1))
    assert(got.length == 3)
    // each fitted centroid is dominated by exactly one axis (clusters found)
    val axes = got.map(v => v.indexOf(v.max)).toSet
    assert(axes.size == 3, s"centroids collapsed: ${got.map(_.mkString(",")).mkString(" | ")}")

    // IVF with fitted centroids reproduces brute-force top-1
    val queries = vecs.filter(col("vec_id") <= 3)
    val bf = Similarity.bruteForceTopK(vecs, queries, "vec_id", "embedding", k = 1)
      .select("query_id", "neighbor_id").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val ivf = Similarity.ivfTopK(vecs, queries,
      cents.select(col("cent_id").as("vec_id"), col("centroid").as("embedding")),
      "vec_id", "embedding", k = 1, nprobe = 1)
      .select("query_id", "neighbor_id").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(bf == ivf, s"$bf vs $ivf")
  }

  test("k-means|| init: log-round bound, beats hash-order seeding, deterministic") {
    // ⌈log₂ k⌉ rounds — 2 passes for k=4, 6 for k=64, vs k passes before
    assert(Similarity.initRounds(2) == 1 && Similarity.initRounds(4) == 2)
    assert(Similarity.initRounds(8) == 3 && Similarity.initRounds(64) == 6)
    assert(Similarity.initRounds(1000) == 10)

    // 8 tight, well-separated clusters; hash-order seeds collide into
    // the same cluster with overwhelming probability (8!/8⁸ ≈ 0.2% they
    // don't), which Lloyd + keep-empty-centroids can never repair
    def jitter(axis: Int, i: Int): Array[Float] = {
      val v = Array.fill(8)(0.0)
      v(axis) = 10.0
      v.zipWithIndex.map { case (x, d) => (x + 0.01 * ((i + d) % 3)).toFloat }
    }
    val vecs = (0 until 240).map(i => ((i + 1).toLong, jitter(i % 8, i)))
      .toDF("vec_id", "embedding")

    val fitted = Similarity.fitCentroids(vecs, "vec_id", "embedding", k = 8, iters = 4)
    val axes = fitted.collect().map(_.getSeq[Double](1)).map(v => v.indexOf(v.max)).toSet
    assert(axes.size == 8, s"k-means|| init missed clusters: $axes")

    // same Lloyd budget from naive hash-order seeds
    val naiveSeeds = Similarity.fitCentroidsSeeded(vecs, "vec_id", "embedding",
      seeds = vecs.orderBy(xxhash64(col("vec_id")), col("vec_id")).limit(8)
        .select(col("embedding").cast("array<double>")).collect()
        .map(_.getSeq[Double](0).toSeq).toSeq, iters = 4)
    def cost(c: org.apache.spark.sql.DataFrame): Double =
      Similarity.inertia(vecs, "vec_id", "embedding", c).head().getDouble(0)
    val (fit, naive) = (cost(fitted), cost(naiveSeeds))
    assert(fit <= naive, s"k-means|| inertia $fit worse than hash-order $naive")

    // determinism: a second fit is bit-identical
    val again = Similarity.fitCentroids(vecs, "vec_id", "embedding", k = 8, iters = 4)
    assert(fitted.collect().toSeq == again.collect().toSeq)
  }

  test("lshNearDupPairs recalls planted near-dups found by the exact oracle path") {
    // 20 base vectors + a tiny-jitter copy of each (cosine ≈ 0.999);
    // unrelated vectors are hash-random and far apart
    def pseudo(i: Int, d: Int): Double =
      (scala.util.hashing.MurmurHash3.productHash((i, d)).toDouble / Int.MaxValue)
    val dim = 16
    val rows = (0 until 20).flatMap { i =>
      val base = Array.tabulate(dim)(d => pseudo(i, d).toFloat)
      val near = base.zipWithIndex.map { case (v, d) => v + 0.005f * ((d % 3) - 1) }
      Seq(((2 * i + 1).toLong, base), ((2 * i + 2).toLong, near))
    }.toDF("vec_id", "embedding")

    val exact = Similarity.cosinePairsExact(rows, "vec_id", "embedding", 0.99)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.size >= 20, s"expected the 20 planted pairs, got ${exact.size}")
    val lsh = Similarity.lshNearDupPairs(rows, "vec_id", "embedding", 0.99,
      nbits = 8, dim = dim)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // every LSH pair is verified by the same dot product → no false positives
    assert(lsh.subsetOf(exact), s"false positives: ${lsh -- exact}")
    val recall = lsh.intersect(exact).size.toDouble / exact.size
    assert(recall >= 0.8, s"LSH recall $recall below 0.8 (${lsh.size}/${exact.size})")

    // default nbits (0 = auto-sized from the corpus count) keeps the
    // same no-false-positive + recall contract — the r16 verdict item 2
    // sizing rule made code; 40 vectors → autoNbits = ceil(log2 40)+3 = 9
    val auto = Similarity.lshNearDupPairs(rows, "vec_id", "embedding", 0.99,
      dim = dim)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(auto.subsetOf(exact), s"auto-nbits false positives: ${auto -- exact}")
    assert(auto.intersect(exact).size.toDouble / exact.size >= 0.8,
      s"auto-nbits recall below 0.8 (${auto.size}/${exact.size})")
  }

  test("autoNbits pins the ceil-log2+3 rule: floor clamp, loud refusal past 30") {
    // the DuckDB replay derives the SAME integer from count(*) (MIN over
    // shifted powers of two) — these pins are the cross-engine contract
    assert(Similarity.ceilLog2(1) == 0)        // 2^0 >= 1, same as the
    // oracle's MIN-over-powers form (the old 64-nlz form returned 1)
    assert(Similarity.ceilLog2(2) == 1 && Similarity.ceilLog2(1024) == 10 &&
      Similarity.ceilLog2(1025) == 11)
    assert(Similarity.autoNbits(1) == 8)       // clamp floor
    assert(Similarity.autoNbits(40) == 9)      // ceil(log2 40)=6, +3
    assert(Similarity.autoNbits(550) == 13)    // sf0.01 planted union
    assert(Similarity.autoNbits(2200) == 15)   // sf0.1 planted union
    assert(Similarity.autoNbits(22000) == 18)  // sf1
    assert(Similarity.autoNbits(220000) == 21) // sf10
    assert(Similarity.autoNbits(1024) == 13 && Similarity.autoNbits(1025) == 14)
    assert(Similarity.autoNbits(1L << 27) == 30) // largest auto-sizable corpus
    // past 2^27 vectors the auto rule REFUSES instead of silently
    // clamping at 30 (which would re-quadratic the candidate join) —
    // the r17 verdict item 3 guard
    val refusal = intercept[IllegalArgumentException] {
      Similarity.autoNbits((1L << 27) + 1)
    }
    assert(refusal.getMessage.contains("nbits explicitly"))
    intercept[IllegalArgumentException] { Similarity.autoNbits(1L << 40) }
  }

  test("walkFiles inventories a nested tree with depth and metadata (S15)") {
    val root = Files.createTempDirectory("walk").toString
    Files.createDirectories(Paths.get(s"$root/pi1/protocolA"))
    Files.createDirectories(Paths.get(s"$root/pi2"))
    Files.writeString(Paths.get(s"$root/top.txt"), "t")
    Files.writeString(Paths.get(s"$root/pi1/a.txt"), "aa")
    Files.writeString(Paths.get(s"$root/pi1/protocolA/deep.txt"), "dddd")
    Files.writeString(Paths.get(s"$root/pi2/b.txt"), "b")
    val inv = FileSources.walkFiles(spark, root)
    assert(inv.count() == 4)
    val byName = inv.collect().map(r => r.getString(1) -> r).toMap
    assert(byName("top.txt").getInt(2) == 0)
    assert(byName("a.txt").getInt(2) == 1)
    assert(byName("deep.txt").getInt(2) == 2)
    assert(byName("deep.txt").getLong(3) == 4L) // size
    // maxDepth prunes
    assert(FileSources.walkFiles(spark, root, maxDepth = 1).count() == 3)
  }

  test("StudyStartupMerge: tags, continued row ids, union-on-common, column recovery") {
    val appian = Seq(("S1", "2024-01-01", "active"), ("S2", "2024-01-02", "active"))
      .toDF("study", "start", "status")
    val legacy = Seq(("S3", "2020-05-01", "1999-12-31"), ("S4", "2020-06-01", "2001-06-30"))
      .toDF("study", "start", "Study Closed Date")
    val merged = StudyStartupMerge.merge(appian, legacy, Seq(col("study")),
      recoverCol = Some("Study Closed Date"))
    val rows = merged.orderBy("row_id").collect()
    assert(rows.length == 4)
    // continued ids: appian 1..2, legacy 3..4
    assert(rows.map(_.getAs[Long]("row_id")).toSeq == Seq(1L, 2L, 3L, 4L))
    assert(rows.map(_.getAs[Int]("isLegacy")).toSeq == Seq(0, 0, 1, 1))
    // union kept only common columns (status dropped) + recovery merged back
    assert(!merged.columns.contains("status"))
    assert(merged.columns.contains("Study Closed Date"))
    assert(rows(2).getAs[String]("Study Closed Date") == "1999-12-31")
    assert(rows(0).getAs[String]("Study Closed Date") == null) // appian: no closed date
    assert(rows(0).getAs[String]("_merge") == "left_only")
    assert(rows(3).getAs[String]("_merge") == "both")
  }
}
