package graft

import graft.operators.Joins
import graft.sources.{Excel, FileSources, Sinks}
import graft.streaming.EventStreams
import org.apache.spark.sql.functions._
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}
import java.util.zip.{ZipEntry, ZipOutputStream}

/** Regression tests for the round-1 code-review findings. */
class ReviewFixesSpec extends SparkSpec {
  import spark.implicits._

  test("redactPii catches phones without a country prefix") {
    val got = Seq(
      "call 415-555-1234 now",
      "call (415) 555-1234 now",
      "call +1 (415) 555-1234 now").toDF("t")
      .select(graft.functions.TextFunctions.redactPii(col("t")).as("r"))
      .collect().map(_.getString(0))
    assert(got.forall(_.contains("<PHONE>")), got.toSeq.toString)
  }

  test("Excel shared strings with embedded newlines keep index alignment") {
    val dir = Files.createTempDirectory("ss").toString
    val path = s"$dir/shared.xlsx"
    // handcraft a workbook using sharedStrings where entry 0 contains \n
    val zos = new ZipOutputStream(new java.io.FileOutputStream(path))
    def put(n: String, c: String): Unit = {
      zos.putNextEntry(new ZipEntry(n)); zos.write(c.getBytes(StandardCharsets.UTF_8)); zos.closeEntry()
    }
    put("[Content_Types].xml",
      """<?xml version="1.0"?><Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types"><Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/><Default Extension="xml" ContentType="application/xml"/><Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/><Override PartName="/xl/worksheets/sheet1.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/></Types>""")
    put("_rels/.rels",
      """<?xml version="1.0"?><Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships"><Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/></Relationships>""")
    put("xl/workbook.xml",
      """<?xml version="1.0"?><workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships"><sheets><sheet name="S" sheetId="1" r:id="rId1"/></sheets></workbook>""")
    put("xl/_rels/workbook.xml.rels",
      """<?xml version="1.0"?><Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships"><Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet1.xml"/></Relationships>""")
    put("xl/sharedStrings.xml",
      "<?xml version=\"1.0\"?><sst><si><t>line1\nline2</t></si><si><t>second</t></si></sst>")
    put("xl/worksheets/sheet1.xml",
      """<?xml version="1.0"?><worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><sheetData><row><c r="A1" t="s"><v>0</v></c><c r="B1" t="s"><v>1</v></c></row><row><c r="A2" t="s"><v>1</v></c><c r="B2" t="s"><v>0</v></c></row></sheetData></worksheet>""")
    zos.close()
    val back = Excel.read(spark, path, headerRows = 0)
    val rows = back.collect()
    assert(rows(0).getString(0) == "line1\nline2" && rows(0).getString(1) == "second")
    assert(rows(1).getString(0) == "second" && rows(1).getString(1) == "line1\nline2")
  }

  test("writeSingleCsv creates missing parent dirs instead of silently losing output") {
    val dir = Files.createTempDirectory("csvp").toString
    val df = Seq((1, "a")).toDF("id", "s")
    Sinks.writeSingleCsv(df, s"$dir/nested/deeper/out.csv")
    assert(Files.isRegularFile(Paths.get(s"$dir/nested/deeper/out.csv")))
  }

  test("saltedJoin rejects join types that null-extend the right side") {
    val l = Seq((1, "a")).toDF("k", "lv")
    val r = Seq((1, "X")).toDF("k", "rv")
    intercept[IllegalArgumentException] {
      Joins.saltedJoin(l, r, "k", 4, "full_outer")
    }
    assert(Joins.saltedJoin(l, r, "k", 4, "left").count() == 1)
  }

  test("writeShards keeps within-file ordering on the shard key") {
    val dir = Files.createTempDirectory("ord").toString
    Sinks.writeShards(Tables.documents(spark, sf), s"$dir/out",
      Seq("lang"), "doc_id", shards = 2)
    // read each physical file alone and assert doc_id is non-decreasing
    val files = Files.walk(Paths.get(s"$dir/out")).iterator()
    var checked = 0
    files.forEachRemaining { f =>
      if (f.toString.endsWith(".parquet")) {
        val ids = spark.read.parquet(f.toString)
          .select("doc_id").collect().map(_.getLong(0))
        assert(ids.sameElements(ids.sorted), s"unsorted shard $f")
        checked += 1
      }
    }
    assert(checked > 0)
  }

  test("UTF-16 CRLF CSV: no trailing CR in the last column") {
    val dir = Files.createTempDirectory("u16crlf").toString
    Files.write(Paths.get(s"$dir/win.csv"),
      "k,v\r\na,1\r\nb,2\r\n".getBytes(StandardCharsets.UTF_16LE))
    val df = FileSources.csvUtf16(spark, s"$dir/win.csv")
    assert(df.columns.toSeq == Seq("k", "v"))
    val vs = df.orderBy("k").collect()
    assert(vs.map(_.get(1).toString).toSeq == Seq("1", "2"), vs.mkString(","))
  }

  test("AsOf.join: null right keys/timestamps never match (ADVICE r1)") {
    import graft.operators.AsOf
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val left = Seq(
      (1L, Some(10L), ts("2024-01-01 12:00:00")),
      (2L, None: Option[Long], ts("2024-01-01 12:00:00"))
    ).toDF("id", "k", "ts")
    val right = Seq(
      (Some(10L), Some(ts("2024-01-01 11:00:00")), 100L, 1.0),  // valid match for id=1
      (Some(10L), None: Option[java.sql.Timestamp], 666L, 6.0), // null ts: never matches
      (None: Option[Long], Some(ts("2024-01-01 10:00:00")), 777L, 7.0) // null key: never matches
    ).toDF("k", "ts", "event_id", "value")
    val out = AsOf.join(left, right, "k", "k", "ts", "ts",
      Seq("event_id", "value"), col("event_id")).orderBy("id").collect()
    assert(out(0).getLong(3) == 100L)       // id=1 matched the valid row
    assert(out(1).isNullAt(3), out(1).toString) // null-key left row: no match
  }

  test("bruteForceTopK: zero vector neither ranks first nor produces NaN sims (ADVICE r1)") {
    import graft.operators.Similarity
    val vecs = Seq(
      (1L, Array(1.0f, 0.0f)), (2L, Array(0.9f, 0.1f)),
      (3L, Array(0.0f, 0.0f)), (4L, Array(0.8f, 0.2f))
    ).toDF("vec_id", "embedding")
    val out = Similarity.bruteForceTopK(vecs, vecs.filter(col("vec_id") === 1),
      "vec_id", "embedding", k = 3).orderBy("rank").collect()
    assert(!out.exists(_.getDouble(3).isNaN), out.mkString(";"))
    assert(out(0).getLong(2) == 2L) // nearest is the similar vector, not the zero one
    assert(out.last.getLong(2) == 3L) // zero vector ranks last (sim 0)
  }

  test("lshBuckets: wrong dim fails loudly instead of collapsing to bucket 0 (ADVICE r1)") {
    import graft.operators.Similarity
    val vecs = Seq((1L, Array.fill(8)(0.5))).toDF("vec_id", "embedding")
    val bad = intercept[Exception] {
      Similarity.lshBuckets(vecs, "vec_id", "embedding", nbits = 4, dim = 16).collect()
    }
    assert(bad.getMessage.contains("lsh_sig") ||
      bad.getCause != null && bad.getCause.getMessage.contains("lsh_sig"),
      bad.getMessage)
    // matching dim works and yields a non-degenerate bucket set
    val ok = Similarity.lshBuckets(vecs, "vec_id", "embedding", nbits = 4, dim = 8).collect()
    assert(ok.length == 1)
  }

  test("jaccardPairs: doc id outside uint32 fails loudly instead of corrupting pairs (ADVICE r1)") {
    import graft.operators.TextDedup
    val docs = Seq(
      (-1L, "a b c d e f g"), (2L, "a b c d e f g")
    ).toDF("doc_id", "text")
    val e = intercept[Exception] {
      TextDedup.jaccardPairs(docs, "text", "doc_id").collect()
    }
    val msg = Option(e.getMessage).getOrElse("") +
      Option(e.getCause).map(_.getMessage).getOrElse("")
    assert(msg.contains("jaccardPairs"), msg)
  }

  test("jaccardPairs: maxPostings drops hot shingles whole; report observes them") {
    import graft.operators.TextDedup
    // 4 docs share shingle set; with maxPostings=3 the shared shingles
    // (posting size 4) are dropped entirely → no pairs survive
    val docs = (1L to 4L).map(i => (i, "common shingle text here okay")).toDF("doc_id", "text")
    assert(TextDedup.jaccardPairs(docs, "text", "doc_id", threshold = 0.1).count() == 6)
    assert(TextDedup.jaccardPairs(docs, "text", "doc_id", threshold = 0.1,
      maxPostings = 3).count() == 0)
    val rep = TextDedup.hotShingleReport(docs, "text", "doc_id", maxPostings = 3).collect()
    assert(rep.nonEmpty && rep.forall(_.getLong(1) == 4L), rep.mkString(";"))
  }

  test("globalRowIds matches row_number semantics without a global window") {
    val df = Seq(("c", 30), ("a", 10), ("b", 20)).toDF("s", "x").repartition(3)
    val got = Joins.globalRowIds(df, Seq(col("s")), "row_id")
      .orderBy("row_id").collect().map(r => (r.getString(0), r.getLong(2)))
    assert(got.toSeq == Seq(("a", 1L), ("b", 2L), ("c", 3L)))
  }

  test("sessionize: out-of-order in-gap event does not shrink the timeout") {
    implicit val sqlCtx = spark.sqlContext
    val src = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, java.sql.Timestamp, Double)]
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    src.addData((1L, ts("2024-01-01 10:00:00"), 1.0), (1L, ts("2024-01-01 10:20:00"), 1.0))
    src.addData((1L, ts("2024-01-01 10:05:00"), 1.0))  // out of order, in gap
    src.addData((1L, ts("2024-01-01 10:45:00"), 1.0))  // within gap of 10:20
    src.addData((1L, ts("2024-01-01 20:00:00"), 1.0))  // far future closes session
    val q = EventStreams.sessionize(spark, src.toDF().toDF("user_id", "ts", "value"),
      gapMs = 30 * 60000)
      .writeStream.format("memory").queryName("ooo_out").outputMode("append").start()
    q.processAllAvailable()
    q.stop()
    val closed = spark.table("ooo_out").collect()
    // all four early events belong to ONE session (10:45 is within 30m of 10:20)
    assert(closed.exists(r => r.getLong(2) == 4), closed.mkString(";"))
  }

  // ---- round-6 review findings ----

  test("kAnonymize: NULL quasi keys partition into kept/suppressed, never vanish") {
    import graft.operators.SchemaOps
    val df = Seq(
      (1L, null, "x"), (2L, null, "x"), (3L, null, "x"),   // NULL cell of 3
      (4L, "a", null),                                     // NULL cell of 1
      (5L, "a", "y"), (6L, "a", "y")                       // plain cell of 2
    ).toDF("id", "g", "s")
    val (kept, sup) = SchemaOps.kAnonymize(df, Seq("g", "s"), k = 2L)
    val keptIds = kept.collect().map(_.getLong(0)).toSet
    assert(keptIds == Set(1L, 2L, 3L, 5L, 6L), keptIds.toString)
    val supRows = sup.collect()
    assert(supRows.length == 1 && supRows(0).getAs[Long]("n_rows") == 1L)
    assert(supRows(0).getAs[String]("g") == "a" && supRows(0).isNullAt(
      supRows(0).fieldIndex("s")))
    // the auditable partition: every input row is in exactly one frame
    assert(keptIds.size + supRows.map(_.getAs[Long]("n_rows")).sum == 6)
  }

  test("bloomPrune: mismatched key widths still find every true match") {
    val bigL = (1L to 500L).map(i => (i, s"row$i")).toDF("k", "payload")  // BIGINT
    val smallI = Seq(3, 250, 499).map(k => (k, s"dim$k")).toDF("dk", "dim") // INT
    val pruned = Joins.bloomPrune(bigL, "k", smallI, "dk",
      expectedItems = 10L, fpp = 0.01)
    // pre-fix: XxHash64(INT 3) != XxHash64(BIGINT 3) → silent false negatives
    assert(pruned.join(smallI, pruned("k") === smallI("dk")).count() == 3)
    val strs = Seq(("3", "s")).toDF("dk", "dim")
    intercept[IllegalArgumentException] {
      Joins.bloomPrune(bigL, "k", strs, "dk")
    }
  }

  test("quantileGate rejects p outside (0, 1]") {
    import graft.operators.TextQuality
    val df = Seq(("en", 5L), ("en", 7L)).toDF("lang", "n")
    intercept[IllegalArgumentException] {
      TextQuality.quantileGate(df, "lang", col("n"), 0.0, col("n"))
    }
    intercept[IllegalArgumentException] {
      TextQuality.quantileGate(df, "lang", col("n"), 1.5, col("n"))
    }
  }

  test("rankSelectPercentiles fails fast in the high-cardinality regime") {
    import graft.operators.Aggs
    val many = spark.range(0, 5000L).selectExpr("id % 4000 as g", "id as v")
    val ex = intercept[IllegalArgumentException] {
      Aggs.rankSelectPercentiles(many, "g", col("v"),
        Seq(0.5 -> "p50"), maxGroups = 1000L)
    }
    assert(ex.getMessage.contains("approx_percentile"), ex.getMessage)
    // the documented regime still works under the same cap
    val few = spark.range(0, 5000L).selectExpr("id % 3 as g", "id as v")
    val out = Aggs.rankSelectPercentiles(few, "g", col("v"),
      Seq(0.5 -> "p50"), maxGroups = 1000L)
    assert(out.count() == 3)
  }

  test("ndjsonWithQuarantine: JSON null / bare scalar lines are quarantined") {
    import org.apache.spark.sql.types._
    val dir = Files.createTempDirectory("jnull").toString
    Files.writeString(Paths.get(s"$dir/drop.ndjson"),
      """{"id": 1, "amount": 10.5}""" + "\n" +
        "null\n" +      // JSON literal null → NULL struct, not corrupt
        "42\n" +        // bare scalar
        """{"id": 2, "amount": 20.0}""" + "\n")
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("amount", DoubleType)))
    val (clean, quarantined) = FileSources.ndjsonWithQuarantine(
      spark, s"$dir/drop.ndjson", schema)
    assert(clean.orderBy("id").collect().map(_.getLong(0)).toSeq == Seq(1L, 2L))
    val bad = quarantined.collect().map(_.getAs[String]("raw_line")).toSet
    assert(bad == Set("null", "42"), bad.toString)
  }

  // ---- round-7 advice fixes ----

  test("joinForward: NULL left timestamp matches nothing") {
    import graft.operators.AsOf
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val left = Seq(
      (1L, 10L, ts("2024-01-01 10:00:00")),
      (2L, 10L, null.asInstanceOf[java.sql.Timestamp]),
      (3L, 20L, null.asInstanceOf[java.sql.Timestamp]))
      .toDF("event_id", "user_id", "ts")
    val right = Seq(
      (100L, 10L, ts("2024-01-01 11:00:00"), 5.0),
      (101L, 20L, ts("2024-01-01 09:00:00"), 9.0))
      .toDF("event_id", "user_id", "ts", "value")
    val got = AsOf.joinForward(left, right, "user_id", "user_id", "ts", "ts",
      Seq("event_id", "value"), col("event_id"))
      .orderBy("event_id").collect()
    assert(got(0).getLong(3) == 100L && got(0).getDouble(4) == 5.0)
    assert(got(1).isNullAt(3) && got(1).isNullAt(4),
      s"null-ts left row absorbed a payload: ${got(1)}")
    assert(got(2).isNullAt(3) && got(2).isNullAt(4),
      s"null-ts left row absorbed a payload: ${got(2)}")
  }

  test("Excel: boolean columns round-trip through write + inferTypes read") {
    import org.apache.spark.sql.types._
    val dir = Files.createTempDirectory("xlsb").toString
    val df = Seq((1L, true, "x"), (2L, false, "y")).toDF("id", "flag", "s")
    Excel.write(df, s"$dir/b.xlsx")
    val typed = Excel.read(spark, s"$dir/b.xlsx", inferTypes = true)
    assert(typed.schema("flag").dataType == BooleanType, typed.schema.treeString)
    val rows = typed.orderBy("id").collect()
    assert(rows(0).getBoolean(1) && !rows(1).getBoolean(1))
  }

  test("CorpusStream first batch accepts docs with a STRING id column") {
    import graft.streaming.CorpusStream
    val docsDir = Files.createTempDirectory("cs-sid").toString
    val stateDir = Files.createTempDirectory("cs-sid-state").toString
    Seq(("a", "the quick brown fox jumps over the lazy dog near the river"),
        ("b", "totally different legal boilerplate about contracts and parties"))
      .toDF("doc_id", "text").coalesce(1).write.parquet(s"$docsDir/d1")
    val schema = spark.read.parquet(s"$docsDir/d1").schema
    // pre-fix this threw at unionByName: first-batch empty corpusPairs
    // hardcoded LongType new_id/corpus_id against string doc_b
    val q = CorpusStream.ingest(spark, s"$docsDir/*/", schema, stateDir,
      threshold = 0.5, maxFilesPerTrigger = 1)
    q.awaitTermination()
    val accepted = spark.read.parquet(s"$stateDir/accepted")
      .select("doc_id").collect().map(_.getString(0)).toSet
    assert(accepted == Set("a", "b"), accepted.toString)
  }

  // ---- round-12 advice fixes -----------------------------------------

  test("upsertPartitioned: numeric-looking STRING partition values update in place, no duplicate dir") {
    val root = Files.createTempDirectory("upsert-strpart").toString + "/t"
    Seq((1L, "a", "01"), (2L, "b", "01"), (3L, "c", "02"))
      .toDF("k", "name", "part").write.partitionBy("part").parquet(root)
    val delta = Seq((1L, "a2", "01")).toDF("k", "name", "part")
    val affected = Sinks.upsertPartitioned(spark, root, delta, Seq("k"), "part")
    assert(affected == Seq("01"))
    // pre-fix: inference read part=01 back as int 1, the filter matched
    // nothing, and the write landed in a NEW part=1 dir while part=01
    // survived stale — silent duplication
    assert(!new java.io.File(s"$root/part=1").exists, "phantom part=1 dir")
    assert(new java.io.File(s"$root/part=01").exists)
    // verify under inference-off too: the documented reader contract for
    // tables whose directory names don't round-trip through inference
    val inferKey = "spark.sql.sources.partitionColumnTypeInference.enabled"
    spark.conf.set(inferKey, "false")
    val got =
      try spark.read.parquet(root)
        .select(col("k"), col("name"), col("part").cast("string"))
        .orderBy("k").as[(Long, String, String)].collect().toSeq
      finally spark.conf.unset(inferKey)
    assert(got == Seq((1L, "a2", "01"), (2L, "b", "01"), (3L, "c", "02")), got.toString)
  }

  test("upsertPartitioned: null delta partition value refused loudly") {
    val root = Files.createTempDirectory("upsert-nullpart").toString + "/t"
    Seq((1L, "a", "p1")).toDF("k", "name", "part")
      .write.partitionBy("part").parquet(root)
    val delta = Seq((1L, "a2", null: String)).toDF("k", "name", "part")
    val e = intercept[IllegalArgumentException] {
      Sinks.upsertPartitioned(spark, root, delta, Seq("k"), "part")
    }
    assert(e.getMessage.contains("null part"), e.getMessage)
  }

  test("upsert: a real data column named _rn / _dup_chk survives the merge") {
    // pre-fix: withColumn("_rn", ...).drop("_rn") destroyed the data column
    val base = Seq((1L, "keep-me", 1.0)).toDF("k", "_rn", "bal")
    val up1 = Seq((1L, "v2", 2.0), (1L, "v1", 1.0)).toDF("k", "_rn", "bal")
    val got1 = Joins.upsert(base, up1, Seq("k"), versionOrder = Some(col("bal")))
      .as[(Long, String, Double)].collect().toSeq
    assert(got1 == Seq((1L, "v2", 2.0)), got1.toString)
    val base2 = Seq((1L, "keep", 1.0)).toDF("k", "_dup_chk", "bal")
    val up2 = Seq((2L, "ins", 2.0)).toDF("k", "_dup_chk", "bal")
    val got2 = Joins.upsert(base2, up2, Seq("k"))
      .orderBy("k").as[(Long, String, Double)].collect().toSeq
    assert(got2 == Seq((1L, "keep", 1.0), (2L, "ins", 2.0)), got2.toString)
  }

  test("keyOverlapReport: one row per candidate even when a column spans two comparison domains") {
    // (a, x) is same-type LONG (native domain); (a, y) and (b, x) are
    // mixed-type (string domain) — the string domain's cross-join also
    // produces cell (a, x), which must NOT surface as a second row
    val l = Seq((1L, "1"), (2L, "2"), (7L, "9")).toDF("a", "b")
    val r = Seq((1L, "2"), (3L, "7")).toDF("x", "y")
    val got = Joins.keyOverlapReport(l, r,
      Seq(("a", "x"), ("a", "y"), ("b", "x")))
      .orderBy("left_col", "right_col").collect()
      .map(row => (row.getString(0), row.getString(1), row.getLong(2)))
    assert(got.length == 3, s"duplicate candidate rows: ${got.mkString(";")}")
    assert(got.toSeq == Seq(("a", "x", 1L), ("a", "y", 2L), ("b", "x", 1L)),
      got.mkString(";"))
  }

  test("keyOverlapReport: decimals match across scales (1.5 ≡ 1.50)") {
    val l = Seq("1.5", "2.00", "3.25").toDF("s")
      .select(col("s").cast("decimal(10,1)").as("d"))   // 1.5, 2.0, 3.2 (rounded)
    val r = Seq("1.50", "2.0000", "9.9").toDF("s")
      .select(col("s").cast("decimal(12,4)").as("d"))   // 1.5000, 2.0000, 9.9000
    val got = Joins.keyOverlapReport(l, r, Seq(("d", "d")))
      .collect().map(r0 => r0.getLong(2)).head
    // 1.5 and 2.0 overlap despite different rendered scales
    assert(got == 2L, s"overlap=$got")
  }

  test("globalPrefixSum releases its cache once the result is dropped") {
    val before = spark.sparkContext.getPersistentRDDs.keySet
    var res = Joins.globalPrefixSum(
      (1 to 1000).map(i => (i.toLong, 1L)).toDF("k", "v"),
      Seq(col("k")), col("v"))
    val last = res.orderBy(desc("running_total")).select("running_total")
      .head().getLong(0)
    assert(last == 1000L)
    // pinned while the frame is alive (the pin is load-bearing: range
    // partitioner boundaries must not move between the two passes)
    assert(spark.sparkContext.getPersistentRDDs.size > before.size)
    res = null
    // the RDD-level persist is weak-ref tracked by ContextCleaner: once
    // unreachable, the cached blocks are reclaimed on GC — poll for it
    val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
    var freed = false
    while (!freed && System.nanoTime() < deadline) {
      System.gc()
      Thread.sleep(200)
      freed = spark.sparkContext.getPersistentRDDs.keySet.subsetOf(before)
    }
    assert(freed, "cached prefix-sum RDD survived GC — CacheManager-style accretion")
  }
}
