package graft

import graft.pipelines.MonthlyRefresh
import graft.operators.SchemaOps
import graft.sources.FileSources
import org.apache.spark.sql.functions._
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

/** Pipeline shapes (SURVEY §3.2) + remaining source/expression gap-fills. */
class PipelinesSpec extends SparkSpec {
  import spark.implicits._

  test("curateAtScale: LSH swap collapses exact dups; tracks the exact path on real docs") {
    import graft.operators.TextDedup
    import graft.pipelines.CorpusCuration
    val docs = Tables.documents(spark, sf)
    def pairSet(df: org.apache.spark.sql.DataFrame) =
      df.select("doc_a", "doc_b").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val exactPairs = pairSet(TextDedup.jaccardPairs(docs, "text", "doc_id",
      n = 3, threshold = 0.8))
    val lshPairs = pairSet(TextDedup.minhashLshPairs(docs, "text", "doc_id",
      n = 3, k = 32, bands = 8, threshold = 0.8))
    def survivors(df: org.apache.spark.sql.DataFrame) =
      df.select("doc_id").collect().map(_.getLong(0)).toSet
    val e = survivors(CorpusCuration.curate(docs, "text", "doc_id"))
    val l = survivors(CorpusCuration.curateAtScale(docs, "text", "doc_id"))
    if (exactPairs == lshPairs)
      assert(l == e, "identical pair sets must curate identically")
    else {
      // each differing edge can flip at most its cluster's members;
      // bound the survivor drift by the edge drift (loose, no-flake)
      val drift = (exactPairs diff lshPairs).size + (lshPairs diff exactPairs).size
      assert(((l diff e) ++ (e diff l)).size <= 2 * drift,
        s"survivor drift ${((l diff e) ++ (e diff l)).size} vs edge drift $drift")
    }
    // planted exact duplicates ALWAYS collapse under LSH: identical text
    // → identical signatures → collision in every band
    val planted = docs.limit(5)
      .select((col("doc_id") + 1000000L).as("doc_id"), col("text"))
    val withDups = docs.select("doc_id", "text").unionByName(planted)
    val s2 = survivors(CorpusCuration.curateAtScale(withDups, "text", "doc_id"))
    val plantedIds = planted.select("doc_id").collect().map(_.getLong(0)).toSet
    assert((s2 & plantedIds).isEmpty,
      s"planted exact dups survived: ${s2 & plantedIds}")
    assert(s2 == l, "adding pure duplicates must not change the survivor set")
  }

  test("CorpusCuration: cluster dedup keeps canonical, gates drop low-quality docs") {
    val docs = Seq(
      (0L, Seq.tabulate(30)(i => s"w$i").mkString(" ")),                  // clean, kept
      (1L, Seq.tabulate(30)(i => s"w$i").mkString(" ") + " extra"),       // near-dup of 0 → dropped
      (2L, "short doc below the token floor"),                            // too short
      (3L, (Seq.tabulate(26)(i => s"u$i") ++ Seq.fill(14)("spam")).mkString(" ")), // repeated run → dup+gram gates
      (4L, Seq.tabulate(40)(i => s"v${i % 35}").mkString(" "))            // mild dup, kept
    ).toDF("doc_id", "text")
    val kept = graft.pipelines.CorpusCuration.curate(docs, "text", "doc_id")
      .orderBy("doc_id").collect().map(_.getLong(0)).toSeq
    assert(kept == Seq(0L, 4L), s"got $kept")
  }

  test("curateAtScale (LSH pairs + hot-bucket cap) agrees with exact curate on the fixture") {
    val docs = Seq(
      (0L, Seq.tabulate(30)(i => s"w$i").mkString(" ")),
      (1L, Seq.tabulate(30)(i => s"w$i").mkString(" ")),   // exact dup → LSH always collides
      (2L, "short doc below the token floor"),
      (3L, (Seq.tabulate(26)(i => s"u$i") ++ Seq.fill(14)("spam")).mkString(" ")),
      (4L, Seq.tabulate(40)(i => s"v${i % 35}").mkString(" "))
    ).toDF("doc_id", "text")
    val exact = graft.pipelines.CorpusCuration.curate(docs, "text", "doc_id")
      .orderBy("doc_id").collect().map(_.getLong(0)).toSeq
    val scale = graft.pipelines.CorpusCuration.curateAtScale(docs, "text", "doc_id",
      maxBucketSize = 100)
      .orderBy("doc_id").collect().map(_.getLong(0)).toSeq
    assert(scale == exact && exact == Seq(0L, 4L), s"scale=$scale exact=$exact")
  }

  test("monthly refresh: rename vocab, cutoff filter, schema guard passes") {
    val out = MonthlyRefresh.refresh(spark, sf, cutoff = "2024-01-15")
    assert(out.columns.toSeq == MonthlyRefresh.expectedSchema.fieldNames.toSeq)
    assert(out.count() > 0)
    val maxDate = out.agg(max(col("Event Date"))).head().getTimestamp(0)
    assert(maxDate.before(java.sql.Timestamp.valueOf("2024-01-15 00:00:00")))
  }

  test("§3.1 golden replay: DOR↔VP reconciliation reproduces the reference's recorded totals") {
    import graft.pipelines.DorVpCompare
    import graft.sources.Excel
    val dir = Files.createTempDirectory("dorvp").toString

    // Reference-shaped fixtures engineered so every bucket hits the
    // golden totals recorded from the reference's own run
    // (BASELINE.md:32-38 ← DOR VP Compare.ipynb:207-215), while
    // exercising each cleaning step: junk dates (coerce), out-of-range
    // rows (filter), exact-duplicate rows (dedup), the "Unnamed: 0"
    // index artifact (drop), null ids (dropna), junk amounts (coerce+0).
    val dor = Seq(
      ("RNG000001", "Study A", "2024-01-15", "10000000.00", "Oncology"),
      ("RNG000002", "Study B", "2023-06-02", "9427569.65", "Cardio"),
      ("RNG000003", "Study C", "2022-03-10", "9564026.55", "Neuro"),
      ("RNG000004", "Study D", "2021-07-21", "26738190.41", "KPOCT"),
      ("RNG000099", "Out of range", "1999-05-01", "999999.99", "Neuro"),
      ("RNG000098", "Bad date", "not-a-date", "111.11", "Neuro")
    ).toDF(DorVpCompare.DorId, DorVpCompare.DorTitle, DorVpCompare.DorDate,
      DorVpCompare.DorAmount, DorVpCompare.DorProgram)
    val vp = Seq(
      ("0", "RNG000001", "SSC-1", "2024-02-01", "10514494.75"),
      ("1", "RNG000002", "SSC-2", "2024-02-02", "6000000.00"),
      ("2", "RNG000002", "SSC-3", "2024-02-03", "4000000.00"),
      ("3", "RNG000001", "SSC-1", "2024-02-01", "10514494.75"), // dup after index drop
      ("4", "RNG000005", "SSC-9", "2024-03-01", "232340.06"),
      ("5", null, "SSC-0", "2024-03-02", "123.45"),             // null id
      ("6", "RNG000001", "SSC-1", "1999-01-01", "555.55"),      // out of range
      ("7", "RNG000002", "SSC-2", "2024-04-01", "not-a-number") // junk amount → 0
    ).toDF("Unnamed: 0", DorVpCompare.VpId, DorVpCompare.VpStudy,
      DorVpCompare.VpDate, DorVpCompare.VpAmount)
    Excel.write(dor, s"$dir/dor.xlsx")
    Excel.write(vp, s"$dir/vp.xlsx")

    val summary = DorVpCompare.run(spark, s"$dir/dor.xlsx", s"$dir/vp.xlsx",
      s"$dir/recon.xlsx")

    // golden totals, asserted through the V4 spot-check operator
    def metric(m: String) = summary.filter(col("metric") === m).select("value")
    SchemaOps.assertTotal(metric("total_dor"), "value", 55729786.61)
    SchemaOps.assertTotal(metric("total_vp"), "value", 20746834.81)
    SchemaOps.assertTotal(metric("overlap_dor"), "value", 19427569.65)
    SchemaOps.assertTotal(metric("overlap_vp"), "value", 20514494.75)
    SchemaOps.assertTotal(metric("matched_difference"), "value", -1086925.10)
    SchemaOps.assertTotal(metric("dor_only_effective"), "value", 9564026.55)
    SchemaOps.assertTotal(metric("vp_only"), "value", 232340.06)

    // the workbook fan-out landed with all five sheets, incl. interactive
    assert(Excel.sheetNames(s"$dir/recon.xlsx") ==
      Seq("Summary", "Matched_Studies", "DOR_Detail", "VP_Detail", "Study_Detail"))
    assert(Excel.read(spark, s"$dir/recon.xlsx", Some("Matched_Studies")).count() == 2)
    val detailXml = Excel.rawSheetXml(s"$dir/recon.xlsx", "Study_Detail")
    assert(detailXml.contains("""<dataValidation type="list""""))
    assert(detailXml.contains("FILTER(DOR_Detail!"))
  }

  test("assertTotal passes on correct total, fails on wrong one (V4)") {
    val df = Seq(1.0, 2.0, 3.5).toDF("v")
    SchemaOps.assertTotal(df, "v", 6.5)
    intercept[IllegalArgumentException] {
      SchemaOps.assertTotal(df, "v", 100.0)
    }
  }

  test("JsonCleaning: OneLink UTF-16 typing + Florence latest-drop dedup") {
    import graft.pipelines.JsonCleaning
    val dir = Files.createTempDirectory("jc").toString
    // OneLink UTF-16 snapshot with junk cells in typed columns
    Files.write(Paths.get(s"$dir/onelink.csv"),
      ("Study,Start Date,Budget,FA Rate %\n" +
        "S1,2024-01-15,1000.50,0.25\n" +
        "S2,not-a-date,junk,0.30\n").getBytes(StandardCharsets.UTF_16))
    val ol = JsonCleaning.cleanOneLink(spark, s"$dir/onelink.csv",
      dateCols = Seq("Start Date"), numericCols = Seq("Budget", "FA Rate %"))
    val rows = ol.orderBy("Study").collect()
    assert(rows(0).getTimestamp(1).toString.startsWith("2024-01-15"))
    assert(rows(0).getDouble(2) == 1000.50)
    assert(rows(1).isNullAt(1) && rows(1).isNullAt(2)) // coerce → NULL

    // Florence: two drops; newest (by name) wins; dups removed
    Files.writeString(Paths.get(s"$dir/2024-01-florence.ndjson"),
      "{\"id\":1}\n")
    Files.writeString(Paths.get(s"$dir/2024-02-florence.ndjson"),
      "{\"id\":2}\n{\"id\":2}\n{\"id\":3}\n")
    val fl = JsonCleaning.cleanFlorenceLatest(spark, dir).get
    assert(fl.count() == 2) // newest file only, dedup applied
    assert(fl.select(max(col("id"))).head().getLong(0) == 3L)
    assert(JsonCleaning.cleanFlorenceLatest(spark, dir, "\\.nope$").isEmpty)
  }

  test("sumAndSortedSetSalted matches sumAndSortedSet on skewed data") {
    import graft.operators.Aggs
    val df = (1 to 500).map(i => ("hot", s"code${i % 97}", 1.0)) ++
      Seq(("cold", "x", 2.0), ("cold", "y", 3.0))
    val d = df.toDF("k", "code", "amt")
    val plain = Aggs.sumAndSortedSet(d, "k", col("amt"), col("code"))
      .orderBy("k").collect().map(r => (r.getString(0), r.getDouble(1), r.getString(2)))
    val salted = Aggs.sumAndSortedSetSalted(d, "k", col("amt"), col("code"))
      .orderBy("k").collect().map(r => (r.getString(0), r.getDouble(1), r.getString(2)))
    assert(plain.toSeq == salted.toSeq)
  }

  test("UTF-16 whole-doc JSON scan (S7)") {
    val dir = Files.createTempDirectory("j16").toString
    Files.write(Paths.get(s"$dir/t.json"),
      """{"TRAC_Data": [{"id": 1, "name": "ä"}, {"id": 2, "name": "b"}]}"""
        .getBytes(StandardCharsets.UTF_16LE))
    val raw = FileSources.jsonWholeDoc(spark, s"$dir/t.json", "UTF-16LE")
    val flat = FileSources.flattenRecords(raw, "TRAC_Data")
    assert(flat.count() == 2)
    assert(flat.orderBy("id").head().getString(1) == "ä")
  }

  test("filename month-end parse (S13) + first-token split (C18)") {
    val df = Seq("Alice Smith", "Bob").toDF("name")
    val withMeta = FileSources.withReportMonthEnd(df, "0224")
    assert(withMeta.head().getDate(1).toString == "2024-02-29")
    val first = df.select(split(col("name"), " ").getItem(0).as("f"))
      .collect().map(_.getString(0))
    assert(first.toSeq == Seq("Alice", "Bob"))
  }
}
