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

  test("monthly refresh: rename vocab, cutoff filter, schema guard passes") {
    val out = MonthlyRefresh.refresh(spark, sf, cutoff = "2024-01-15")
    assert(out.columns.toSeq == MonthlyRefresh.expectedSchema.fieldNames.toSeq)
    assert(out.count() > 0)
    val maxDate = out.agg(max(col("Event Date"))).head().getTimestamp(0)
    assert(maxDate.before(java.sql.Timestamp.valueOf("2024-01-15 00:00:00")))
  }

  test("assertTotal passes on correct total, fails on wrong one (V4)") {
    val df = Seq(1.0, 2.0, 3.5).toDF("v")
    SchemaOps.assertTotal(df, "v", 6.5)
    intercept[IllegalArgumentException] {
      SchemaOps.assertTotal(df, "v", 100.0)
    }
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
