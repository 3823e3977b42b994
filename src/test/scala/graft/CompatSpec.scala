package graft

import graft.functions.Compat
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

/** Pandas-compat expression semantics (SURVEY.md §2.5). */
class CompatSpec extends SparkSpec {
  import spark.implicits._

  test("coerceTimestamp: unparseable → null (errors='coerce')") {
    val df = Seq("2024-01-15 10:30:00", "garbage", "").toDF("s")
      .select(Compat.coerceTimestamp(col("s")).as("ts"))
    val got = df.collect().map(r => Option(r.get(0)).map(_.toString))
    assert(got(0).contains("2024-01-15 10:30:00.0"))
    assert(got(1).isEmpty && got(2).isEmpty)
  }

  test("timestampCascade: first matching format wins, then free parse") {
    val df = Seq("01/15/2024", "2024-02-20T08:00:00", "junk").toDF("s")
      .select(Compat.timestampCascade(col("s"), "MM/dd/yyyy", "yyyy-MM-dd'T'HH:mm:ss").as("ts"))
    val got = df.collect().map(r => Option(r.get(0)).map(_.toString))
    assert(got(0).contains("2024-01-15 00:00:00.0"))
    assert(got(1).contains("2024-02-20 08:00:00.0"))
    assert(got(2).isEmpty)
  }

  test("coerceNumericFill: junk → fill value (to_numeric + fillna)") {
    val df = Seq("1.5", "x", null).toDF("s")
      .select(Compat.coerceNumericFill(col("s")).as("v"))
    assert(df.collect().map(_.getDouble(0)).toSeq == Seq(1.5, 0.0, 0.0))
  }

  test("nullTokens: '', '0' → null; trimmed before matching") {
    val df = Seq("a", "", "0", " 0 ", "b").toDF("s")
      .select(Compat.nullTokens(col("s")).as("v"))
    assert(df.collect().map(r => Option(r.getString(0))).toSeq ==
      Seq(Some("a"), None, None, None, Some("b")))
  }

  test("normalizeId: whitespace-blind lowercase (C13)") {
    val df = Seq("AB c\t1 ", "ab C1").toDF("s")
      .select(Compat.normalizeId(col("s")).as("v"))
    assert(df.collect().map(_.getString(0)).toSeq == Seq("abc1", "abc1"))
  }

  test("extractId: no-match → null, not empty string (pandas str.extract)") {
    val df = Seq("x RNG123456 y", "nothing").toDF("s")
      .select(Compat.extractId(col("s")).as("v"))
    assert(df.collect().map(r => Option(r.getString(0))).toSeq ==
      Seq(Some("RNG123456"), None))
  }

  test("stripTotalSuffix keeps id (C14)") {
    val df = Seq("RNG123 Total", "RNG999", "Grand Total").toDF("s")
      .select(Compat.stripTotalSuffix(col("s")).as("v"))
    assert(df.collect().map(_.getString(0)).toSeq ==
      Seq("RNG123", "RNG999", "Grand Total"))
  }

  test("rowKey renders nulls as 'nan' like pandas str(NaN) (C22)") {
    val df = Seq(("a", Some(1)), ("b", None)).toDF("s", "i")
      .select(Compat.rowKey(Seq(col("s"), col("i"))).as("k"))
    assert(df.collect().map(_.getString(0)).toSeq == Seq("a|1", "b|nan"))
  }

  test("pandasBuiltinSum propagates null; SQL sum skips (A3)") {
    val df = Seq(Some(1.0), None, Some(2.0)).toDF("v")
    val r = df.agg(Compat.pandasBuiltinSum(col("v")).as("p"), sum("v").as("s")).head()
    assert(r.isNullAt(0) && r.getDouble(1) == 3.0)
  }

  test("sortedSetJoin: sorted distinct join (A2)") {
    val df = Seq("b", "a", "b", "c").toDF("v")
    assert(df.agg(Compat.sortedSetJoin(col("v")).as("j")).head().getString(0) == "a; b; c")
  }

  test("scrubControlChars removes control chars, keeps tab/newline-free text") {
    val df = Seq("abc").toDF("s")
      .select(Compat.scrubControlChars(col("s")).as("v"))
    assert(df.head().getString(0) == "abc")
  }

  test("monthEndFromMMyy (C21)") {
    val df = Seq("0224").toDF("s").select(Compat.monthEndFromMMyy(col("s")).as("v"))
    assert(df.head().getDate(0).toString == "2024-02-29")
  }
}
