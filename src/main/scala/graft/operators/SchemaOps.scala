package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, StructType}

/** Schema/validation operators (SURVEY.md §2.10, V1-V2).
  *
  * The reference's only regression defense is a column-set drift check
  * against last month's archived output (Saoirse Automation.ipynb:325-359)
  * plus ensure-column-exists loops (DOP VP Compare.py:64-73). Both become
  * first-class, fail-fast pipeline stages here.
  */
object SchemaOps {

  final case class SchemaDriftException(missing: Set[String], unexpected: Set[String])
    extends RuntimeException(
      s"schema drift: missing=${missing.toSeq.sorted.mkString(",")} " +
        s"unexpected=${unexpected.toSeq.sorted.mkString(",")}")

  /** V1: column-set drift check — raise on mismatch vs the expected schema. */
  def guard(df: DataFrame, expected: StructType): DataFrame = {
    val have = df.columns.toSet
    val want = expected.fieldNames.toSet
    if (have != want) throw SchemaDriftException(want -- have, have -- want)
    df
  }

  /** V2: ensure-columns-exist — add typed NULL columns for any missing
    * field, then conform column order to the target schema.
    */
  def alignTo(df: DataFrame, target: StructType): DataFrame = {
    val have = df.columns.toSet
    val withMissing = target.fields.foldLeft(df) { (acc, f) =>
      if (have(f.name)) acc else acc.withColumn(f.name, lit(null).cast(f.dataType))
    }
    withMissing.select(target.fieldNames.map(col).toSeq: _*)
  }

  /** P6-style conform: reorder/select to a stored column list. */
  def conform(df: DataFrame, columnList: Seq[String]): DataFrame =
    df.select(columnList.map(col): _*)

  /** Add-missing-as-null without reordering, for drifting monthly drops. */
  def ensureColumns(df: DataFrame, cols: Seq[(String, DataType)]): DataFrame =
    cols.foldLeft(df) { case (acc, (n, t)) =>
      if (acc.columns.contains(n)) acc else acc.withColumn(n, lit(null).cast(t))
    }

  /** V4: spot-check a grand total against a known-good value (the
    * reference's printed Tableau cross-checks) — fail-fast assertion.
    */
  def assertTotal(df: DataFrame, c: String, expected: Double,
                  tolerance: Double = 1e-6): DataFrame = {
    val got = df.agg(sum(col(c)).cast("double")).head().getDouble(0)
    require(math.abs(got - expected) <= tolerance,
      f"total check failed on '$c': got $got%.4f expected $expected%.4f")
    df
  }

  /** One-pass numeric column profile — the data-quality report a
    * pipeline runs before trusting a new monthly drop: one row per
    * column with (n, nulls, min, max, mean). ONE aggregation over the
    * table (every stat is map-side combinable; 5·|cols| partials cross
    * the wire), unpivoted driver-free via stack. Means go through
    * DECIMAL (partitioning-invariant, oracle-exact per the engine's
    * decimal-sum rule).
    */
  def profileNumeric(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "profileNumeric needs at least one column")
    // pure Column API with index-based intermediate names — arbitrary
    // input column names (spaces, hyphens, reserved words) never pass
    // through SQL text; backticks admit even dotted names
    val aggs = cols.zipWithIndex.map { case (c, i) =>
      val x = col(s"`$c`").cast("double")
      struct(
        count(lit(1)).as("n"),
        sum(when(x.isNull, 1L).otherwise(0L)).as("nulls"),
        min(x).as("min"),
        max(x).as("max"),
        (sum(x.cast("decimal(38,8)")).cast("double") / count(x)).as("mean")
      ).as(s"_p$i")
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val rows = cols.zipWithIndex.map { case (c, i) =>
      struct(lit(c).as("column"), col(s"_p$i.n").as("n"),
        col(s"_p$i.nulls").as("nulls"), col(s"_p$i.min").as("min"),
        col(s"_p$i.max").as("max"), col(s"_p$i.mean").as("mean"))
    }
    one.select(explode(array(rows: _*)).as("_r")).select(col("_r.*"))
  }
}
