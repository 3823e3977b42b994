package graft.pipelines

import graft.functions.Compat
import graft.sources.FileSources
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The json_cleaning.ipynb pipelines as declared jobs: OneLink UTF-16
  * CSV snapshot typing (ipynb:64-143) and Florence NDJSON cleaning with
  * newest-drop selection (ipynb:178-283).
  */
object JsonCleaning {

  /** OneLink snapshot: UTF-16 CSV scan (S2), coercing timestamp parse on
    * the date columns (C1), coercing numeric parse on the money/ratio
    * columns (C4) — unparseable cells become NULL, as pandas
    * errors="coerce" does.
    */
  def cleanOneLink(spark: SparkSession, path: String,
                   dateCols: Seq[String], numericCols: Seq[String]): DataFrame = {
    val raw = FileSources.csvUtf16(spark, path)
    val dated = dateCols.filter(raw.columns.contains).foldLeft(raw) { (df, c) =>
      df.withColumn(c, Compat.coerceTimestamp(col(c)))
    }
    numericCols.filter(raw.columns.contains).foldLeft(dated) { (df, c) =>
      df.withColumn(c, Compat.coerceNumeric(col(c)))
    }
  }

  /** Florence feed: pick the NEWEST drop in the folder by filename
    * (S12 — the reference builds a dates frame, sorts desc, iloc[0]),
    * NDJSON scan (S9), drop the index artifact (P2), full-row dedup
    * (D1). Returns None when no file matches.
    */
  def cleanFlorenceLatest(spark: SparkSession, dir: String,
                          pattern: String = "\\.ndjson$"): Option[DataFrame] =
    FileSources.latestFile(spark, dir, pattern, FileSources.ByName).map { path =>
      val raw = FileSources.ndjson(spark, path)
      val noIdx = if (raw.columns.contains("Unnamed: 0")) raw.drop("Unnamed: 0") else raw
      noIdx.dropDuplicates()
    }
}
