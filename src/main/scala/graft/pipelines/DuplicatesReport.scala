package graft.pipelines

import graft.Tables
import graft.functions.Compat
import graft.operators.Dedup
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The Transaction Duplicates report shape (Transaction Duplicates.ipynb:
  * composite all-column row key → every member of any duplicate group →
  * group size → multi-key sort), generalized over any table.
  */
object DuplicatesReport {

  def report(df: DataFrame, keyCols: Seq[String]): DataFrame = {
    val keyed = df.withColumn("_dup_key",
      Compat.rowKey(keyCols.map(col)))
    Dedup.withDuplicateCount(
      Dedup.duplicatesAll(keyed, Seq("_dup_key")), Seq("_dup_key"))
      .orderBy(col("_dup_key") +: keyCols.map(col): _*)
  }

  /** The reference's concrete report: duplicate lineitems by logical key. */
  def lineitemReport(spark: SparkSession, sfDir: String): DataFrame =
    report(
      Tables.lineitem(spark, sfDir)
        .select("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber"),
      Seq("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber"))
}
