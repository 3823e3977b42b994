package graft.pipelines

import graft.operators.Joins
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The Appian ∪ legacy-Excel union pipeline (Study Startup Legacy Data
  * merge.ipynb): two drifting study tables merged into one, with
  * provenance flags, cross-table sequential row ids, union on the
  * common column set, and a self-merge that recovers a column the
  * union dropped. Composes J8 + J9 + J10 + P4 + P5 as one declared,
  * testable job:
  *
  *   1. tag: `isLegacy` 0/1 literal per side (ipynb:39-45,1181-1192)
  *   2. row ids: sequential, CONTINUED across the two frames
  *      (appian 1..n, legacy n+1..n+m; ipynb:41-45) — explicit order
  *      required (pandas relied on file order)
  *   3. union on common columns (`pd.concat(join="inner")`, ipynb:1207)
  *   4. self-merge: left-join a recovery frame (RowID → recovered col)
  *      back onto the union with an indicator (ipynb:1209-1218)
  */
object StudyStartupMerge {

  /** @param orderBy   explicit per-frame ordering for the row ids
    * @param recoverCol a legacy-side column dropped by the
    *                   union-on-common (present only in `legacy`) to
    *                   merge back by row id; None to skip recovery
    */
  def merge(appian: DataFrame, legacy: DataFrame, orderBy: Seq[Column],
            recoverCol: Option[String] = None,
            idCol: String = "row_id"): DataFrame = {
    val tagged = Seq(
      appian.withColumn("isLegacy", lit(0)),
      legacy.withColumn("isLegacy", lit(1)))
    val Seq(a, l) = Joins.sequentialRowIds(tagged, orderBy, idCol)
    val unioned = Joins.unionOnCommon(a, l)
    recoverCol match {
      case Some(c) if legacy.columns.contains(c) =>
        val recovery = l.select(col(idCol).as("_recover_id"), col(c))
        Joins.outerWithIndicator(unioned, recovery, idCol, "_recover_id")
          .filter(col("_merge") =!= "right_only") // keep union rows only
          .drop("_recover_id")
      case _ => unioned
    }
  }
}
