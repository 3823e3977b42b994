package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Snapshot diff — row-level change detection between two versions of a
  * corpus or table (the training-data release audit: "what changed
  * between corpus v4 and v5?"). Generalizes the reference's
  * outer-join-with-indicator reconciliation (J2, `DOR VP Compare.ipynb`
  * merge-with-`_merge` pattern) from two report extracts to arbitrary
  * table snapshots, keyed and content-fingerprinted.
  *
  * Scale contract (100 TB): both sides are first projected to
  * `(key, fingerprint)` — the full-outer shuffle carries a few dozen
  * bytes per row instead of the document payload, so diffing two 100 TB
  * snapshots moves 2×(keys+16B) over the wire, not 200 TB. The join is a
  * plain hash-partitioned full outer on the key columns: co-partitioned
  * if both snapshots are bucketed/sorted on the key (the
  * [[graft.sources.Sinks.Versioned]] layout written with `sortCol` =
  * key), zero extra state otherwise. No driver-side collection at any
  * size.
  *
  * Fingerprints: `xxhash64` by default (codegen'd, 8 bytes); `portable =
  * true` switches to `md5` so an external engine can replay the exact
  * fingerprint (the repo's established md5-twin convention for
  * DuckDB-oracled queries). Null cells are distinguished from empty
  * strings by a U+0000 sentinel inside a U+0001-separated concatenation —
  * `("a", null)` and `("a", "")` fingerprint differently.
  *
  * Precondition: `keyCols` identify at most one row per snapshot
  * (duplicate keys make "changed vs unchanged" ill-posed; dedup first
  * with [[Dedup]] if needed).
  */
object Diff {

  /** Content fingerprint over `cols`, null-safe and order-sensitive. */
  def fingerprint(cols: Seq[String], portable: Boolean = false): Column = {
    val parts = cols.map(c => coalesce(col(c).cast("string"), lit("\u0000")))
    val joined = concat_ws("\u0001", parts: _*)
    if (portable) md5(joined) else xxhash64(joined).cast("string")
  }

  /** Per-key diff of two snapshots: returns `keyCols` + `status` where
    * status ∈ {added, removed, changed, unchanged} (added/removed are
    * relative to `oldDf` → `newDf`).
    */
  def snapshotDiff(oldDf: DataFrame, newDf: DataFrame, keyCols: Seq[String],
                   compareCols: Seq[String],
                   portable: Boolean = false): DataFrame = {
    require(keyCols.nonEmpty, "keyCols must be non-empty")
    require(compareCols.nonEmpty, "compareCols must be non-empty")
    val fp = fingerprint(compareCols, portable)
    val o = oldDf.select(keyCols.map(col) :+ fp.as("fp_old"): _*)
    val n = newDf.select(keyCols.map(col) :+ fp.as("fp_new"): _*)
    o.join(n, keyCols, "full_outer")
      .select(keyCols.map(col) :+
        when(col("fp_old").isNull, lit("added"))
          .when(col("fp_new").isNull, lit("removed"))
          .when(col("fp_old") =!= col("fp_new"), lit("changed"))
          .otherwise(lit("unchanged"))
          .as("status"): _*)
  }

  /** Status counts — the release-audit headline (4 rows at any scale). */
  def diffSummary(diff: DataFrame): DataFrame =
    diff.groupBy("status").agg(count(lit(1)).as("n")).orderBy("status")
}
