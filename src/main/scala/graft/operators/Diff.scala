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
  * DuckDB-oracled queries). Each column is tagged (`N` for NULL, `V` +
  * value otherwise) so NULL is distinct from EVERY string — including
  * `""` and a literal NUL — and each column is reduced to a fixed-width
  * digest (portable) or a structural hash-chain argument (fast path)
  * BEFORE combination, so no cell value can forge a column boundary:
  * `("a<sep>b","c")` and `("a","b<sep>c")` fingerprint differently for
  * any would-be separator.
  *
  * Precondition: `keyCols` identify at most one row per snapshot
  * (duplicate keys make "changed vs unchanged" ill-posed; dedup first
  * with [[Dedup]] if needed). NULL key cells are supported: the join
  * uses null-safe equality, so a row keyed NULL present in both
  * snapshots compares as one row, not an added+removed pair.
  */
object Diff {

  /** `N` for NULL, `V`+value otherwise — NULL ≠ any string, incl. "". */
  private def tagged(c: String): Column =
    when(col(c).isNull, lit("N"))
      .otherwise(concat(lit("V"), col(c).cast("string")))

  /** Content fingerprint over `cols`, null-safe, injection-proof and
    * order-sensitive. Portable path: md5 per column, then md5 of the
    * digest concatenation (single column skips the outer hash so the
    * oracle replay is one `md5(CASE ...)`). Fast path: multi-arg
    * `xxhash64`, which chains per-column hashes with the running hash as
    * seed — column boundaries are structural, not separator-encoded, so
    * no value can forge one. The tagged form is fed in both paths
    * because raw `xxhash64` SKIPS null arguments (("a",NULL,"b") would
    * collide with ("a","b",NULL)).
    */
  def fingerprint(cols: Seq[String], portable: Boolean = false): Column =
    if (portable) {
      val hashed = cols.map(c => md5(tagged(c)))
      if (hashed.size == 1) hashed.head else md5(concat_ws("", hashed: _*))
    } else xxhash64(cols.map(tagged): _*).cast("string")

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
    val n = newDf.select(keyCols.map(k => col(k).as(s"__n_$k")) :+
      fp.as("fp_new"): _*)
    // Null-safe key equality (<=> is still a hash-partitionable equi-key):
    // a NULL-keyed row present in both snapshots matches itself instead of
    // splitting into an added+removed pair.
    val cond = keyCols.map(k => col(k) <=> col(s"__n_$k")).reduce(_ && _)
    o.join(n, cond, "full_outer")
      .select(keyCols.map(k => coalesce(col(k), col(s"__n_$k")).as(k)) :+
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
