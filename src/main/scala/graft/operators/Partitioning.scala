package graft.operators

import org.apache.spark.sql.DataFrame

/** Parallelism repair for compute-dense tables behind unsplittable
  * scans (guide §2.5 "input skew: one huge unsplittable file ...
  * repartition immediately after the read").
  *
  * The driver's small-SF tables are single-row-group parquet files: a
  * parquet file only splits at row-group boundaries, so every scan
  * yields ONE task per file and all pre-exchange work — shingling,
  * hashing, signature folds, JSON parsing, codec work — serializes on
  * one core of 32 (measured at sf0.1: q_jaccard_pairs' map stage ran
  * 1.2 s in one task; behind a repartition the same pipeline ran
  * 2.55 s → 1.7 s end to end). `localCheckpoint`ed frames inherit the
  * parent's partitioning, so whole version chains stay serial too.
  *
  * [[fanOutSmallScan]] round-robin-repartitions to the session's
  * default parallelism, but ONLY when the scan cannot reach it by
  * itself (fewer files than cores) AND the table is small enough that
  * the exchange is guaranteed cheap (≤ `maxBytes`, default 1 GiB). At
  * production scale a corpus scan carries hundreds of splits and this
  * is a no-op decided from file metadata alone — no planning, no I/O.
  * Round-robin under `spark.sql.execution.sortBeforeRepartition`
  * (default) keeps row→partition assignment deterministic under task
  * retries; every engine query is value-deterministic (total-order
  * sorts, order-free DECIMAL aggregation), so results are
  * partition-invariant.
  *
  * Apply to tables whose consumers are compute-dense (documents,
  * embeddings, events): for wide scan→aggregate tables the extra
  * exchange is a measured net LOSS (lineitem q1-style agg 0.31 s →
  * 0.46 s — partial aggregation already compresses map-side inside
  * the scan task), so lineitem/orders keep their raw scans.
  */
object Partitioning {
  def fanOutSmallScan(df: DataFrame, path: String,
                      maxBytes: Long = 1L << 30): DataFrame = {
    val want = df.sparkSession.sparkContext.defaultParallelism
    val (files, bytes) = scanFootprint(path)
    if (files > 0 && files < want && bytes <= maxBytes) df.repartition(want)
    else df
  }

  /** (regular file count, total bytes) under `path` — a file counts as
    * one scan slot (single-row-group parquet does not split further).
    */
  private def scanFootprint(path: String): (Long, Long) =
    try {
      val p = java.nio.file.Paths.get(path)
      if (java.nio.file.Files.isRegularFile(p))
        (1L, java.nio.file.Files.size(p))
      else if (java.nio.file.Files.isDirectory(p)) {
        val s = java.nio.file.Files.walk(p)
        try {
          var n = 0L; var b = 0L
          val it = s.iterator()
          while (it.hasNext) {
            val f = it.next()
            if (java.nio.file.Files.isRegularFile(f) &&
                !f.getFileName.toString.startsWith("_") &&
                !f.getFileName.toString.startsWith(".")) {
              n += 1; b += java.nio.file.Files.size(f)
            }
          }
          (n, b)
        } finally s.close()
      } else (0L, 0L)
    } catch { case _: Throwable => (0L, 0L) }
}
