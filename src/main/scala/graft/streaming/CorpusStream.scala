package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types.StructType
import graft.operators.TextDedup

/** Continuous corpus ingestion with incremental near-dup screening —
  * the streaming composition of the batch pieces this engine already
  * oracle-proves (`TextDedup.bandedSignatures` /
  * `crossCorpusNearDupsBanded` / `minhashLshPairs`):
  *
  * New documents arrive as parquet file drops. Each micro-batch
  *   1. screens the batch against the PERSISTED band index (parquet,
  *      partitioned by band — the same index the batch screens write),
  *   2. screens the batch against ITSELF (a drop can carry its own
  *      duplicates; keep-first by id within a pair),
  *   3. appends accepted docs to the corpus sink, their band
  *      signatures to the index, and all rejected pairs to a report.
  *
  * Cost per drop is |batch| hashing + band-bucket joins against the
  * index — the corpus is never re-read or re-paired, so a year of
  * daily drops costs Σ|drop|, not Σ|corpus so far|. That is the
  * property that makes continuous ingestion viable at 100 TB; the
  * incremental ≡ full-recompute equivalence of the underlying screen
  * is proven by `q_cross_dedup`'s oracle and `q_inc_clusters`.
  *
  * Retry semantics: the file source tracks processed files
  * exactly-once, but `foreachBatch` parquet appends can replay on
  * failure-retry. Replayed index rows only create duplicate
  * CANDIDATES (results unchanged — candidates dedup by id pair);
  * replayed accepted rows are removed by the downstream exact-dedup
  * any training-data reader already runs (`dedup_exact`). For strict
  * once-only sinks, point `acceptedPath` at a transactional table
  * format; the screening logic is unchanged.
  */
object CorpusStream {

  /** Start the ingestion stream. `statePath` holds the three sinks:
    * `band_index/` (partitioned by band), `accepted/`, `dup_pairs/`.
    * Caller controls draining via the returned query (AvailableNow is
    * applied — each invocation drains what has arrived, the reference's
    * monthly-drop cadence generalized).
    */
  def ingest(spark: SparkSession, docsDir: String, schema: StructType,
             statePath: String, textCol: String = "text",
             idCol: String = "doc_id", n: Int = 3, k: Int = 32,
             bands: Int = 8, threshold: Double = 0.8,
             maxFilesPerTrigger: Int = 8,
             maxBucketSize: Int = Int.MaxValue): StreamingQuery = {
    val indexPath = s"$statePath/band_index"
    val acceptedPath = s"$statePath/accepted"
    val pairsPath = s"$statePath/dup_pairs"

    val src = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(docsDir)

    src.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val docs = batch.select(col(idCol), col(textCol))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        try {
          val indexExists = new org.apache.hadoop.fs.Path(indexPath)
            .getFileSystem(spark.sparkContext.hadoopConfiguration)
            .exists(new org.apache.hadoop.fs.Path(indexPath))

          // 1. batch × corpus (reloaded persisted index)
          val corpusPairs =
            if (indexExists)
              TextDedup.crossCorpusNearDupsBanded(docs,
                spark.read.parquet(indexPath), textCol, idCol,
                n, k, bands, threshold, maxBucketSize)
            else
              // derive new_id/corpus_id from the REAL id column type so the
              // first-batch empty frame unions cleanly with withinPairs for
              // any idCol type (not just long)
              docs.select(col(idCol).as("new_id"), col(idCol).as("corpus_id"),
                lit(0.0).as("est_jaccard")).limit(0)

          // 2. batch × batch, keep-first by id: reject the larger id
          val withinPairs = TextDedup.minhashLshPairs(docs, textCol, idCol,
            n, k, bands, threshold, maxBucketSize)

          val rejected = corpusPairs.select(col("new_id").as("_rid"))
            .unionByName(withinPairs.select(col("doc_b").as("_rid")))
            .distinct()
          val accepted = docs
            .join(rejected, docs(idCol) === col("_rid"), "left_anti")

          // 3. sinks: report, corpus, index (bands of ACCEPTED docs only —
          // rejected docs must not become screen targets for later drops)
          corpusPairs
            .select(col("new_id"), col("corpus_id"), col("est_jaccard"),
              lit("corpus").as("kind"), lit(batchId).as("batch_id"))
            .unionByName(withinPairs.select(
              col("doc_b").as("new_id"), col("doc_a").as("corpus_id"),
              col("est_jaccard"), lit("batch").as("kind"),
              lit(batchId).as("batch_id")))
            .write.mode("append").parquet(pairsPath)
          accepted.write.mode("append").parquet(acceptedPath)
          TextDedup.bandedSignatures(accepted, textCol, idCol, n, k, bands)
            .write.partitionBy("band").mode("append").parquet(indexPath)
        } finally docs.unpersist()
      }
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .option("checkpointLocation", s"$statePath/_checkpoint")
      .start()
  }
}
