package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SaveMode}

/** Sink-side utilities (SURVEY.md §2.2).
  *
  * K1 single-file CSV parity: the reference's `to_csv(path, index=False)`
  * produces ONE file. `coalesce(1)` gives single-file output without a
  * full shuffle (narrow dependency); the part file is then renamed to the
  * requested path. Only for report-sized outputs — a 100 TB result goes
  * through `df.write` partitioned, never through one file.
  */
object Sinks {

  /** K1: write a single CSV file at exactly `path` (header, UTF-8). */
  def writeSingleCsv(df: DataFrame, path: String, encoding: String = "UTF-8"): Unit = {
    val tmp = path + "_tmpdir"
    df.coalesce(1).write.mode(SaveMode.Overwrite)
      .option("header", "true").option("encoding", encoding)
      .csv(tmp)
    val conf = df.sparkSession.sparkContext.hadoopConfiguration
    val fs = new Path(tmp).getFileSystem(conf)
    val part = fs.listStatus(new Path(tmp))
      .map(_.getPath).find(_.getName.startsWith("part-"))
      .getOrElse(throw new IllegalStateException(s"no part file under $tmp"))
    val dest = new Path(path)
    if (fs.exists(dest) && !fs.delete(dest, false))
      throw new java.io.IOException(s"could not replace existing $path")
    val parent = dest.getParent
    if (parent != null && !fs.exists(parent)) fs.mkdirs(parent)
    if (!fs.rename(part, dest))
      throw new java.io.IOException(s"rename $part -> $dest failed")
    fs.delete(new Path(tmp), true)
  }

  /** Training-shard writer — the output side of a 100 TB pipeline:
    * hive-style partition directories on `partitionCols` (enables
    * partition-pruned downstream reads), range-repartitioned on
    * `shardBy` into `shards` files per partition with rows sorted within
    * each shard (stable ordering for reproducible training runs),
    * bounded file sizes via maxRecordsPerFile.
    */
  def writeShards(df: DataFrame, path: String, partitionCols: Seq[String],
                  shardBy: String, shards: Int,
                  maxRecordsPerFile: Long = 5000000L,
                  format: String = "parquet"): Unit = {
    import org.apache.spark.sql.functions.col
    // sort key must LEAD with the partition columns: the dynamic-partition
    // writer requires ordering on them and would otherwise insert its own
    // non-stable sort, discarding the shardBy ordering entirely
    //
    // format "json" = gzip JSONL — the interchange format most training
    // stacks ingest directly; same sharding/ordering guarantees as the
    // parquet layout (compression via codec, not the layout)
    val w = df.repartitionByRange(shards, col(shardBy))
      .sortWithinPartitions((partitionCols :+ shardBy).map(col): _*)
      .write
      .partitionBy(partitionCols: _*)
      .option("maxRecordsPerFile", maxRecordsPerFile.toString)
      .mode(SaveMode.Overwrite)
    format match {
      case "parquet" => w.parquet(path)
      case "json" => w.option("compression", "gzip").json(path)
      case other => throw new IllegalArgumentException(
        s"writeShards: unsupported format '$other' (parquet | json)")
    }
  }

  /** Token-budget shard assignment: walk the frame in `orderBy` order
    * and pack rows into shards of at most ~`budget` tokens (a shard may
    * overflow by one row's partial count — the standard training-shard
    * contract, rows are never split). `shard_id = exclusive-prefix-sum
    * div budget`, built on [[graft.operators.Joins.globalPrefixSum]] —
    * parallel range-partitioned prefix sums, never a single-partition
    * window. Feed the result to [[writeShards]] partitioned by
    * `shard_id` for budget-bounded training files.
    */
  def packByBudget(df: DataFrame, orderBy: Seq[org.apache.spark.sql.Column],
                   tokenCol: String, budget: Long,
                   shardCol: String = "shard_id"): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr}
    require(budget > 0, "budget must be positive")
    graft.operators.Joins.globalPrefixSum(df, orderBy, col(tokenCol), "running_total")
      .withColumn(shardCol, expr(s"(running_total - $tokenCol) div $budget"))
  }

  /** Fixed-context sequence packing — the training-batch layout: walk
    * the frame in `orderBy` order, concatenate every document's tokens
    * into one unbroken stream, and cut the stream into back-to-back
    * windows of exactly `seqLen` tokens (no padding; documents split
    * across window boundaries — each window is one training sequence).
    * Emits one row per (document, window) SPAN, the metadata a loader
    * needs to assemble window `seq_id` from document slices:
    * `seq_id` (window ordinal), `seq_offset` (where in the window the
    * span starts), `doc_offset` (where in the document it starts),
    * `span_len`. Every window except the stream's last sums to exactly
    * `seqLen`; zero-token documents contribute no spans.
    *
    * Scale shape: one range-partitioned prefix sum
    * ([[graft.operators.Joins.globalPrefixSum]] — never a global
    * window) + a per-row explode of that row's window range; a doc of
    * t tokens emits ⌈t/seqLen⌉+1 spans at most, so output is
    * O(rows + totalTokens/seqLen) with no shuffle beyond the range
    * partition.
    */
  def packSequences(df: DataFrame, orderBy: Seq[org.apache.spark.sql.Column],
                    tokenCol: String, seqLen: Long): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr, explode, sequence, greatest, least, lit}
    require(seqLen > 0, "seqLen must be positive")
    graft.operators.Joins.globalPrefixSum(df, orderBy, col(tokenCol), "_pk_end")
      .filter(col(tokenCol) > 0)
      .withColumn("_pk_start", col("_pk_end") - col(tokenCol).cast("long"))
      .withColumn("seq_id",
        explode(sequence(expr(s"_pk_start div $seqLen"),
          expr(s"(_pk_end - 1) div $seqLen"))))
      .withColumn("_w0", col("seq_id") * lit(seqLen))
      .withColumn("seq_offset", greatest(col("_pk_start"), col("_w0")) - col("_w0"))
      .withColumn("doc_offset", greatest(col("_pk_start"), col("_w0")) - col("_pk_start"))
      .withColumn("span_len",
        least(col("_pk_end"), col("_w0") + lit(seqLen))
          - greatest(col("_pk_start"), col("_w0")))
      .drop("_pk_end", "_pk_start", "_w0")
  }

  /** Bucketed table write — the storage layout for repeated co-located
    * joins/aggregations at 100 TB: rows hash-bucketed (and optionally
    * sorted) on the join key, so a join between two tables bucketed the
    * same way on the same key runs with ZERO Exchange (and, when both
    * sides are sorted, zero Sort) — the shuffle is paid once at write
    * time instead of on every query. Requires `saveAsTable` (bucket
    * metadata lives in the catalog, not the parquet files).
    */
  def writeBucketed(df: DataFrame, table: String, bucketCols: Seq[String],
                    numBuckets: Int, sortCols: Seq[String] = Nil): Unit = {
    val w = df.write
      .mode(SaveMode.Overwrite)
      .format("parquet")
      .bucketBy(numBuckets, bucketCols.head, bucketCols.tail: _*)
    val sorted = if (sortCols.nonEmpty) w.sortBy(sortCols.head, sortCols.tail: _*) else w
    sorted.saveAsTable(table)
  }

  /** Z-order (Morton) sort key over 2+ columns — the multi-column
    * data-skipping layout: each column is normalized to a `bits`-wide
    * integer bucket between its min and max, and the bucket bits are
    * interleaved so rows close in EVERY dimension land close in the
    * sort order. A file/row group then owns a small hyper-rectangle of
    * the value space, and parquet min/max stats prune on ANY of the
    * z-ordered columns — where a plain sort prunes only its leading
    * column. Numeric and timestamp columns supported; nulls sort
    * first (bucket 0).
    *
    * `bits` per column × #cols must fit a long (≤ 63); 12 bits ≈ 4096
    * buckets per dimension is plenty for file-level skipping.
    *
    * NOTE: building the key runs one eager min/max aggregation over
    * `df` — a full scan (cheap per row, but a real pass at 100 TB; at
    * write time it is amortized into the write job that follows).
    * Columns must be numeric, timestamp, or date; an empty frame or an
    * all-null column degrades to bucket 0 for that column rather than
    * failing the write.
    */
  def zOrderKey(df: DataFrame, cols: Seq[String], bits: Int = 12): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions.{col, lit, coalesce, unix_date, unix_micros, shiftleft, shiftright, min => fmin, max => fmax}
    import org.apache.spark.sql.types.{DateType, NumericType, TimestampType}
    require(cols.size >= 2, "z-order needs at least 2 columns (use a plain sort for 1)")
    require(bits * cols.size <= 63, s"bits($bits) x cols(${cols.size}) must fit a long")
    cols.foreach { c =>
      df.schema(c).dataType match {
        case TimestampType | DateType => ()
        case _: NumericType => ()
        case other => throw new IllegalArgumentException(
          s"z-order column '$c' has unsupported type ${other.simpleString}: " +
            "numeric, timestamp, or date required")
      }
    }
    def numeric(c: String): org.apache.spark.sql.Column =
      df.schema(c).dataType match {
        case TimestampType => unix_micros(col(c)).cast("double")
        case DateType => unix_date(col(c)).cast("double")
        case _ => col(c).cast("double")
      }
    // one tiny driver-side agg for the per-column ranges
    val aggs = cols.flatMap(c => Seq(fmin(numeric(c)), fmax(numeric(c))))
    val row = df.agg(aggs.head, aggs.tail: _*).head()
    val buckets = cols.zipWithIndex.map { case (c, i) =>
      // min/max are null on an empty frame or an all-null column —
      // fall back to a degenerate (0,1) range: every row (there are
      // none, or all-null) lands in bucket 0 via the row-level coalesce
      val (lo, hi) =
        if (row.isNullAt(2 * i) || row.isNullAt(2 * i + 1)) (0.0, 1.0)
        else (row.getDouble(2 * i), row.getDouble(2 * i + 1))
      val span = if (hi > lo) hi - lo else 1.0
      val maxB = (1L << bits) - 1
      coalesce(((numeric(c) - lit(lo)) / lit(span) * lit(maxB.toDouble))
        .cast("long"), lit(0L))
    }
    // interleave: bit i of column j lands at position i*#cols + j
    (0 until bits).foldLeft(lit(0L)) { (acc, i) =>
      cols.indices.foldLeft(acc) { (a, j) =>
        a.bitwiseOR(shiftleft(
          shiftright(buckets(j), i).bitwiseAND(lit(1L)), i * cols.size + j))
      }
    }
  }

  /** Z-ordered parquet write: range-partition + sort by [[zOrderKey]]
    * so every output file and row group owns a tight hyper-rectangle
    * in (cols)-space — selective predicates on ANY of the columns then
    * skip most of the table via footer stats. The multi-column
    * counterpart of the single-column sort-on-write layout (SCALE.md,
    * LayoutProbe); shuffle paid once at write time.
    */
  /** The pre-write z-ordered frame — exposed so PlanAuditSpec can pin
    * the layout plan (range Exchange on `_zkey`, local Sort below the
    * dropping Project): the write relies on Project preserving child
    * ordering after `drop("_zkey")`, which is true today but not a
    * documented optimizer contract — the pin turns a future silent
    * unsort into a CI failure.
    */
  def zOrdered(df: DataFrame, cols: Seq[String],
               numFiles: Int = 128, bits: Int = 12): DataFrame = {
    import org.apache.spark.sql.functions.col
    df.withColumn("_zkey", zOrderKey(df, cols, bits))
      .repartitionByRange(numFiles, col("_zkey"))
      .sortWithinPartitions("_zkey")
      .drop("_zkey")
  }

  def writeZOrdered(df: DataFrame, path: String, cols: Seq[String],
                    numFiles: Int = 128, bits: Int = 12): Unit =
    zOrdered(df, cols, numFiles, bits)
      .write.mode(SaveMode.Overwrite).parquet(path)

  /** Small-file compaction: rewrite a parquet dataset into
    * ~`targetBytes` files. Continuous ingestion (CorpusStream's
    * per-batch dynamic overwrites, hourly event drops) accretes
    * KB-scale files — one per task per micro-batch — and at 100 TB a
    * scan then pays millions of file opens, tiny row groups, and
    * footer stats too fragmented to skip with. Compaction is the
    * standing maintenance job that repairs this.
    *
    * Sizing comes from the actual on-disk bytes (`spark.read`'s file
    * index), not a row-count guess, so the output lands at target size
    * regardless of schema width or encoding.
    *
    * Two regimes, chosen by `sortCol`:
    *   - None: `coalesce` — a NARROW merge of neighbor files, zero
    *     shuffle; the cheapest possible rewrite when layout doesn't
    *     matter.
    *   - Some(c): `repartitionByRange(c) + sortWithinPartitions(c)` —
    *     one shuffle that simultaneously compacts AND restores the
    *     sort-on-write skipping layout (LayoutProbe's discipline);
    *     fragmented ingest usually destroyed it anyway.
    *
    * Writes to `outPath` then atomically swaps only if `outPath` ==
    * `inPath` is NOT requested — in-place compaction of a live dataset
    * needs a transactional table format; this operator keeps rewrite
    * and swap explicit and separate (write → verify → point readers).
    */
  /** Partition-pruned MERGE: apply a delta to a partitioned parquet
    * table rewriting ONLY the partitions the delta touches — the shape
    * that makes [[graft.operators.Joins.upsert]] viable on a 100 TB
    * table, where "merge then rewrite everything" is a non-starter.
    * Cost ∝ affected-partition bytes + delta, never table size: the
    * base read partition-prunes to the delta's partition values, the
    * merge is the standard broadcast-anti upsert, and the write is a
    * dynamic partition overwrite that replaces exactly those
    * partitions (new partition values insert their directories).
    *
    * Contract: `partitionCol` must be IMMUTABLE per key, the standard
    * constraint for MERGE on a partitioned table — a delta row that
    * moves a key to a new partition value would insert there while the
    * stale row survives unread in its old partition. Delta rows must
    * carry `partitionCol`.
    *
    * The per-partition overwrite is parquet's non-transactional one
    * (same residual as CorpusStream documents): a reader racing the
    * swap of an AFFECTED partition can see it torn — and a failure
    * DURING the write's commit phase is strictly worse: dynamic
    * overwrite replaces affected partition directories one by one, so a
    * crash mid-commit leaves some affected partitions replaced and
    * others stale, with no rollback (the stale ones still hold their
    * pre-merge rows; re-running the same upsert to completion repairs
    * them, since the merge is idempotent for a given delta). Untouched
    * partitions are never written. For read isolation AND atomic
    * publish put the table under [[Versioned]] and merge-then-publish
    * instead — this operator trades that atomicity for rewriting only
    * the affected bytes.
    *
    * Partition values compare as DIRECTORY STRINGS end to end: the
    * base is read with partition-column type inference OFF (the column
    * surfaces as the literal directory string) and the delta's
    * partition column is cast to string before the merge. Without
    * this, inference can remap a string partition value — a directory
    * `part=01` reads back as int 1, the delta's "01" matches no base
    * row, and the write lands in a NEW `part=1` directory while the
    * original survives unread: silent duplication. With it, the
    * directory this operator overwrites is exactly the directory it
    * read. (Residual, documented not fixed: a reader that re-applies
    * lossy inference can still conflate `part=01` with `part=1` if
    * both exist — don't mix writers that disagree on the rendering of
    * a partition value.) The output table's partition column is
    * therefore string-typed on re-read under inference-off readers;
    * inference-on readers see the same types they always did.
    *
    * Null delta partition values are refused loudly — parquet renders
    * them as the `__HIVE_DEFAULT_PARTITION__` directory and no base
    * filter can round-trip that; a MERGE key's partition should never
    * be null.
    *
    * The distinct partition-value collect is delta-sized by contract
    * (one value per touched partition) — the same driver-bound class
    * as the broadcast delta itself. Returns the affected values for
    * observability.
    */
  def upsertPartitioned(spark: org.apache.spark.sql.SparkSession,
                        root: String, updates: DataFrame,
                        keys: Seq[String], partitionCol: String,
                        versionOrder: Option[org.apache.spark.sql.Column] = None)
      : Seq[String] = {
    require(updates.columns.contains(partitionCol),
      s"upsertPartitioned: updates must carry the partition column $partitionCol")
    import org.apache.spark.sql.functions.col
    val affectedRaw = updates.select(col(partitionCol).cast("string"))
      .distinct().collect().map(r => Option(r.getString(0)))
    require(!affectedRaw.contains(None),
      s"upsertPartitioned: null $partitionCol in updates — a null partition " +
        "value cannot be round-tripped through a partition directory; fix the " +
        "delta upstream")
    val affected = affectedRaw.flatten.toSeq.sorted
    // the partition column must come back as the literal directory
    // string (so the isin below matches directories, not inferred
    // re-renderings like "01" → 1 → a phantom part=1 dir). Read with
    // an EXPLICIT schema that pins partitionCol to string — a per-read
    // override, unlike the earlier session-conf toggle which briefly
    // changed partition inference for every concurrent reader in the
    // SparkSession
    val inferred = spark.read.parquet(root).schema
    val pinned = org.apache.spark.sql.types.StructType(inferred.map(f =>
      if (f.name == partitionCol)
        f.copy(dataType = org.apache.spark.sql.types.StringType)
      else f))
    val base = spark.read.schema(pinned).parquet(root)
    val pruned = base.filter(col(partitionCol).isin(affected: _*))
    val updStr = updates.withColumn(partitionCol, col(partitionCol).cast("string"))
    val merged = graft.operators.Joins.upsert(
      pruned.select(updStr.columns.map(col): _*), updStr, keys, versionOrder)
    merged.write.mode(SaveMode.Overwrite)
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy(partitionCol)
      .parquet(root)
    affected
  }

  def compact(df: DataFrame, inPath: String, outPath: String,
              targetBytes: Long = 128L << 20,
              sortCol: Option[String] = None): Int = {
    require(inPath != outPath,
      "in-place compaction is not atomic on parquet — write aside, then swap")
    val spark = df.sparkSession
    val fs = new Path(inPath).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val totalBytes = fs.listFiles(new Path(inPath), true) match {
      case it =>
        var sum = 0L
        while (it.hasNext) {
          val f = it.next()
          if (f.getPath.getName.endsWith(".parquet")) sum += f.getLen
        }
        sum
    }
    val numFiles = math.max(1, math.ceil(totalBytes.toDouble / targetBytes).toInt)
    val out = sortCol match {
      case Some(c) =>
        import org.apache.spark.sql.functions.col
        df.repartitionByRange(numFiles, col(c)).sortWithinPartitions(c)
      case None => df.coalesce(numFiles)
    }
    out.write.mode(SaveMode.Overwrite).parquet(outPath)
    numFiles
  }

  /** Versioned table root — the manifest-swap recipe that makes
    * [[compact]] (and any full rewrite) safe under CONCURRENT readers
    * without a transactional table format. Layout:
    *
    * {{{
    *   root/
    *     _manifest-00000   # content: "v00000" — highest seq wins
    *     v00000/part-... .parquet
    *     v00001/part-... .parquet  # being written, unreferenced until its manifest lands
    * }}}
    *
    * Invariants that make mid-rewrite reads safe:
    *   - data dirs are IMMUTABLE once their manifest exists: a rewrite
    *     always targets a fresh `v{seq}` dir, never a referenced one;
    *   - a manifest is published by writing `.tmp-manifest-{seq}` and
    *     renaming it to `_manifest-{seq}` — a rename to a FRESH name in
    *     the same directory, atomic on POSIX and HDFS, so a reader
    *     listing manifests sees the new one fully written or not at all;
    *   - readers resolve max-seq manifest → dir at scan-set time; a
    *     reader that resolved the OLD version keeps reading a complete,
    *     untouched dir (old versions are retained until [[vacuumVersioned]],
    *     whose `keep` is the reader grace window).
    *
    * So a read concurrent with compaction yields either the old or the
    * new COMPLETE layout — never a partially-written or half-deleted mix.
    * Spec: ShardsSpec "compactVersioned under a concurrent reader".
    *
    * SINGLE-WRITER contract: the isolation proof above covers
    * concurrent READERS only. Two concurrent writers both resolve
    * max-seq and target the same next `v{seq}`: each one's
    * [[clearOrphan]] can delete the other's in-flight data dir (an
    * unpublished dir is indistinguishable from a crash orphan), and
    * the loser of the manifest rename race fails with an IOException
    * after its data may already have been clobbered. Run write/compact/
    * snapshot from ONE maintenance job at a time — the same external
    * coordination contract as [[snapshot]]'s note, and the standard
    * one for non-transactional table maintenance. (A filesystem-level
    * claim marker cannot close this on stores without atomic
    * create-exclusive semantics, so the contract is documented rather
    * than half-enforced.)
    */
  object Versioned {
    private val ManifestPrefix = "_manifest-"

    private def fs(spark: org.apache.spark.sql.SparkSession, root: String) =
      new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)

    private def manifests(spark: org.apache.spark.sql.SparkSession,
                          root: String): Seq[(Int, Path)] = {
      val f = fs(spark, root)
      val rootPath = new Path(root)
      if (!f.exists(rootPath)) Seq.empty
      else f.listStatus(rootPath).toSeq
        .map(_.getPath)
        .filter(_.getName.startsWith(ManifestPrefix))
        .map(p => (p.getName.stripPrefix(ManifestPrefix).toInt, p))
        .sortBy(_._1)
    }

    /** All published version seqs, ascending — the time-travel index. */
    def versions(spark: org.apache.spark.sql.SparkSession,
                 root: String): Seq[Int] =
      manifests(spark, root).map(_._1)

    /** Read a SPECIFIC published version (time travel — the other half of
      * the retention story: `vacuum`'s `keep` bounds how far back this
      * reaches). Resolves through the version's own manifest, same as
      * [[read]], so an unpublished or vacuumed seq fails loudly rather
      * than scanning a half-written dir.
      */
    def readAt(spark: org.apache.spark.sql.SparkSession, root: String,
               seq: Int): DataFrame = {
      val (_, p) = manifests(spark, root).find(_._1 == seq).getOrElse(
        throw new java.io.FileNotFoundException(
          s"version $seq not published (or vacuumed) under $root"))
      val f = fs(spark, root)
      val in = f.open(p)
      val dir = try scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim
                finally in.close()
      spark.read.parquet(s"$root/$dir")
    }

    /** The live version's seq and data dir, from the max-seq manifest. */
    def current(spark: org.apache.spark.sql.SparkSession,
                root: String): Option[(Int, String)] =
      manifests(spark, root).lastOption.map { case (seq, p) =>
        val f = fs(spark, root)
        val in = f.open(p)
        val dir = try scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim
                  finally in.close()
        (seq, s"$root/$dir")
      }

    private def publish(spark: org.apache.spark.sql.SparkSession,
                        root: String, seq: Int): Unit = {
      val f = fs(spark, root)
      val tmp = new Path(root, f".tmp-manifest-$seq%05d")
      // self-heal: a crash between create and rename leaves a stale tmp
      // for this seq; it was never referenced, so retrying the publish
      // must replace it rather than wedge on create(overwrite = false)
      if (f.exists(tmp)) f.delete(tmp, false)
      val out = f.create(tmp, false)
      try out.write(f"v$seq%05d".getBytes("UTF-8")) finally out.close()
      val fin = new Path(root, f"$ManifestPrefix$seq%05d")
      if (!f.rename(tmp, fin))
        throw new java.io.IOException(s"manifest publish failed: $tmp -> $fin")
    }

    /** Self-heal before writing version `seq`: a `v{seq}` dir with no
      * manifest is an orphan from a crashed earlier attempt (the seq is
      * always max published + 1, and a dir becomes immutable only once
      * its manifest lands) — never referenced by any reader, so the
      * retry deletes and rewrites it instead of wedging forever on
      * ErrorIfExists. Without this, one SIGKILL mid-write would make
      * every subsequent maintenance run of the standing job fail.
      */
    private def clearOrphan(spark: org.apache.spark.sql.SparkSession,
                            root: String, seq: Int): Unit = {
      val f = fs(spark, root)
      val dir = new Path(root, f"v$seq%05d")
      if (f.exists(dir)) f.delete(dir, true): Unit
    }

    /** Write `df` as the next version and publish its manifest. Returns
      * the new seq. The data write completes BEFORE the manifest rename,
      * so the version is never referenced while partial.
      */
    def write(df: DataFrame, root: String): Int = {
      val spark = df.sparkSession
      val seq = manifests(spark, root).lastOption.map(_._1 + 1).getOrElse(0)
      clearOrphan(spark, root, seq)
      df.write.mode(SaveMode.ErrorIfExists).parquet(f"$root/v$seq%05d")
      publish(spark, root, seq)
      seq
    }

    /** Read the live version. Scan set resolves NOW: the returned frame
      * keeps reading this complete dir even if a newer version lands.
      */
    def read(spark: org.apache.spark.sql.SparkSession, root: String): DataFrame =
      spark.read.parquet(current(spark, root)
        .getOrElse(throw new java.io.FileNotFoundException(
          s"no published version under $root"))._2)

    /** [[Sinks.compact]] against a versioned root: compacts the live
      * version into the next one and publishes it. Readers mid-flight
      * stay on the old complete dir; new readers get the new one.
      */
    def compact(spark: org.apache.spark.sql.SparkSession, root: String,
                targetBytes: Long = 128L << 20,
                sortCol: Option[String] = None): Int = {
      val (seq, dir) = current(spark, root).getOrElse(
        throw new java.io.FileNotFoundException(s"no published version under $root"))
      clearOrphan(spark, root, seq + 1)
      Sinks.compact(spark.read.parquet(dir), dir, f"$root/v${seq + 1}%05d",
        targetBytes, sortCol)
      publish(spark, root, seq + 1)
      seq + 1
    }

    /** Publish a compacted SNAPSHOT of an external directory as this
      * root's next version — the maintenance step that pairs with a
      * continuously-appending sink (CorpusStream's `accepted/` accretes
      * per-batch small files, and its documented caveat is that readers
      * of the LIVE sink can observe a torn batch between a crash and
      * its replay). Consumers that read through the versioned root
      * instead see only complete, compacted snapshots: the stream keeps
      * sole ownership of the live dir, this step copies-compacts it
      * aside, and the manifest swap is atomic. Returns the new seq.
      *
      * Coordination contract: call this while no writer is COMMITTING
      * into `srcDir` — for the AvailableNow ingest used here, between
      * drains (each `ingest(...).awaitTermination()` returns with every
      * batch fully committed), which is how a maintenance tick naturally
      * interleaves anyway. A snapshot racing a mid-commit batch would
      * list a subset of that batch's part files and pin the partial
      * state into an immutable version — the source dir has no manifest
      * of its own to make the listing atomic (that is this API's job,
      * one level up). Same residual caveat as the ingest documents:
      * hard isolation against a concurrently-committing writer needs a
      * transactional table format on the SOURCE side too.
      */
    def snapshot(spark: org.apache.spark.sql.SparkSession, srcDir: String,
                 root: String, targetBytes: Long = 128L << 20,
                 sortCol: Option[String] = None): Int = {
      val seq = manifests(spark, root).lastOption.map(_._1 + 1).getOrElse(0)
      clearOrphan(spark, root, seq)
      Sinks.compact(spark.read.parquet(srcDir), srcDir, f"$root/v$seq%05d",
        targetBytes, sortCol)
      publish(spark, root, seq)
      seq
    }

    /** Drop all but the newest `keep` versions (dirs + manifests). `keep`
      * is the reader grace window: never vacuum below 2 while readers may
      * hold last-version scan sets.
      */
    def vacuum(spark: org.apache.spark.sql.SparkSession, root: String,
               keep: Int = 2): Int = {
      require(keep >= 1, "keep >= 1")
      val ms = manifests(spark, root)
      val f = fs(spark, root)
      val stale = ms.dropRight(keep)
      stale.foreach { case (seq, p) =>
        f.delete(new Path(root, f"v$seq%05d"), true)
        f.delete(p, false): Unit
      }
      stale.size
    }
  }

  /** K5: console report — formatted summary rows (the reference's primary
    * human output in DOP VP Compare.py:188-223). Small frames only.
    */
  def consoleReport(df: DataFrame, title: String, maxRows: Int = 100): String = {
    val header = df.columns.mkString(" | ")
    val lines = df.limit(maxRows).collect().map(_.toSeq.map {
      case null => "NULL"
      case d: Double => f"$d%,.2f"
      case x => x.toString
    }.mkString(" | "))
    val out = (Seq(s"== $title ==", header) ++ lines).mkString("\n")
    println(out)
    out
  }
}
