package graft

import graft.sources.Sinks
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Sharded training-data writes: partition layout + pruned read-back. */
class ShardsSpec extends SparkSpec {

  test("writeShards: hive partitions by lang, range shards by doc_id, pruned read") {
    val dir = Files.createTempDirectory("shards").toString
    val docs = Tables.documents(spark, sf)
    Sinks.writeShards(docs, s"$dir/out", Seq("lang"), "doc_id", shards = 2)

    val langDirs = new java.io.File(s"$dir/out").listFiles()
      .filter(_.isDirectory).map(_.getName).sorted
    assert(langDirs.forall(_.startsWith("lang=")), s"unexpected layout: ${langDirs.toSeq}")

    val back = spark.read.parquet(s"$dir/out")
    assert(back.count() == docs.count())
    val en = back.filter(col("lang") === "en")
    en.collect()
    val plan = en.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("= en)"),
      "read-back not partition-pruned")
  }
}
