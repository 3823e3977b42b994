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

  test("writeShards json: gzip JSONL interchange layout round-trips") {
    val dir = Files.createTempDirectory("shards_json").toString
    val docs = Tables.documents(spark, sf).select("doc_id", "lang", "text")
    Sinks.writeShards(docs, s"$dir/out", Seq("lang"), "doc_id", shards = 2,
      format = "json")
    val files = new java.io.File(s"$dir/out").listFiles()
      .filter(_.isDirectory).flatMap(_.listFiles()).map(_.getName)
    assert(files.exists(_.endsWith(".json.gz")), s"no gzip JSONL files: ${files.toSeq}")
    val back = spark.read.json(s"$dir/out")
    assert(back.count() == docs.count())
    assert(back.columns.sorted.toSeq == Seq("doc_id", "lang", "text"))
    intercept[IllegalArgumentException] {
      Sinks.writeShards(docs, s"$dir/bad", Seq("lang"), "doc_id", 2, format = "orc2")
    }
  }
}
