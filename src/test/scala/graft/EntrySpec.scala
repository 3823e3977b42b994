package graft

import graft.operators.Multimodal
import graft.sources.FileSources
import org.apache.spark.sql.functions._

/** Driver-contract smoke tests + sources + multimodal plumbing. */
class EntrySpec extends SparkSpec {

  test("entry returns rows on sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracleSql key has a queries entry") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracle without query: $missing")
  }

  test("all queries run and return rows on sf0.001 (except anti-join)") {
    val mayBeEmpty = Set("q_j4_anti", "q_jaccard_pairs", "q_minhash_pairs", "q_simhash_pairs")
    SparkEntry.queries.foreach { case (name, fn) =>
      val n = fn(spark, sf).count()
      assert(n >= 0, s"$name failed")
      if (!mayBeEmpty(name)) assert(n > 0, s"$name returned 0 rows")
    }
  }

  test("latestFile picks lexicographic max by name (S12)") {
    val dir = java.nio.file.Files.createTempDirectory("latest").toString
    java.nio.file.Files.writeString(java.nio.file.Paths.get(dir, "2024-01-x.csv"), "a")
    java.nio.file.Files.writeString(java.nio.file.Paths.get(dir, "2024-03-x.csv"), "a")
    java.nio.file.Files.writeString(java.nio.file.Paths.get(dir, "other.txt"), "a")
    val got = FileSources.latestFile(spark, dir, "^\\d{4}-\\d{2}-x\\.csv$")
    assert(got.exists(_.endsWith("2024-03-x.csv")))
  }

  test("csv round-trip with UTF-8 and flattenRecords on nested json (S1/S10)") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("src").toString
    Seq(("a", 1), ("b", 2)).toDF("k", "v").write.option("header", "true").csv(s"$dir/c")
    val back = FileSources.csv(spark, s"$dir/c")
    assert(back.count() == 2 && back.columns.toSeq == Seq("k", "v"))
    java.nio.file.Files.writeString(java.nio.file.Paths.get(dir, "n.json"),
      """{"wrapper": [{"x": 1, "y": "a"}, {"x": 2, "y": "b"}]}""")
    val flat = FileSources.flattenRecords(
      FileSources.jsonWholeDoc(spark, s"$dir/n.json"), "wrapper")
    assert(flat.columns.sorted.toSeq == Seq("x", "y") && flat.count() == 2)
  }

  test("multimodal: probeMeta deterministic, sampleFrames fans out (stubbed codec)") {
    val docs = Tables.documents(spark, sf).limit(10)
    val withMedia = Multimodal.withFakeMedia(docs, "text")
    val meta = Multimodal.probeMeta(spark, withMedia, "doc_id")
    assert(meta.count() == 10)
    assert(meta.filter(col("n_bytes") =!= 16).count() == 0) // md5 = 16 bytes
    val frames = Multimodal.sampleFrames(spark, withMedia, "doc_id", 3)
    assert(frames.count() == 30)
  }
}
