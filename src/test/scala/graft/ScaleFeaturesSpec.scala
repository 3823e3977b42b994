package graft

import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Partition pruning and bucketed co-located joins — the two storage-side
  * levers that matter most at 100 TB, demonstrated and plan-asserted on
  * local data.
  */
class ScaleFeaturesSpec extends SparkSpec {

  test("date/key-partitioned write + scan prunes partitions at the source") {
    val dir = Files.createTempDirectory("part").toString
    Tables.documents(spark, sf)
      .write.partitionBy("lang").mode("overwrite").parquet(s"$dir/docs")
    val df = spark.read.parquet(s"$dir/docs").filter(col("lang") === "en")
    df.collect()
    val scan = df.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters") && scan.contains("= en)"),
      s"partition filter did not reach the scan:\n$scan")
    // the filter is partition-metadata-only: no data filter needed at all
    assert(scan.contains("DataFilters: []"),
      s"lang filter should be satisfied by pruning alone:\n$scan")
    val expected = Tables.documents(spark, sf).filter(col("lang") === "en").count()
    assert(df.count() == expected)
  }

  test("bucketed tables join without a shuffle exchange") {
    val prevBroadcast = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force non-broadcast
    try {
      Tables.orders(spark, sf).write
        .bucketBy(4, "o_custkey").sortBy("o_custkey")
        .mode("overwrite").saveAsTable("orders_b")
      Tables.customer(spark, sf).write
        .bucketBy(4, "c_custkey").sortBy("c_custkey")
        .mode("overwrite").saveAsTable("customer_b")
      val j = spark.table("orders_b").join(
        spark.table("customer_b"),
        col("o_custkey") === col("c_custkey"))
      j.collect()
      val p = j.queryExecution.executedPlan.toString
      assert(!p.contains("Exchange hashpartitioning"),
        s"bucketed join still shuffles:\n$p")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBroadcast)
      spark.sql("DROP TABLE IF EXISTS orders_b")
      spark.sql("DROP TABLE IF EXISTS customer_b")
    }
  }
}
