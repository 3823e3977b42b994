package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew mitigation measured, not asserted: `runMain graft.SkewProbe
  * <sfDir>` rewrites 30% of the events fact table onto ONE hot key,
  * then times the same fact×dim join-aggregate three ways:
  *
  *   1. plain shuffle join, AQE skew handling OFF — the pathological
  *      baseline (one straggler task owns 30% of the fact side);
  *   2. plain shuffle join, AQE skew-join ON — Spark's runtime split
  *      (the engine default, Engine.session enables AQE);
  *   3. `Joins.saltedJoin` — the manual mitigation for engines/ops AQE
  *      does not cover (skewed aggregations, pre-AQE clusters).
  *
  * All three must produce identical aggregates (asserted). Broadcast is
  * disabled for the probe joins — at 100 TB the dimension side of a
  * skewed join does not broadcast, which is the only regime where skew
  * matters at all.
  */
object SkewProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/repo/testdata-sf10"
    val hotTenths = if (args.length > 1) args(1).toInt else 3
    val cpus = sys.env.get("SPARK_GRAFT_CPUS").map(_.toInt).getOrElse(32)
    val spark = Engine.session("graft-skewprobe", cpus)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    println(s"[skew] hot key owns ${hotTenths * 10}% of the fact side")

    val fact = Tables.events(spark, sfDir)
      .select(col("event_id"), col("user_id"), col("value"))
      .withColumn("user_id",
        when(pmod(col("event_id"), lit(10)) < hotTenths, lit(-1L))
          .otherwise(col("user_id")))
    val dim = fact.select("user_id").distinct()
      .withColumn("segment", pmod(col("user_id"), lit(7)))
    dim.write.mode("overwrite").parquet("/tmp/skew_dim.parquet")
    val dimP = spark.read.parquet("/tmp/skew_dim.parquet")

    def agg(joined: DataFrame): DataFrame =
      joined.groupBy("segment")
        .agg(count(lit(1)).as("n"), sum("value").as("total"))
        .orderBy("segment")

    def time(name: String, skewJoin: Boolean)(f: => DataFrame): Array[org.apache.spark.sql.Row] = {
      spark.conf.set("spark.sql.adaptive.enabled", skewJoin.toString)
      spark.conf.set("spark.sql.adaptive.skewJoin.enabled", skewJoin.toString)
      val t0 = System.nanoTime()
      val rows = f.collect()
      println(f"[skew] $name: ${(System.nanoTime() - t0) / 1e9}%.1f s")
      rows
    }

    val plain = time("plain shuffle join, AQE skew OFF", skewJoin = false) {
      agg(fact.join(dimP, Seq("user_id")))
    }
    val aqe = time("plain shuffle join, AQE skew ON ", skewJoin = true) {
      agg(fact.join(dimP, Seq("user_id")))
    }
    val salted = time("saltedJoin(32), AQE skew OFF   ", skewJoin = false) {
      agg(operators.Joins.saltedJoin(fact, dimP, "user_id", buckets = 32))
    }
    // counts must match exactly; double totals only within relative
    // tolerance — the three physical plans accumulate in different orders
    def check(a: Array[org.apache.spark.sql.Row], b: Array[org.apache.spark.sql.Row], name: String): Unit = {
      require(a.length == b.length, s"$name: row count differs")
      a.zip(b).foreach { case (x, y) =>
        require(x.get(0) == y.get(0) && x.getLong(1) == y.getLong(1),
          s"$name: segment/count differ: $x vs $y")
        val (tx, ty) = (x.getDouble(2), y.getDouble(2))
        require(math.abs(tx - ty) <= 1e-9 * math.max(math.abs(tx), math.abs(ty)),
          s"$name: totals beyond fp tolerance: $tx vs $ty")
      }
    }
    check(plain, aqe, "aqe")
    check(plain, salted, "salted")
    println("[skew] all three variants agree (counts exact, totals within fp tolerance)")
    spark.stop()
  }
}
