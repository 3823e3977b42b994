package graft

/** Plan reader for any `SparkEntry.queries` entry:
  * `runMain graft.Explain <sfDir> <query...>` prints each query's
  * FORMATTED plan (the post-AQE initial physical plan — scans,
  * exchanges, pushed filters, codegen spans). The standing review
  * loop: after an operator is correct, read its plan here and iterate
  * until it is the plan you'd WANT at 100 TB, not the first one that
  * passed (unpushed filters, avoidable exchanges, missing broadcasts,
  * WSCG gaps).
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val spark = Engine.session("graft-explain",
      sys.env.get("SPARK_GRAFT_CPUS").map(_.toInt).getOrElse(8))
    spark.sparkContext.setLogLevel("WARN")
    val sfDir = args(0)
    for (q <- args.drop(1)) {
      val df = SparkEntry.queries(q)(spark, sfDir)
      println(s"\n=== $q ===")
      println(df.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted")))
    }
    spark.stop()
  }
}
