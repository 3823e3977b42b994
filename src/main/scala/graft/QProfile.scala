package graft
import org.apache.spark.sql.functions._
object QProfile {
  def main(args: Array[String]): Unit = {
    val spark = Engine.session("qprofile", 32)
    val sf = args(0)
    def time(name: String)(f: => Long): Unit =
      for (pass <- 1 to 3) {
        val t0 = System.nanoTime()
        val n = f
        println(f"[qprofile] $name pass=$pass rows=$n t=${(System.nanoTime() - t0) / 1e9}%.2f")
      }
    import graft.operators.Domains
    val base = SparkEntry.queries("q_url_canon")(spark, sf)
      .select(col("doc_id"), col("url"))
      .withColumn("host", Domains.hostOf(col("url")))
      .select("doc_id", "host").cache()
    base.count()
    val h = col("host")
    val oldForm = {
      val labels = split(h, "\\.")
      val last2 = concat_ws(".", element_at(labels, -2), element_at(labels, -1))
      val last3 = concat_ws(".",
        element_at(labels, -3), element_at(labels, -2), element_at(labels, -1))
      val suffixes = Domains.multiPartSuffixes.map(lit(_))
      when(size(labels) <= 2, h)
        .otherwise(when(array_contains(array(suffixes: _*), last2), last3)
          .otherwise(last2))
    }
    time("old_split_form") { base.filter(length(oldForm) > 0).count() }
    time("new_substrindex_form") { base.filter(
      length(Domains.registeredDomain(h)) > 0).count() }
    base.unpersist()
    spark.stop()
  }
}
