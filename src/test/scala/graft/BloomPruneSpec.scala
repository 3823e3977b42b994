package graft

import graft.operators.Joins
import org.apache.spark.sql.functions._

/** Bloom semi-join reduction: exactness through false positives, actual
  * pruning power, and degenerate inputs.
  */
class BloomPruneSpec extends SparkSpec {
  import spark.implicits._

  private lazy val big = (1L to 2000L).map(i => (i, s"row$i"))
    .toDF("k", "payload")
  private lazy val small = Seq(3L, 7L, 500L, 1999L).map(k => (k, s"dim$k"))
    .toDF("dk", "dim")

  test("pruned join equals the plain join exactly") {
    val pruned = Joins.bloomPrune(big, "k", small, "dk",
      expectedItems = 10L, fpp = 0.01)
    val viaBloom = pruned.join(small, pruned("k") === small("dk"))
      .select("k", "payload", "dim").collect().toSet
    val plain = big.join(small, big("k") === small("dk"))
      .select("k", "payload", "dim").collect().toSet
    assert(viaBloom == plain && plain.size == 4)
  }

  test("the prune actually drops the non-matching bulk") {
    val pruned = Joins.bloomPrune(big, "k", small, "dk",
      expectedItems = 10L, fpp = 0.01)
    val n = pruned.count()
    // 4 true matches + fpp·1996 false positives; at 1% a pass-through
    // prune (n = 2000) would mean the filter predicate never ran
    assert(n >= 4 && n <= 200, s"pruned to $n rows")
    // no false negatives ever: every true match survives
    assert(pruned.join(small, pruned("k") === small("dk")).count() == 4)
  }

  test("empty and null-only build sides prune everything") {
    val none = Seq.empty[(Long, String)].toDF("dk", "dim")
    assert(Joins.bloomPrune(big, "k", none, "dk").isEmpty)
    val nulls = Seq((null.asInstanceOf[java.lang.Long], "x"))
      .toDF("dk", "dim")
    assert(Joins.bloomPrune(big, "k", nulls, "dk").isEmpty)
  }

  test("null probe keys cannot fabricate matches") {
    val bigN = big.unionByName(Seq((null.asInstanceOf[java.lang.Long], "nullrow"))
      .toDF("k", "payload"))
    val pruned = Joins.bloomPrune(bigN, "k", small, "dk",
      expectedItems = 10L, fpp = 0.01)
    assert(pruned.join(small, pruned("k") === small("dk")).count() == 4)
  }
}
