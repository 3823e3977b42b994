package graft

import graft.operators.{Dedup, Joins}
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Properties, Test}

/** ScalaCheck algebraic invariants for the dedup/join/union families
  * (SURVEY §5 test plan). Each case spins a small Spark job — kept to 10
  * successful cases per property.
  */
object PropertySpec extends Properties("graft") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(10).withWorkers(1)

  private lazy val spark = SparkSpec.sharedSession
  import spark.implicits._

  private val rowGen: Gen[(Int, String, Int)] = for {
    k <- Gen.choose(0, 5)
    s <- Gen.oneOf("a", "b", "c")
    v <- Gen.choose(0, 100)
  } yield (k, s, v)

  private val tableGen: Gen[List[(Int, String, Int)]] =
    Gen.listOfN(30, rowGen)

  property("dedupKeepFirst: one row per key, every row from input") =
    Prop.forAll(tableGen) { rows =>
      val df = rows.toDF("k", "s", "v")
      val out = Dedup.dedupKeepFirst(df, Seq("k"), Seq(col("s"), col("v")))
        .collect().map(r => (r.getInt(0), r.getString(1), r.getInt(2)))
      val keys = rows.map(_._1).toSet
      out.length == keys.size &&
        out.map(_._1).toSet == keys &&
        out.forall(rows.contains)
    }

  property("dedupKeepFirst picks the minimum by the given ordering") =
    Prop.forAll(tableGen) { rows =>
      val df = rows.toDF("k", "s", "v")
      val out = Dedup.dedupKeepFirst(df, Seq("k"), Seq(col("s"), col("v")))
        .collect().map(r => (r.getInt(0), r.getString(1), r.getInt(2)))
      out.forall { case (k, s, v) =>
        val expect = rows.filter(_._1 == k).minBy(r => (r._2, r._3))
        (k, s, v) == expect
      }
    }

  property("duplicatesAll + singletons partition the input") =
    Prop.forAll(tableGen) { rows =>
      val df = rows.toDF("k", "s", "v")
      val dups = Dedup.duplicatesAll(df, Seq("k")).count()
      val keyCounts = rows.groupBy(_._1).view.mapValues(_.size)
      val expectedDups = keyCounts.values.filter(_ > 1).sum
      dups == expectedDups
    }

  property("withDuplicateCount matches groupBy sizes") =
    Prop.forAll(tableGen) { rows =>
      val df = rows.toDF("k", "s", "v")
      val got = Dedup.withDuplicateCount(df, Seq("k"))
        .collect().map(r => (r.getInt(0), r.getLong(3)))
      val sizes = rows.groupBy(_._1).view.mapValues(_.size.toLong).toMap
      got.forall { case (k, n) => sizes(k) == n }
    }

  property("unionOnCommon preserves total row count") =
    Prop.forAll(tableGen, tableGen) { (ra, rb) =>
      val a = ra.toDF("k", "s", "v")
      val b = rb.map(r => (r._1, r._3.toDouble, r._2)).toDF("k", "x", "s")
      val u = Joins.unionOnCommon(a, b)
      u.count() == ra.size + rb.size &&
        u.columns.toSeq == Seq("k", "s")
    }

  property("outerWithIndicator covers every key exactly once per side-pair") =
    Prop.forAll(tableGen, tableGen) { (ra, rb) =>
      val a = ra.map(_._1).distinct.toDF("lk")
      val b = rb.map(_._1).distinct.toDF("rk")
      val out = Joins.outerWithIndicator(a, b, "lk", "rk").collect()
      val la = ra.map(_._1).toSet; val lb = rb.map(_._1).toSet
      val both = out.count(_.getString(2) == "both")
      val lo = out.count(_.getString(2) == "left_only")
      val ro = out.count(_.getString(2) == "right_only")
      both == (la intersect lb).size &&
        lo == (la diff lb).size && ro == (lb diff la).size
    }

  property("saltedJoin ≡ plain inner join as multisets") =
    Prop.forAll(tableGen, tableGen) { (ra, rb) =>
      val a = ra.toDF("k", "s", "v")
      val b = rb.map(r => (r._1, r._2)).toDF("k", "t")
      val plain = a.join(b, Seq("k")).select("k", "s", "v", "t")
        .collect().map(_.toSeq).groupBy(identity).view.mapValues(_.length).toMap
      val salted = Joins.saltedJoin(a, b, "k", buckets = 3)
        .select("k", "s", "v", "t")
        .collect().map(_.toSeq).groupBy(identity).view.mapValues(_.length).toMap
      plain == salted
    }
}
