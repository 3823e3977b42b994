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

  private val eventGen: Gen[List[(Long, Int, Double)]] =
    Gen.listOfN(25, for {
      u <- Gen.choose(0L, 3L)
      t <- Gen.choose(0, 1000)
      v <- Gen.choose(0, 100)
    } yield (u, t, v.toDouble))

  property("AsOf.join == brute-force latest-at-or-before per row") =
    Prop.forAll(eventGen, eventGen) { (ls, rs) =>
      import java.sql.Timestamp
      def ts(m: Int) = new Timestamp(1700000000000L + m * 60000L)
      // unique right (key, ts) via max tie-break id, mirroring the operator contract
      val left = ls.zipWithIndex.map { case ((u, t, _), i) => (i.toLong, u, ts(t)) }
        .toDF("event_id", "user_id", "ts")
      val right = rs.zipWithIndex.map { case ((u, t, v), i) => (i.toLong + 1000, u, ts(t), v) }
        .toDF("event_id", "user_id", "ts", "value")
      val rightDedup = Dedup.dedupKeepFirst(right, Seq("user_id", "ts"),
        Seq(col("event_id").desc))
      val got = operators.AsOf.join(left, rightDedup, "user_id", "user_id", "ts", "ts",
        Seq("event_id", "value"), col("event_id"))
        .collect().map(r => r.getLong(0) -> (if (r.isNullAt(3)) None else Some(r.getLong(3)))).toMap

      val rdd = rs.zipWithIndex.map { case ((u, t, v), i) => (i.toLong + 1000, u, t, v) }
        .groupBy(x => (x._2, x._3)).view.mapValues(_.maxBy(_._1)).values.toList
      ls.zipWithIndex.forall { case ((u, t, _), i) =>
        val candidates = rdd.filter(r => r._2 == u && r._3 <= t)
        val expect = if (candidates.isEmpty) None
          else Some(candidates.maxBy(r => (r._3, r._1))._1)
        got(i.toLong) == expect
      }
    }

  property("sessionizeNative == sessionizeBatch on random off-boundary events") =
    Prop.forAll(eventGen) { es =>
      import java.sql.Timestamp
      // minute-granularity ts with a 7-minute gap: diff == gap impossible
      // only when no pair differs by exactly 7 min — jitter by +1s offset
      // per user keeps semantics aligned since both forms see identical ts
      def ts(m: Int) = new Timestamp(1700000000000L + m * 60000L)
      val ev = es.zipWithIndex.map { case ((u, t, v), i) =>
        (u, ts(t * 2 + 1), v) // even spacing*2+1 → gaps are even minutes, gap=7min never exact
      }.toDF("user_id", "ts", "value")
      val native = streaming.EventStreams.sessionizeNative(ev, "7 minutes")
        .orderBy("user_id", "session_seq").collect().map(_.toSeq)
      val batch = streaming.EventStreams.sessionizeBatch(ev, 7 * 60000L)
        .orderBy("user_id", "session_seq").collect().map(_.toSeq)
      native.toSeq == batch.toSeq
    }

  property("globalRowIds == row_number over the same ordering") =
    Prop.forAll(tableGen) { rows =>
      val df = rows.toDF("k", "s", "v").repartition(3)
      val got = Joins.globalRowIds(df, Seq(col("k"), col("s"), col("v")), "rid")
        .collect().map(r => (r.getInt(0), r.getString(1), r.getInt(2), r.getLong(3)))
        .sortBy(_._4)
      val expect = rows.sortBy(r => (r._1, r._2, r._3))
      got.map(t => (t._1, t._2, t._3)).toSeq == expect &&
        got.map(_._4).toSeq == (1L to rows.size).toSeq
    }

  property("sumAndSortedSetSalted == sumAndSortedSet") =
    Prop.forAll(tableGen) { rows =>
      val df = rows.toDF("k", "s", "v")
      def run(f: => org.apache.spark.sql.DataFrame) =
        f.orderBy("k").collect().map(r => (r.getInt(0), r.getString(2))).toSeq
      import graft.operators.Aggs
      run(Aggs.sumAndSortedSet(df, "k", col("v"), col("s"))) ==
        run(Aggs.sumAndSortedSetSalted(df, "k", col("v"), col("s"), buckets = 4))
    }

  private val wordGen: Gen[List[String]] =
    Gen.listOfN(12, Gen.oneOf("a", "b", "c", "d", "e", "f"))

  private val edgeListGen: Gen[List[(Long, Long)]] = for {
    n <- Gen.choose(2, 25)
    m <- Gen.choose(0, 35)
    es <- Gen.listOfN(m, for {
      a <- Gen.choose(0L, n.toLong)
      b <- Gen.choose(0L, n.toLong)
    } yield (a, b))
  } yield es

  property("connectedComponents == union-find on random graphs (both paths)") =
    Prop.forAll(edgeListGen) { es =>
      // default threshold → single-task union-find path
      val got = operators.Graph
        .connectedComponents(es.toDF("a", "b"), "a", "b")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      // threshold 0 → distributed alternating-star path; labels must be
      // identical (component = min member id in both constructions)
      val gotDist = operators.Graph
        .connectedComponents(es.toDF("a", "b"), "a", "b", smallGraphThreshold = 0L)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      // reference: plain union-find with union-by-min
      val parent = scala.collection.mutable.Map[Long, Long]()
      def find(x: Long): Long = {
        val p = parent.getOrElseUpdate(x, x)
        if (p == x) x else { val r = find(p); parent(x) = r; r }
      }
      es.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      // snapshot keys BEFORE labeling: find() path-compresses (mutates
      // the map), and iterating the live `keys` view during mutation
      // drops entries — a reference-side bug that falsified the
      // property against a CORRECT engine result
      val expect = parent.keys.toList.map(k => k -> find(k)).toMap
      got == expect && gotDist == expect
    }

  property("globalPrefixSum == sequential running sum; budget packing invariants") =
    Prop.forAll(Gen.listOfN(25, Gen.choose(0, 50))) { vals =>
      val df = vals.zipWithIndex.map { case (v, i) => (i.toLong, v.toLong) }
        .toDF("id", "v").repartition(4)
      val got = graft.sources.Sinks.packByBudget(df, Seq(col("id")), "v", budget = 60L)
        .orderBy("id").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      val expect = vals.map(_.toLong).scanLeft(0L)(_ + _).tail
      got.map(_._3).toSeq == expect &&
        got.forall { case (_, v, cum, shard) => shard == (cum - v) / 60L } &&
        got.map(_._4).toSeq == got.map(_._4).toSeq.sorted // shard ids non-decreasing
    }

  property("packSequences spans tile the token stream exactly") =
    Prop.forAll(Gen.listOfN(20, Gen.choose(0, 40))) { vals =>
      val L = 16L
      val df = vals.zipWithIndex.map { case (v, i) => (i.toLong, v.toLong) }
        .toDF("id", "v").repartition(4)
      val spans = graft.sources.Sinks.packSequences(df, Seq(col("id")), "v", L)
        .orderBy("id", "seq_id").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
          r.getLong(4), r.getLong(5))) // id, v, seq_id, seq_offset, doc_offset, span_len
      val total = vals.map(_.toLong).sum
      val perDoc = spans.groupBy(_._1).view.mapValues(_.map(_._6).sum).toMap
      val perWin = spans.groupBy(_._3).view.mapValues(_.map(_._6).sum).toMap
      val lastWin = if (total == 0) -1L else (total - 1) / L
      // every doc's spans cover exactly its tokens, in doc_offset order
      vals.zipWithIndex.forall { case (v, i) =>
        if (v == 0) !perDoc.contains(i.toLong) else perDoc(i.toLong) == v.toLong } &&
      // every window except the stream's last is exactly full
      perWin.forall { case (w, s) => if (w == lastWin) s == total - lastWin * L
                                     else s == L } &&
      // spans sit inside their window and their doc
      spans.forall { case (_, v, _, so, doff, sl) =>
        so >= 0 && so + sl <= L && doff >= 0 && doff + sl <= v && sl > 0 }
    }

  property("MaxRun == brute-force longest run on random token arrays") =
    Prop.forAll(Gen.listOf(Gen.oneOf("a", "b", "c"))) { toks =>
      val got = Seq(Tuple1(toks)).toDF("arr")
        .select(plans.MaxRun.maxRun(col("arr"))).head().getLong(0)
      val brute = if (toks.isEmpty) 0L
        else {
          var best = 1; var run = 1
          toks.sliding(2).foreach {
            case Seq(p, c) => run = if (p == c) run + 1 else 1; best = math.max(best, run)
            case _ => ()
          }
          best.toLong
        }
      got == brute
    }

  property("quantized codes reconstruct within scale/2 per component") =
    Prop.forAll(Gen.listOfN(8, Gen.choose(-5.0, 5.0))) { vec =>
      val df = Seq((1L, vec)).toDF("id", "v")
      val row = operators.Similarity.quantized(df, "id", "v", "id", "scale", "q").head()
      val scale = row.getDouble(1)
      val codes = row.getSeq[Byte](2)
      // reference: unit-normalize exactly as the operator does
      val n = math.sqrt(vec.map(x => x * x).sum)
      val unit = if (n == 0.0) vec.map(_ => 0.0) else vec.map(_ / n)
      codes.zip(unit).forall { case (c, x) =>
        math.abs(c * scale - x) <= scale / 2 + 1e-12
      }
    }

  property("chunkByTokens: full cover, exact reconstruction at stride=chunk") =
    Prop.forAll(Gen.listOfN(3, Gen.choose(1, 40)),
                Gen.choose(1, 8), Gen.choose(1, 8)) { (lens, c0, s0) =>
      val chunk = math.max(c0, s0); val stride = math.min(c0, s0)
      val docs = lens.zipWithIndex.map { case (n, i) =>
        (i.toLong, (1 to n).map(t => s"w$t").mkString(" "))
      }
      val out = graft.functions.TextFunctions
        .chunkByTokens(docs.toDF("doc_id", "text"), "text", "doc_id", chunk, stride)
        .collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getString(2), r.getInt(3)))
      out.groupBy(_._1).forall { case (id, chunks) =>
        val toks = docs(id.toInt)._2.split(" ").toSeq
        val sorted = chunks.sortBy(_._2)
        // indices contiguous from 0; every token covered; counts honest
        sorted.map(_._2).toSeq == sorted.indices.toSeq &&
          sorted.forall(ch => ch._3.split(" ").length == ch._4) &&
          sorted.flatMap(ch =>
            toks.slice(ch._2 * stride, ch._2 * stride + chunk)).toSet == toks.toSet &&
          // stride == chunk → concatenation reconstructs the document
          (stride != chunk || sorted.map(_._3).mkString(" ") == toks.mkString(" "))
      }
    }

  property("rangeJoin ≡ naive BETWEEN join for random intervals and grids") =
    Prop.forAll(
      Gen.listOfN(8, Gen.zip(Gen.choose(-50L, 50L), Gen.choose(0L, 40L))),
      Gen.listOfN(10, Gen.choose(-60L, 60L)),
      Gen.choose(1L, 64L)) { (ivs, pts, grid) =>
      val intervals = ivs.zipWithIndex.map { case ((lo, w), i) =>
        (i.toLong, lo, lo + w) }
      val points = pts.zipWithIndex.map { case (v, i) => (i.toLong, v) }
      val got = operators.Joins.rangeJoin(
          points.toDF("pid", "v"), intervals.toDF("iid", "lo", "hi"),
          "v", "lo", "hi", grid)
        .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val expect = (for {
        (pid, v) <- points; (iid, lo, hi) <- intervals
        if v >= lo && v <= hi
      } yield (pid, iid)).toSet
      got == expect
    }

  property("intervalOverlapJoin ≡ naive overlap join for random intervals") =
    Prop.forAll(
      Gen.listOfN(7, Gen.zip(Gen.choose(-50L, 50L), Gen.choose(0L, 30L))),
      Gen.listOfN(7, Gen.zip(Gen.choose(-50L, 50L), Gen.choose(0L, 30L))),
      Gen.choose(1L, 64L)) { (as, bs, grid) =>
      val a = as.zipWithIndex.map { case ((lo, w), i) => (i.toLong, lo, lo + w) }
      val b = bs.zipWithIndex.map { case ((lo, w), i) => (i.toLong, lo, lo + w) }
      val got = operators.Joins.intervalOverlapJoin(
          a.toDF("aid", "alo", "ahi"), b.toDF("bid", "blo", "bhi"),
          "aid", "alo", "ahi", "bid", "blo", "bhi", grid)
        .select("aid", "bid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val expect = (for {
        (aid, alo, ahi) <- a; (bid, blo, bhi) <- b
        if alo <= bhi && blo <= ahi
      } yield (aid, bid)).toSet
      got == expect
    }

  property("jaccardPairs: symmetric key order, values in [threshold, 1]") =
    Prop.forAll(Gen.listOfN(6, wordGen)) { docs =>
      val df = docs.zipWithIndex.map { case (ws, i) => (i.toLong, ws.mkString(" ")) }
        .toDF("doc_id", "text")
      val pairs = operators.TextDedup.jaccardPairs(df, "text", "doc_id",
        n = 2, threshold = 0.3).collect()
      pairs.forall { r =>
        r.getLong(0) < r.getLong(1) &&
          r.getDouble(2) >= 0.3 && r.getDouble(2) <= 1.0
      }
    }

  property("editDistancePairs ≡ brute-force levenshtein ≤ 1 on random strings") =
    Prop.forAll(Gen.listOfN(10, for {
      n <- Gen.choose(0, 6)
      cs <- Gen.listOfN(n, Gen.oneOf('a', 'b'))
    } yield cs.mkString)) { strs =>
      val df = strs.zipWithIndex.map { case (s, i) => (i.toLong, s) }.toDF("id", "s")
      val got = operators.TextDedup.editDistancePairs(df, "s", "id")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
      def lev(a: String, b: String): Int = {
        val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
          if (i == 0) j else if (j == 0) i else 0 }
        for (i <- 1 to a.length; j <- 1 to b.length)
          d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
            d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
        d(a.length)(b.length)
      }
      val expect = (for {
        i <- strs.indices; j <- strs.indices if i < j
        d = lev(strs(i), strs(j)) if d <= 1
      } yield (i.toLong, j.toLong, d)).toSet
      got == expect
    }

  property("blockDedup: token conservation, distinct survivors, reference replay") =
    Prop.forAll(Gen.listOfN(6, wordGen)) { docs =>
      val df = docs.zipWithIndex.map { case (ws, i) => (i.toLong, ws.mkString(" ")) }
        .filter(_._2.trim.nonEmpty).toDF("doc_id", "text")
      val bt = 3
      val got = operators.TextDedup.blockDedup(df, "text", "doc_id", bt)
        .collect().map(r => r.getLong(0) ->
          (r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4))).toMap
      // single-threaded replay of the contract: global first occurrence
      // per block text in (doc_id, block_idx) order
      val blocks = docs.zipWithIndex.flatMap { case (ws0, i) =>
        val ws = ws0.mkString(" ").trim.toLowerCase.split("\\s+").filter(_.nonEmpty)
        ws.grouped(bt).zipWithIndex.map { case (b, j) => (i.toLong, j, b.mkString(" ")) }
      }.filter(_._3.nonEmpty)
      // replay strictly in (doc_id, block_idx) order — the keep-first
      // contract is order-defined
      val seen = scala.collection.mutable.Set[String]()
      val expect = blocks.groupBy(_._1).toSeq.sortBy(_._1).map { case (id, bs) =>
        var kept = List.empty[String]; var removedTok = 0L
        bs.sortBy(_._2).foreach { case (_, _, text) =>
          if (seen.add(text)) kept :+= text
          else removedTok += text.split(" ").length
        }
        id -> ((bs.size.toLong, kept.size.toLong, removedTok, kept.mkString(" ")))
      }.toMap
      got == expect
    }

  property("incrementalComponents(split) == connectedComponents(all)") =
    Prop.forAll(edgeListGen, Gen.choose(0, 100)) { (es, cut) =>
      val k = es.size * cut / 100
      val (oldE, newE) = es.splitAt(k)
      val full = operators.Graph.connectedComponents(es.toDF("a", "b"), "a", "b")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val oldAssign = operators.Graph
        .connectedComponents(oldE.toDF("a", "b"), "a", "b")
      val got = operators.Graph.incrementalComponents(oldAssign, "node",
          "component", newE.toDF("a", "b"), "a", "b")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      got == full
    }

  property("quantileGate: threshold exists in group, kept fraction bounds") =
    Prop.forAll(Gen.listOfN(30, Gen.choose(0L, 20L)),
        Gen.choose(1, 9)) { (vs, p10) =>
      {
        val p = p10 / 10.0
        val df = vs.zipWithIndex.map { case (v, i) => (i.toLong, "g", v) }
          .toDF("id", "g", "v")
        val kept = operators.TextQuality.quantileGate(df, "g", col("v"), p,
            col("id")).select("v").collect().map(_.getLong(0))
        // the cutoff is the value at rank ceil(p*n): everything at or
        // above it survives — at least the top (1-p) fraction, and
        // never MORE than the rows >= the rank-value (tie inclusion)
        val sorted = vs.sorted
        val thr = sorted(math.ceil(p * vs.size).toInt - 1)
        kept.length.toLong == vs.count(_ >= thr) &&
          kept.forall(_ >= thr) && vs.contains(thr)
      }
    }

  property("scd2FromChanges: contiguous versions, chained intervals, one current") =
    Prop.forAll(eventGen) { es =>
      import java.sql.Timestamp
      def ts(m: Int) = new Timestamp(1700000000000L + m * 60000L)
      val changes = es.zipWithIndex.map { case ((u, t, _), i) =>
        (u, ts(t), i.toLong) }.toDF("k", "ts", "id")
      val got = operators.SchemaOps.scd2FromChanges(changes, "k", "ts", col("id"))
        .collect().map(r => (r.getAs[Long]("k"), r.getAs[Timestamp]("ts"),
          r.getAs[Long]("id"), r.getAs[Timestamp]("effective_to"),
          r.getAs[Int]("version"), r.getAs[Boolean]("is_current")))
      got.groupBy(_._1).forall { case (_, rows) =>
        val byV = rows.sortBy(_._5)
        byV.map(_._5).toSeq == (1 to rows.size) &&           // contiguous versions
          byV.count(_._6) == 1 && byV.last._6 &&             // exactly one current, the last
          byV.toList.sliding(2).forall {                     // intervals chain
            case List(a, b) => a._4 == b._2
            case _ => true
          } && byV.last._4 == null
      }
    }

  property("kAnonymize: kept+suppressed partition rows, kept cells >= k") =
    Prop.forAll(tableGen, Gen.choose(1L, 6L)) { (rows, k) =>
      // NULL quasi keys are legal input (r6 review: an equi-join back
      // lost them from BOTH frames) — inject them so the partition
      // invariant is exercised with NULL cells too
      val df = rows.zipWithIndex.map { case ((g, s, v), i) =>
        (i.toLong, if (g % 3 == 0) null else g.toString,
          if (v % 4 == 0) null else s) }
        .toDF("id", "g", "s")
      val (kept, sup) = operators.SchemaOps.kAnonymize(df, Seq("g", "s"), k)
      val keptRows = kept.count()
      val supRows = sup.agg(sum(col("n_rows"))).collect().head
      val supTotal = if (supRows.isNullAt(0)) 0L else supRows.getLong(0)
      val cellOk = kept.groupBy("g", "s").count().collect()
        .forall(_.getAs[Long]("count") >= k)
      keptRows + supTotal == rows.size && cellOk
    }

  property("aggregateToCanonical: cluster sizes conserve the input rows") =
    Prop.forAll(edgeListGen) { es =>
      val nodes = (es.flatMap(e => Seq(e._1, e._2)).toSet + 0L).toSeq
      val docs = nodes.map(n => (n, n * 2)).toDF("doc_id", "m")
      val assign = operators.Graph.dedupClusters(docs, "doc_id",
        es.toDF("a", "b"), "a", "b")
      val rolled = operators.Graph.aggregateToCanonical(docs, "doc_id",
        assign, Seq(sum(col("m")).as("sm")))
      val sizes = rolled.agg(sum(col("cluster_size"))).collect().head.getLong(0)
      sizes == nodes.size && rolled.count() ==
        assign.filter(col("is_canonical")).count()
    }

  property("cmEstimate >= exact count for every random item") =
    Prop.forAll(Gen.listOfN(40,
        Gen.oneOf("a", "b", "c", "d", "e", "f", "g", "h"))) { items =>
      {
        val df = items.map(i => ("g", i)).toDF("g", "item")
        val merged = operators.Aggs.mergeCmSketches(
          operators.Aggs.cmSketches(df, Seq("g"), "item", eps = 0.01), Seq("g"))
        val est = df.groupBy("g", "item").agg(count(lit(1)).as("n"))
          .join(merged, Seq("g"))
          .select(col("item"), col("n"),
            operators.Aggs.cmEstimate(col("sketch"), col("item")).as("e"))
          .collect()
        est.forall(r => r.getAs[Long]("e") >= r.getAs[Long]("n"))
      }
    }

  // upsert algebra: re-applying a delta is a no-op, and disjoint-key
  // deltas commute — the two laws a retried / out-of-order snapshot
  // maintenance job leans on
  private val keyedRows: Gen[List[(Int, String, Int)]] =
    Gen.listOfN(12, rowGen).map(_.groupBy(_._1).map(_._2.head).toList)

  property("upsert: idempotent — applying the same delta twice equals once") =
    Prop.forAll(keyedRows, keyedRows) { (baseRows, deltaRows) =>
      val base = baseRows.toDF("k", "s", "v")
      val delta = deltaRows.toDF("k", "s", "v")
      val once = operators.Joins.upsert(base, delta, Seq("k"))
      val twice = operators.Joins.upsert(once, delta, Seq("k"))
      once.orderBy("k").collect().toSeq == twice.orderBy("k").collect().toSeq
    }

  property("upsert: disjoint-key deltas commute") =
    Prop.forAll(keyedRows, keyedRows, keyedRows) { (baseRows, d1Rows, d2Rows) =>
      val d1Keys = d1Rows.map(_._1).toSet
      val d2 = d2Rows.filterNot(r => d1Keys.contains(r._1))
      val base = baseRows.toDF("k", "s", "v")
      val (da, db) = (d1Rows.toDF("k", "s", "v"), d2.toDF("k", "s", "v"))
      def apply2(x: org.apache.spark.sql.DataFrame, y: org.apache.spark.sql.DataFrame) =
        operators.Joins.upsert(operators.Joins.upsert(base, x, Seq("k")), y, Seq("k"))
          .orderBy("k").collect().toSeq
      apply2(da, db) == apply2(db, da)
    }

}
