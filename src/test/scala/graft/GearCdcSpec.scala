package graft

import graft.operators.TextDedup
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** GearCdc native ≡ the Column-composition witness (per-character gear
  * md5s, per-position windowed Horner fold, conditional end cut) — the
  * shape the q_cdc_dedup DuckDB oracle replays in SQL. The native
  * expression collapses the md5s to one per distinct character and the
  * fold to an incremental ring-buffer update; this spec is the proof
  * those rewrites are value-preserving.
  */
class GearCdcSpec extends SparkSpec {
  import spark.implicits._

  /** The composed form the native expression replaced — retained as
    * the property witness.
    */
  private def witness(df: DataFrame, maskBits: Int, w: Int): DataFrame = {
    val t = col("_t")
    val n = length(t)
    val gp = transform(sequence(lit(1), n), p =>
      conv(substring(md5(concat(lit("gear:"), t.substr(p, lit(1)))), 1, 4),
        16, 10).cast("long"))
    val modulus = lit(1L << maskBits)
    def hAt(gpCol: Column, i: Column): Column = {
      val start = greatest(i - (w - 1), lit(1))
      aggregate(slice(gpCol, start, i - start + 1), lit(0L),
        (acc, x) => pmod(acc * 31 + x, lit(1L << 40)))
    }
    val cuts = filter(sequence(lit(1), n),
      i => pmod(hAt(col("_gp"), i), modulus) === 0)
    val cutsAll = when(try_element_at(cuts, lit(-1)) === n, cuts)
      .otherwise(concat(cuts, array(n)))
    val prevs = concat(array(lit(0)),
      slice(cutsAll, lit(1), greatest(size(cutsAll) - 1, lit(0))))
    val chunks = zip_with(cutsAll, prevs, (c, p) =>
      struct((p + 1).as("pos"), (c - p).as("len")))
    df.select(col("id"), col("text").as("_t"))
      .filter(n >= 1)
      .withColumn("_gp", gp)
      .select(col("id"), col("_t"), explode(chunks).as("_c"))
      .select(col("id"),
        col("_c.pos").cast("int").as("pos"),
        col("_c.len").cast("int").as("len"),
        md5(col("_t").substr(col("_c.pos"), col("_c.len"))).as("chunk_md5"))
  }

  private def compare(texts: Seq[String], maskBits: Int, w: Int): Unit = {
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "text")
    def rows(d: DataFrame) = d.collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getString(3))).toSet
    val native = rows(TextDedup.contentDefinedChunks(
      df, "text", "id", maskBits, w))
    val comp = rows(witness(df, maskBits, w))
    assert(native == comp,
      s"mask=$maskBits w=$w: native-only=${(native -- comp).take(5)} " +
        s"witness-only=${(comp -- native).take(5)}")
  }

  test("hand-picked edges ≡ witness: repeats, unicode, short docs, tiny masks") {
    val texts = Seq(
      "abcdefghijklmnopqrstuvwxyz0123456789 " * 8,
      "aaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaa",     // constant run (degenerate)
      "abababababababababababababababab",     // period-2
      "x",                                    // single char
      "naïve café — résumé 日本語テキスト padded out to some length",
      "emoji 😀 pair 😀 emoji 😀 pair padding padding padding",
      (1 to 40).map(k => s"sec $k payload $k;").mkString(" "))
    compare(texts, maskBits = 4, w = 16)     // dense cuts
    compare(texts, maskBits = 7, w = 16)     // the q_cdc_dedup shape
    compare(texts, maskBits = 10, w = 4)     // sparse cuts, tiny window
    compare(texts, maskBits = 2, w = 64)     // window > most docs
  }

  test("seeded fuzz ≡ witness: random strings over mixed alphabets") {
    // deterministic LCG — no Random seed ambiguity across Scala versions
    var state = 0x9E3779B97F4A7C15L
    def nextInt(bound: Int): Int = {
      state = state * 6364136223846793005L + 1442695040888963407L
      (((state >>> 33) % bound).toInt + bound) % bound
    }
    val alphabets = Seq(
      "ab",                                  // tiny: dense gear collisions
      "abcdefghijklmnopqrstuvwxyz 0123456789.,;!?",
      "日本語テキストかなカナ漢字混合",          // multi-byte
      "a😀b😀c ",                             // surrogate pairs + ascii
      "αβγδ žščř ąęłń")                      // 2-byte letters
    val texts = (0 until 60).map { i =>
      val alpha = alphabets(i % alphabets.length)
      val chars = alpha.codePoints().toArray
      val len = 1 + nextInt(400)
      val sb = new java.lang.StringBuilder
      (0 until len).foreach(_ => sb.appendCodePoint(chars(nextInt(chars.length))))
      sb.toString
    }
    compare(texts, maskBits = 5, w = 16)
    compare(texts, maskBits = 8, w = 7)
    compare(texts, maskBits = 3, w = 33)
  }

  test("corpus slice ≡ witness at the q_cdc_dedup parameters") {
    val sf = "/root/testdata/sf0.001"
    val docs = Tables.documents(spark, sf).filter(col("doc_id") % 8 === 0)
      .select(col("doc_id").as("id"), col("text"))
    def rows(d: DataFrame) = d.collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getString(3))).toSet
    val native = rows(TextDedup.contentDefinedChunks(
      docs, "text", "id", maskBits = 7, windowChars = 16))
    val comp = rows(witness(
      docs.select(col("id"), col("text")), maskBits = 7, w = 16))
    assert(native.nonEmpty && native == comp,
      s"native=${native.size} witness=${comp.size}")
  }

  test("malformed UTF-8 (truncated multi-byte tail) degrades, never overruns") {
    import org.apache.spark.unsafe.types.UTF8String
    // valid prefix + a lone multi-byte lead byte: numBytesForFirstByte
    // claims 3 bytes but only 1 remains — the clamp must treat the tail
    // as one short code point instead of reading past the array
    val cases = Seq(
      Array[Byte]('a', 'b', 0xE4.toByte),              // 3-byte lead, 0 continuation
      Array[Byte]('x', 0xF0.toByte, 0x9F.toByte),      // 4-byte lead, 1 continuation
      Array[Byte](0xC3.toByte))                        // 2-byte lead alone
    cases.foreach { bs =>
      val out = graft.plans.GearCdc.compute(
        UTF8String.fromBytes(bs), maskBits = 3, windowChars = 4)
      // chunks must still tile [1, nCodePoints] exactly
      val chunks = (0 until out.numElements()).map { i =>
        val r = out.getStruct(i, 2); (r.getInt(0), r.getInt(1)) }
      assert(chunks.nonEmpty, s"no chunks for ${bs.toSeq}")
      assert(chunks.head._1 == 1)
      chunks.sliding(2).foreach {
        case Seq((p1, l1), (p2, _)) => assert(p1 + l1 == p2)
        case _ => ()
      }
    }
  }

  test("gear-cache cap: >2^17 distinct code points stays correct and deterministic") {
    import org.apache.spark.unsafe.types.UTF8String
    // 140k distinct supplementary-plane code points (> the 2^17 cap) —
    // past the cap the cache stops inserting and computes md5 directly;
    // the two paths must be value-identical, so a repeat run (now mixed
    // cache-hit / compute-direct) must reproduce the first byte for byte
    val s = {
      val sb = new java.lang.StringBuilder(140000 * 2)
      var cp = 0x20000
      var n = 0
      while (n < 140000) { sb.appendCodePoint(cp); cp += 1; n += 1 }
      UTF8String.fromString(sb.toString)
    }
    def run() = {
      val out = graft.plans.GearCdc.compute(s, maskBits = 7, windowChars = 16)
      (0 until out.numElements()).map { i =>
        val r = out.getStruct(i, 2); (r.getInt(0), r.getInt(1)) }
    }
    val a = run()
    val b = run()
    assert(a == b, "cap path diverged from cached path")
    assert(a.map(_._2.toLong).sum == 140000L, "chunks must tile the doc")
    assert(a.head._1 == 1 && a.last._1 + a.last._2 - 1 == 140000)
  }
}
