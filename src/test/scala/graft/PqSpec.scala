package graft

import graft.operators.Similarity
import org.apache.spark.sql.functions._

/** Product quantization: codebook/encode/ADC-search (round 12). */
class PqSpec extends SparkSpec {
  import spark.implicits._

  private val M = 8
  private val DIM = 64

  private def corpus = Tables.embeddings(spark, sf)

  test("pqEncode: every vector gets m codes in [0, ksub)") {
    val cb = Similarity.pqCodebooks(corpus, "vec_id", "embedding",
      m = M, ksub = 16, dim = DIM, seed = 7)
    assert(cb.count() == M * 16)
    val codes = Similarity.pqEncode(corpus, cb, "vec_id", "embedding", m = M, dim = DIM)
      .select(col("vec_id"), col("codes"))
      .as[(Long, Seq[Byte])].collect()
    assert(codes.length == corpus.count())
    assert(codes.forall(_._2.length == M))
    assert(codes.forall(_._2.forall(c => c >= 0 && c < 16)))
    // codes must use the codebook, not collapse to one centroid
    assert(codes.flatMap(_._2).distinct.length > 4)
  }

  test("pqTopK is deterministic (DECIMAL-summed ADC scores)") {
    val cb = Similarity.pqCodebooks(corpus, "vec_id", "embedding",
      m = M, ksub = 16, dim = DIM, seed = 7)
    val codes = Similarity.pqEncode(corpus, cb, "vec_id", "embedding", m = M, dim = DIM)
    def run() = Similarity.pqTopK(codes, corpus.filter(col("vec_id") < 5), cb,
        "vec_id", "embedding", m = M, dim = DIM, k = 5)
      .orderBy("query_id", "rank").collect().toSeq
    assert(run() == run())
  }

  test("PQ retrieves planted near-duplicates as the top hit") {
    // the q_embed_neardup perturbation: copies at cosine ≈ 0.999 —
    // REAL structure, unlike the near-uniform random corpus where
    // recall vs hairline-tied exact neighbors is the wrong measure
    val base = corpus.select(col("vec_id").cast("long").as("vec_id"),
      col("embedding").cast("array<double>").as("embedding"))
    val dups = base.filter(col("vec_id") % 50 === 0)
      .select((col("vec_id") + lit(1000000L)).as("vec_id"),
        transform(col("embedding"), (x, i) =>
          x * (lit(1.0) + lit(0.02) *
            ((col("vec_id") + i) % 5 - 2).cast("double"))).as("embedding"))
    val all = base.unionByName(dups)
    val cb = Similarity.pqCodebooks(all, "vec_id", "embedding",
      m = M, ksub = 16, dim = DIM, seed = 7)
    val codes = Similarity.pqEncode(all, cb, "vec_id", "embedding", m = M, dim = DIM)
    val top1 = Similarity.pqTopK(codes, dups, cb,
        "vec_id", "embedding", m = M, dim = DIM, k = 1)
      .select(col("query_id"), col("neighbor_id"))
      .as[(Long, Long)].collect()
    val hit = top1.count { case (q, n) => n == q - 1000000L }
    assert(top1.length >= 10, s"too few planted queries: ${top1.length}")
    assert(hit >= top1.length * 8 / 10,
      s"planted dup top-1 retrieval $hit/${top1.length} — ADC lost real structure")
  }

  test("ksub > 128: unsigned-byte codes round-trip through encode → ADC (no wrap loss)") {
    // the advertised production shape is ksub = 256; codes 128..255
    // must survive the one-byte storage (a plain tinyint cast wrapped
    // silently with ANSI off and threw with ANSI on)
    val small = corpus.filter(col("vec_id") < 400)
    val cb = Similarity.pqCodebooks(small, "vec_id", "embedding",
      m = M, ksub = 200, dim = DIM, seed = 7)
    assert(cb.count() == M * 200)
    val codes = Similarity.pqEncode(small, cb, "vec_id", "embedding", m = M, dim = DIM)
    val decoded = codes.select(explode(col("codes")).as("c"))
      .select((col("c").cast("int").bitwiseAND(lit(255))).as("u"))
    val mx = decoded.agg(max("u"), min("u")).head()
    assert(mx.getInt(0) >= 128 && mx.getInt(0) < 200 && mx.getInt(1) >= 0,
      s"decoded code range [${mx.getInt(1)}, ${mx.getInt(0)}] must use the high half")
    // every (vector, subspace) must land a LUT hit: total scored rows
    // per query = m per neighbor — a wrapped code would silently drop
    // its subspace from the join
    val n = small.count()
    val top = Similarity.pqTopK(codes, small.filter(col("vec_id") < 3), cb,
      "vec_id", "embedding", m = M, dim = DIM, k = (n - 1).toInt)
    assert(top.groupBy("query_id").count().select(min("count")).head().getLong(0) == n - 1,
      "ADC must score every corpus vector against every query")
    intercept[IllegalArgumentException] {
      Similarity.pqCodebooks(small, "vec_id", "embedding", m = M, ksub = 257, dim = DIM)
    }
  }
}
