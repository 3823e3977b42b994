package graft

import graft.operators.Retrieval

/** BM25 ranked retrieval. */
class RetrievalSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Seq(
    (1L, "spark spark spark runs fast"),              // high tf, short
    (2L, "spark " + Seq.fill(40)("filler").mkString(" ")), // tf 1, long
    (3L, "spark spark " + Seq.fill(10)("pad").mkString(" ")), // mid
    (4L, "nothing about the topic at all here")       // no hit
  ).toDF("doc_id", "text")

  test("bm25: higher tf ranks first, length normalization demotes long docs") {
    val got = Retrieval.bm25TopK(docs, "text", "doc_id", Seq("spark"), k = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(got.map(_._2).toSeq == Seq(1L, 3L, 2L), s"got ${got.toSeq}")
    assert(got.map(_._1).toSeq == Seq(1L, 2L, 3L))        // dense ranks
    assert(got.forall(_._3 > 0.0))
    // no-hit docs never appear
    assert(!got.exists(_._2 == 4L))
  }

  test("bm25: rare term outscores common term; k truncates") {
    val got = Retrieval.bm25TopK(docs, "text", "doc_id",
      Seq("spark", "topic"), k = 2)
      .collect().map(_.getLong(1)).toSeq
    // "topic" hits only doc 4 → df 1, max idf: its one hit outweighs
    // doc 1's three hits on the common term (idf discrimination)
    assert(got == Seq(4L, 1L), s"got $got")
  }

  test("bm25: scores are reproducible across repartitionings") {
    val a = Retrieval.bm25TopK(docs, "text", "doc_id", Seq("spark"), k = 10)
      .collect().map(r => (r.getLong(1), r.getDouble(2))).toSeq
    val b = Retrieval.bm25TopK(docs.repartition(7), "text", "doc_id", Seq("spark"), k = 10)
      .collect().map(r => (r.getLong(1), r.getDouble(2))).toSeq
    assert(a == b)
  }
}
