package graft

import graft.functions.TextFunctions
import OracleCtes._

/** DuckDB oracle SQL — corpus/web/semantic half of the registry
  * (ANN/PQ, semantic dedup, splits/leakage, quality scoring, DSIR,
  * URL/domain curation, link graph/PageRank, span dedup, multimodal
  * fingerprints). See [[SparkEntry.oracleSql]].
  */
private[graft] object OracleSqlText {

  val sql: Map[String, String] = Map(
    "q_corpus_diff" ->
      // replay of Diff.snapshotDiff's portable fingerprint path: md5 of
      // the N/V-tagged text (single compare column, so the outer digest
      // hash is skipped), null-safe full outer on doc_id, status rollup
      """WITH v1 AS (SELECT doc_id, text FROM documents),
        |v2 AS (
        |  SELECT doc_id,
        |    CASE WHEN doc_id % 13 = 0 THEN text || ' v2' ELSE text END AS text
        |  FROM v1 WHERE doc_id % 17 <> 0
        |  UNION ALL
        |  SELECT doc_id + 10000000, text FROM v1 WHERE doc_id % 19 = 0),
        |o AS (SELECT doc_id, md5(CASE WHEN text IS NULL THEN 'N'
        |  ELSE 'V' || CAST(text AS VARCHAR) END) AS fp FROM v1),
        |n AS (SELECT doc_id, md5(CASE WHEN text IS NULL THEN 'N'
        |  ELSE 'V' || CAST(text AS VARCHAR) END) AS fp FROM v2),
        |d AS (SELECT coalesce(o.doc_id, n.doc_id) AS doc_id,
        |  CASE WHEN o.fp IS NULL THEN 'added'
        |       WHEN n.fp IS NULL THEN 'removed'
        |       WHEN o.fp <> n.fp THEN 'changed'
        |       ELSE 'unchanged' END AS status
        |  FROM o FULL OUTER JOIN n ON o.doc_id IS NOT DISTINCT FROM n.doc_id)
        |SELECT status, count(*) AS n, CAST(sum(doc_id) AS BIGINT) AS key_sum
        |FROM d GROUP BY status ORDER BY status""".stripMargin,
    "q_ann_pq" ->
      s"""$pqCtes
        |SELECT query_id, CAST(rank AS INTEGER) AS rank, neighbor_id, sim_pq
        |FROM pqr WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin,
    "q_ann_pq_recall" ->
      s"""$pqCtes,
        |es AS (SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
        |  list_reduce(list_transform(list_zip(q.v, c.v), z -> z[1]*z[2]),(p,q)->p+q) AS sim
        | FROM n q CROSS JOIN n c WHERE q.vec_id < 10 AND q.vec_id <> c.vec_id),
        |er AS (SELECT query_id, neighbor_id, row_number() OVER (
        |  PARTITION BY query_id ORDER BY sim DESC, neighbor_id) AS rank FROM es),
        |etop AS (SELECT query_id, neighbor_id FROM er WHERE rank <= 5),
        |ptop AS (SELECT query_id, neighbor_id FROM pqr WHERE rank <= 5),
        |j AS (SELECT coalesce(e.query_id, p.query_id) AS query_id,
        |  e.query_id IS NOT NULL AS in_e, p.query_id IS NOT NULL AS in_p
        | FROM etop e FULL OUTER JOIN ptop p
        |   ON e.query_id = p.query_id AND e.neighbor_id = p.neighbor_id)
        |SELECT CAST(sum(CASE WHEN in_e THEN 1 ELSE 0 END) AS BIGINT) AS n_exact,
        |  CAST(sum(CASE WHEN in_p THEN 1 ELSE 0 END) AS BIGINT) AS n_pq,
        |  CAST(sum(CASE WHEN in_e AND in_p THEN 1 ELSE 0 END) AS BIGINT) AS n_hit,
        |  CASE WHEN sum(CASE WHEN in_e THEN 1 ELSE 0 END) > 0 THEN
        |    CAST(sum(CASE WHEN in_e AND in_p THEN 1 ELSE 0 END) AS DOUBLE) /
        |    sum(CASE WHEN in_e THEN 1 ELSE 0 END) END AS recall
        |FROM j""".stripMargin,
    "q_pq_planted" ->
      s"""$pqPlantedCtes
        |SELECT CAST(count(*) AS BIGINT) AS n_queries,
        |  CAST(sum(CASE WHEN neighbor_id = query_id - 1000000 THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_top1_hits,
        |  CAST(sum(CASE WHEN neighbor_id = query_id - 1000000 THEN 1 ELSE 0 END)
        |    AS DOUBLE) / count(*) AS recall_top1,
        |  CAST(sum(CASE WHEN neighbor_id = query_id - 1000000 THEN 1 ELSE 0 END)
        |    AS DOUBLE) / count(*) >= 0.8 AS recall_ok
        |FROM pqr WHERE rank = 1""".stripMargin,
    "q_embed_neardup" -> lshNearDupOracle(tables = 4, dim = 64,
      seed = 42L, threshold = 0.9),
    "q_embed_recall" -> embedRecallOracle(tables = 4, dim = 64,
      seed = 42L, threshold = 0.9),
    "q_cross_semantic" ->
      // corpus normalize + md5 seed pick + argmax assignment for BOTH
      // sides, then within-cell new×corpus exact dots
      """WITH eb AS (SELECT vec_id, embedding::DOUBLE[] e FROM embeddings),
        |n0c AS (SELECT vec_id, e,
        |  sqrt(list_reduce(list_transform(e, y->y*y),(p,q)->p+q)) AS nrm FROM eb),
        |nc AS (SELECT vec_id, list_transform(e,
        |  x -> CASE WHEN nrm = 0 THEN 0.0 ELSE x / nrm END) AS v FROM n0c),
        |seeds AS (SELECT vec_id AS cent_id, v AS cv FROM nc
        | ORDER BY md5(vec_id::VARCHAR || ':7'), vec_id
        | LIMIT 8),
        |ca AS (SELECT vec_id, cent_id FROM (
        |  SELECT nc.vec_id, s.cent_id, row_number() OVER (PARTITION BY nc.vec_id
        |   ORDER BY list_reduce(list_transform(list_zip(nc.v, s.cv), x->x[1]*x[2]),(p,q)->p+q) DESC,
        |    s.cent_id) AS rn
        |  FROM nc CROSS JOIN seeds s) WHERE rn = 1),
        |nw AS (SELECT vec_id + 1000000 AS vec_id,
        |  list_transform(e, (x, i) ->
        |    x * (1.0 + 0.02 * CAST((vec_id + (i - 1)) % 5 - 2 AS DOUBLE))) AS e
        | FROM eb WHERE vec_id % 10 = 0
        | ORDER BY md5((vec_id + 1000000)::VARCHAR || ':xsp'), vec_id + 1000000
        | LIMIT 1024),
        |n0n AS (SELECT vec_id, e,
        |  sqrt(list_reduce(list_transform(e, y->y*y),(p,q)->p+q)) AS nrm FROM nw),
        |nn AS (SELECT vec_id, list_transform(e,
        |  x -> CASE WHEN nrm = 0 THEN 0.0 ELSE x / nrm END) AS v FROM n0n),
        |na AS (SELECT vec_id, cent_id FROM (
        |  SELECT nn.vec_id, s.cent_id, row_number() OVER (PARTITION BY nn.vec_id
        |   ORDER BY list_reduce(list_transform(list_zip(nn.v, s.cv), x->x[1]*x[2]),(p,q)->p+q) DESC,
        |    s.cent_id) AS rn
        |  FROM nn CROSS JOIN seeds s) WHERE rn = 1),
        |p AS (SELECT na.vec_id AS new_id, ca.vec_id AS corpus_id,
        |  list_reduce(list_transform(list_zip(a.v, b.v), x -> x[1]*x[2]), (p,q)->p+q) AS sim
        | FROM na JOIN ca ON na.cent_id = ca.cent_id
        |  JOIN nn a ON a.vec_id = na.vec_id
        |  JOIN nc b ON b.vec_id = ca.vec_id)
        |SELECT new_id, corpus_id, sim FROM p WHERE sim >= 0.9
        |ORDER BY new_id, corpus_id""".stripMargin,
    "q_semantic_dedup" ->
      // full SemDeDup replay: planting (1-based list_transform index →
      // i-1), normalize, md5-seeded centroid pick, argmax-dot assignment
      // (tie = lowest cent_id), within-cell ≥ tau pairs, recursive-CTE
      // transitive closure, min-id canonical — every float op is the
      // same left-fold the Spark plan runs, proven bit-exact by
      // q_cosine_pairs
      """WITH RECURSIVE eb AS (SELECT vec_id, embedding::DOUBLE[] e FROM embeddings),
        |e0 AS (SELECT vec_id, e FROM eb
        | UNION ALL
        | SELECT vec_id + 1000000 AS vec_id,
        |  list_transform(e, (x, i) ->
        |    x * (1.0 + 0.02 * CAST((vec_id + (i - 1)) % 5 - 2 AS DOUBLE))) AS e
        | FROM eb WHERE vec_id % 10 = 0),
        |n0 AS (SELECT vec_id, e,
        |  sqrt(list_reduce(list_transform(e, y->y*y),(p,q)->p+q)) AS nrm FROM e0),
        |n AS (SELECT vec_id, list_transform(e,
        |  x -> CASE WHEN nrm = 0 THEN 0.0 ELSE x / nrm END) AS v FROM n0),
        |seeds AS (SELECT vec_id AS cent_id, v AS cv FROM n
        | ORDER BY md5(vec_id::VARCHAR || ':7'), vec_id
        | LIMIT greatest(8, (SELECT count(*) FROM e0)//250)),
        |scored AS (SELECT n.vec_id, s.cent_id,
        |  list_reduce(list_transform(list_zip(n.v, s.cv), x->x[1]*x[2]),(p,q)->p+q) AS csim
        | FROM n CROSS JOIN seeds s),
        |assign AS (SELECT vec_id, cent_id FROM (
        |  SELECT vec_id, cent_id,
        |   row_number() OVER (PARTITION BY vec_id ORDER BY csim DESC, cent_id) AS rn
        |  FROM scored) WHERE rn = 1),
        |m AS (SELECT n.vec_id, a.cent_id, n.v FROM n JOIN assign a USING (vec_id)),
        |pairs AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b
        | FROM m a JOIN m b ON a.cent_id = b.cent_id AND a.vec_id < b.vec_id
        | WHERE list_reduce(list_transform(list_zip(a.v, b.v), x->x[1]*x[2]),(p,q)->p+q) >= 0.9),
        |edges AS (SELECT id_a AS u, id_b AS w FROM pairs
        | UNION SELECT id_b, id_a FROM pairs),
        |reach(node, comp) AS (SELECT u, u FROM edges
        | UNION SELECT e.u, r.comp FROM edges e JOIN reach r ON e.w = r.node),
        |comps AS (SELECT node, min(comp) AS comp FROM reach GROUP BY node)
        |SELECT m.vec_id, m.cent_id, COALESCE(c.comp, m.vec_id) AS group_id,
        | COALESCE(c.comp, m.vec_id) = m.vec_id AS is_canonical
        |FROM m LEFT JOIN comps c ON m.vec_id = c.node
        |ORDER BY vec_id""".stripMargin,
    "q_distinct_profile" ->
      """SELECT CAST(count(DISTINCT l_orderkey) AS BIGINT) AS exact_orders,
        | CAST(count(DISTINCT l_partkey) AS BIGINT) AS exact_parts,
        | CAST(count(*) AS BIGINT) AS n_rows
        |FROM lineitem""".stripMargin,
    "q_sample_k" ->
      // NULLS FIRST everywhere: Spark ASC is NULLS FIRST, DuckDB
      // defaults NULLS LAST — latent divergence if the table ever
      // carries null lang/doc_id
      """WITH r AS (SELECT doc_id, lang,
        |  row_number() OVER (PARTITION BY lang
        |    ORDER BY md5(CAST(doc_id AS VARCHAR)) NULLS FIRST,
        |      CAST(doc_id AS VARCHAR) NULLS FIRST) AS rn
        | FROM documents)
        |SELECT doc_id, lang FROM r WHERE rn <= 20
        |ORDER BY lang NULLS FIRST, doc_id NULLS FIRST""".stripMargin,
    "q_split" ->
      // identical md5-interval thresholds as hashSplit(0.8/0.1/0.1):
      // lowercase hex compares lexicographically = numerically in both
      // engines
      s"""WITH s AS (SELECT lang, text,
         |  CASE WHEN md5(CAST(doc_id AS VARCHAR)) < '${TextFunctions.md5SampleThreshold(0.8)}' THEN 'train'
         |       WHEN md5(CAST(doc_id AS VARCHAR)) < '${TextFunctions.md5SampleThreshold(0.9)}' THEN 'val'
         |       ELSE 'test' END AS split
         | FROM documents)
         |SELECT split, lang, CAST(count(*) AS BIGINT) AS n_docs,
         | CAST(sum(len(string_split_regex(lower(trim(text)), '\\s+'))) AS BIGINT) AS n_tokens
         |FROM s GROUP BY split, lang
         |ORDER BY split NULLS FIRST, lang NULLS FIRST""".stripMargin,
    "q_split_leakage" ->
      // the q_minhash_pairs_md5 portable-LSH CTE chain (threshold 0.5)
      // crossed with q_split's md5-interval assignment; least/greatest
      // canonicalize the cell, n_docs unions both endpoints
      s"""WITH w AS (SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS ws FROM documents),
         |sh AS (SELECT doc_id, unnest(list_distinct(
         |  [ws[i]||'_'||ws[i+1]||'_'||ws[i+2] for i in range(1, len(ws)-1)])) AS s FROM w),
         |ab AS (SELECT doc_id,
         |  ('0x' || substr(md5(s), 1, 12))::BIGINT AS a,
         |  ('0x' || substr(md5(s), 13, 12))::BIGINT AS b FROM sh),
         |sig AS (SELECT doc_id,
         |  [${(0 until 16).map(i => s"min(a + $i*b)").mkString(", ")}] AS sig
         | FROM ab GROUP BY doc_id),
         |bd AS (SELECT doc_id, sig, band,
         |  md5(array_to_string(list_slice(sig, band*4+1, band*4+4), '|')) AS bucket
         | FROM sig, (SELECT unnest(range(0, 4)) AS band) bands),
         |cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
         |  a.sig AS sig_a, b.sig AS sig_b
         | FROM bd a JOIN bd b ON a.band = b.band AND a.bucket = b.bucket
         |  AND a.doc_id < b.doc_id),
         |lshp AS (SELECT doc_a, doc_b FROM cand
         | WHERE CAST(len(list_filter(list_zip(sig_a, sig_b), x -> x[1] = x[2])) AS DOUBLE) / 16 >= 0.5),
         |asg AS (SELECT doc_id,
         |  CASE WHEN md5(CAST(doc_id AS VARCHAR)) < '${TextFunctions.md5SampleThreshold(0.8)}' THEN 'train'
         |       WHEN md5(CAST(doc_id AS VARCHAR)) < '${TextFunctions.md5SampleThreshold(0.9)}' THEN 'val'
         |       ELSE 'test' END AS split
         | FROM documents),
         |px AS (SELECT p.doc_a, p.doc_b,
         |  least(x.split, y.split) AS split_a, greatest(x.split, y.split) AS split_b
         | FROM lshp p JOIN asg x ON p.doc_a = x.doc_id JOIN asg y ON p.doc_b = y.doc_id),
         |cells AS (SELECT split_a, split_b, CAST(count(*) AS BIGINT) AS n_pairs
         | FROM px GROUP BY 1, 2),
         |dd AS (SELECT split_a, split_b, CAST(count(DISTINCT doc) AS BIGINT) AS n_docs FROM
         |  (SELECT split_a, split_b, doc_a AS doc FROM px
         |   UNION ALL SELECT split_a, split_b, doc_b FROM px) u GROUP BY 1, 2)
         |SELECT split_a, split_b, n_pairs, n_docs
         |FROM cells JOIN dd USING (split_a, split_b)
         |ORDER BY split_a, split_b""".stripMargin,
    "q_leaked_docs" ->
      // same LSH + assignment CTEs, un-canonicalized endpoint splits;
      // a doc leaks once per cross-split partner, from either side
      s"""WITH w AS (SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS ws FROM documents),
         |sh AS (SELECT doc_id, unnest(list_distinct(
         |  [ws[i]||'_'||ws[i+1]||'_'||ws[i+2] for i in range(1, len(ws)-1)])) AS s FROM w),
         |ab AS (SELECT doc_id,
         |  ('0x' || substr(md5(s), 1, 12))::BIGINT AS a,
         |  ('0x' || substr(md5(s), 13, 12))::BIGINT AS b FROM sh),
         |sig AS (SELECT doc_id,
         |  [${(0 until 16).map(i => s"min(a + $i*b)").mkString(", ")}] AS sig
         | FROM ab GROUP BY doc_id),
         |bd AS (SELECT doc_id, sig, band,
         |  md5(array_to_string(list_slice(sig, band*4+1, band*4+4), '|')) AS bucket
         | FROM sig, (SELECT unnest(range(0, 4)) AS band) bands),
         |cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
         |  a.sig AS sig_a, b.sig AS sig_b
         | FROM bd a JOIN bd b ON a.band = b.band AND a.bucket = b.bucket
         |  AND a.doc_id < b.doc_id),
         |lshp AS (SELECT doc_a, doc_b FROM cand
         | WHERE CAST(len(list_filter(list_zip(sig_a, sig_b), x -> x[1] = x[2])) AS DOUBLE) / 16 >= 0.5),
         |asg AS (SELECT doc_id,
         |  CASE WHEN md5(CAST(doc_id AS VARCHAR)) < '${TextFunctions.md5SampleThreshold(0.8)}' THEN 'train'
         |       WHEN md5(CAST(doc_id AS VARCHAR)) < '${TextFunctions.md5SampleThreshold(0.9)}' THEN 'val'
         |       ELSE 'test' END AS split
         | FROM documents),
         |px AS (SELECT p.doc_a, p.doc_b, x.split AS sa, y.split AS sb
         | FROM lshp p JOIN asg x ON p.doc_a = x.doc_id JOIN asg y ON p.doc_b = y.doc_id),
         |hits AS (SELECT doc_a AS doc FROM px WHERE sa = 'test' AND sb <> 'test'
         | UNION ALL SELECT doc_b FROM px WHERE sb = 'test' AND sa <> 'test')
         |SELECT doc, CAST(count(*) AS BIGINT) AS n_cross_pairs
         |FROM hits GROUP BY doc
         |ORDER BY doc""".stripMargin,
    "q_threshold_sweep" ->
      // naive corpus x grid replay of the binned suffix-sum sweep;
      // fractions are single BIGINT-over-BIGINT IEEE divisions.
      // Non-empty-corpus assumption: on an EMPTY documents table the
      // engine still emits one row per grid threshold (zero counts,
      // null fractions — pinned by TextQualitySpec) while this oracle's
      // GROUP BY over `t CROSS JOIN d` would return zero rows. The
      // harness never runs the oracle on an empty table; if that ever
      // changes, LEFT JOIN from `t` here to keep the grid.
      """WITH d AS (SELECT len(string_split_regex(lower(trim(text)), '\s+')) AS n_tokens FROM documents),
        |tot AS (SELECT CAST(count(*) AS BIGINT) AS tn, CAST(sum(n_tokens) AS BIGINT) AS tw FROM d),
        |t AS (SELECT unnest([10.0, 25.0, 50.0, 100.0, 200.0, 400.0]) AS threshold),
        |k AS (SELECT t.threshold AS threshold,
        |  CAST(count(CASE WHEN d.n_tokens >= t.threshold THEN 1 END) AS BIGINT) AS n_kept,
        |  CAST(coalesce(sum(CASE WHEN d.n_tokens >= t.threshold THEN d.n_tokens END), 0) AS BIGINT) AS w_kept
        | FROM t CROSS JOIN d GROUP BY t.threshold)
        |SELECT threshold, n_kept,
        | CAST(n_kept AS DOUBLE) / CAST(tn AS DOUBLE) AS frac_kept,
        | w_kept,
        | CAST(w_kept AS DOUBLE) / CAST(tw AS DOUBLE) AS w_frac_kept
        |FROM k CROSS JOIN tot
        |ORDER BY threshold""".stripMargin,
    "q_calibrated_gate" ->
      // the sweep replay picks the strictest threshold with WEIGHTED
      // kept-fraction >= 0.5 (the weight column drives the target;
      // loosest as the infeasible-target fallback), then the gate
      // filter applies it — same IEEE BIGINT/BIGINT division as the
      // engine's w_frac_kept comparison
      """WITH d AS (SELECT doc_id, CAST(len(string_split_regex(lower(trim(text)), '\s+')) AS BIGINT) AS n_tokens FROM documents),
        |tot AS (SELECT CAST(sum(n_tokens) AS BIGINT) AS tw FROM d),
        |t AS (SELECT unnest([10.0, 25.0, 50.0, 100.0, 200.0, 400.0]) AS threshold),
        |k AS (SELECT t.threshold AS threshold,
        |  CAST(coalesce(sum(CASE WHEN d.n_tokens >= t.threshold THEN d.n_tokens END), 0) AS BIGINT) AS w_kept
        | FROM t CROSS JOIN d GROUP BY t.threshold),
        |cut AS (SELECT coalesce(
        |   max(CASE WHEN CAST(w_kept AS DOUBLE) / CAST(tw AS DOUBLE) >= 0.5 THEN threshold END),
        |   min(threshold)) AS cut FROM k CROSS JOIN tot)
        |SELECT d.doc_id, d.n_tokens, cut.cut AS cut
        |FROM d CROSS JOIN cut WHERE CAST(d.n_tokens AS DOUBLE) >= cut.cut
        |ORDER BY d.doc_id""".stripMargin,
    "q_sample_strat" ->
      // identical md5-hex threshold literal as md5SampleFilter(_, 0.2):
      // lowercase hex compares lexicographically = numerically in both
      // engines
      s"""SELECT lang, CAST(count(*) AS BIGINT) AS n_sampled
         |FROM documents
         |WHERE md5(CAST(doc_id AS VARCHAR)) < '${TextFunctions.md5SampleThreshold(0.2)}'
         |GROUP BY lang
         |ORDER BY lang NULLS FIRST""".stripMargin,
    "q_fuzzy_pairs" ->
      // brute-force levenshtein join — valid oracle BECAUSE the
      // engine's deletion-neighborhood result is exact, not approximate
      """WITH base AS (SELECT doc_id, substr(lower(trim(text)), 1, 24) AS name
        |  FROM documents WHERE doc_id % 10 = 0),
        |planted AS (SELECT doc_id + 1000000 AS doc_id,
        |  substr(name, 1, CAST(doc_id % 20 AS INTEGER)) || 'q' ||
        |    substr(name, CAST(doc_id % 20 AS INTEGER) + 2) AS name FROM base),
        |u AS (SELECT * FROM base UNION ALL SELECT * FROM planted)
        |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |  CAST(levenshtein(a.name, b.name) AS INTEGER) AS edit_distance
        |FROM u a JOIN u b ON a.doc_id < b.doc_id
        |WHERE levenshtein(a.name, b.name) <= 1
        |ORDER BY id_a, id_b""".stripMargin,
    "q_lm_score" ->
      // the bigram LM reproduced as counts + joins; heads/vocabulary
      // derive from the c12 table exactly as the engine does, ln terms
      // round to 9dp into DECIMAL sums (the BM25/JS ulp-hardening)
      """WITH tw AS (SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS ws FROM documents),
        |rp AS (SELECT unnest([ws[i]||' '||ws[i+1] for i in range(1, len(ws))]) AS bg
        |  FROM tw WHERE doc_id % 2 = 0),
        |c12 AS (SELECT bg, count(*) AS c12 FROM rp GROUP BY bg),
        |heads AS (SELECT split_part(bg, ' ', 1) AS w1, sum(c12) AS c1 FROM c12 GROUP BY 1),
        |vocab AS (SELECT count(DISTINCT w) AS v FROM (
        |  SELECT split_part(bg,' ',1) AS w FROM c12 UNION SELECT split_part(bg,' ',2) AS w FROM c12)),
        |tp AS (SELECT doc_id, unnest([ws[i]||' '||ws[i+1] for i in range(1, len(ws))]) AS bg
        |  FROM tw WHERE doc_id % 2 = 1),
        |j AS (SELECT t.doc_id,
        |   CAST(round(ln(CAST(coalesce(c.c12,0)+1 AS DOUBLE)/(coalesce(h.c1,0)+1*v.v)), 9) AS DECIMAL(28,9)) AS lp
        |  FROM tp t LEFT JOIN c12 c USING (bg)
        |  LEFT JOIN heads h ON split_part(t.bg,' ',1)=h.w1 CROSS JOIN vocab v),
        |s AS (SELECT doc_id, count(*) AS n_bigrams, sum(lp) AS slp FROM j GROUP BY doc_id)
        |SELECT d.doc_id, CAST(coalesce(s.n_bigrams,0) AS BIGINT) AS n_bigrams,
        | CAST(s.slp AS DOUBLE)/s.n_bigrams AS avg_logprob
        |FROM (SELECT DISTINCT doc_id FROM documents WHERE doc_id % 2 = 1) d
        |LEFT JOIN s USING (doc_id) ORDER BY doc_id""".stripMargin,
    "q_cdc_dedup" ->
      // gear table keyed by the character string (md5 per position),
      // base-31 mod-2^40 Horner over the 16-char window (list_reduce no-init ≡ the
      // 0-init fold), mod-256 cut rule, conditional end cut, per-chunk
      // md5 — every branch replayed
      s"""WITH d AS (SELECT doc_id, text || '$cdcPromoSql' AS t
        |  FROM documents WHERE doc_id % 32 = 0),
        |gp AS (SELECT doc_id, t, len(t) AS n,
        |  list_transform(generate_series(1, len(t)), p ->
        |    ('0x' || substr(md5('gear:' || substr(t, p, 1)), 1, 4))::BIGINT) AS g
        | FROM d WHERE len(t) >= 1),
        |ct AS (SELECT doc_id, t, n,
        |  list_filter(generate_series(1, n), i ->
        |    list_reduce(g[greatest(i-15, 1):i], (a, x) -> (a*31 + x) % 1099511627776) % 128 = 0) AS cuts
        | FROM gp),
        |ca AS (SELECT doc_id, t,
        |  CASE WHEN len(cuts) > 0 AND cuts[-1] = n THEN cuts
        |       ELSE list_append(cuts, n) END AS cu FROM ct),
        |ch AS (SELECT doc_id, t, unnest(list_transform(generate_series(1, len(cu)), k ->
        |  struct_pack(pos := (CASE WHEN k = 1 THEN 0 ELSE cu[k-1] END) + 1,
        |              len := cu[k] - (CASE WHEN k = 1 THEN 0 ELSE cu[k-1] END)))) AS c
        | FROM ca)
        |SELECT md5(substr(t, c.pos, c.len)) AS chunk_md5, CAST(c.len AS INT) AS len,
        |  CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
        |  CAST(count(*) AS BIGINT) AS n_occurrences
        |FROM ch GROUP BY 1, 2 HAVING count(*) >= 2
        |ORDER BY n_occurrences DESC, chunk_md5 LIMIT 20""".stripMargin,
    "q_score_agreement" ->
      // both score replays composed (LM ref = even ids, target = ALL
      // docs; classifier over all docs), then row ranks under the
      // (value, doc_id) total order and the exact-integer Σd²; ρ is
      // one IEEE expression over exact operands
      """WITH tw AS (SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS ws FROM documents),
        |rp AS (SELECT unnest([ws[i]||' '||ws[i+1] for i in range(1, len(ws))]) AS bg
        |  FROM tw WHERE doc_id % 2 = 0),
        |c12 AS (SELECT bg, count(*) AS c12 FROM rp GROUP BY bg),
        |heads AS (SELECT split_part(bg, ' ', 1) AS w1, sum(c12) AS c1 FROM c12 GROUP BY 1),
        |vocab AS (SELECT count(DISTINCT w) AS v FROM (
        |  SELECT split_part(bg,' ',1) AS w FROM c12 UNION SELECT split_part(bg,' ',2) AS w FROM c12)),
        |tp AS (SELECT doc_id, unnest([ws[i]||' '||ws[i+1] for i in range(1, len(ws))]) AS bg
        |  FROM tw),
        |j AS (SELECT t.doc_id,
        |   CAST(round(ln(CAST(coalesce(c.c12,0)+1 AS DOUBLE)/(coalesce(h.c1,0)+1*v.v)), 9) AS DECIMAL(28,9)) AS lp
        |  FROM tp t LEFT JOIN c12 c USING (bg)
        |  LEFT JOIN heads h ON split_part(t.bg,' ',1)=h.w1 CROSS JOIN vocab v),
        |sagg AS (SELECT doc_id, count(*) AS n_bigrams, sum(lp) AS slp FROM j GROUP BY doc_id),
        |lmv AS (SELECT doc_id, CAST(slp AS DOUBLE)/n_bigrams AS lm FROM sagg),
        |cf AS (SELECT doc_id, ws || [ws[i]||'_'||ws[i+1] for i in range(1, len(ws))] AS fs FROM tw),
        |cs AS (SELECT doc_id, CAST(len(fs) AS BIGINT) AS n_feats,
        |  CAST(coalesce(list_aggregate(list_transform(fs,
        |    x -> (('0x' || substr(md5(x), 1, 8))::BIGINT % 4096) % 2001 - 1000), 'sum'), 0) AS BIGINT) AS w_sum
        | FROM cf),
        |clv AS (SELECT doc_id, CASE WHEN n_feats > 0 THEN CAST(w_sum AS DOUBLE)/(n_feats * 1000.0) END AS cls FROM cs),
        |joined AS (SELECT l.doc_id, lm, cls FROM lmv l JOIN clv c USING (doc_id)
        |  WHERE lm IS NOT NULL AND cls IS NOT NULL),
        |ra AS (SELECT doc_id, row_number() OVER (ORDER BY cls, doc_id) AS r1 FROM joined),
        |rb AS (SELECT doc_id, row_number() OVER (ORDER BY lm, doc_id) AS r2 FROM joined),
        |ag AS (SELECT count(*) AS n, CAST(coalesce(sum((r1 - r2) * (r1 - r2)), 0) AS DECIMAL(38,0)) AS sum_d2
        |  FROM ra JOIN rb USING (doc_id))
        |SELECT CAST(n AS BIGINT) AS n, CAST(sum_d2 AS DOUBLE) AS sum_d2,
        |  CASE WHEN n > 1 THEN 1.0 - (6.0 * CAST(sum_d2 AS DOUBLE)) /
        |    (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) * CAST(n AS DOUBLE) - 1.0)) END AS spearman_rho
        |FROM ag""".stripMargin,
    "q_quality_classifier" ->
      // hashing-trick replay: same md5-leading-8-hex bucket, same
      // centered (bucket % 2001 − 1000) integer weights, BIGINT sum →
      // one double division, so scores match to the last bit
      """WITH t AS (SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS ws FROM documents),
        |f AS (SELECT doc_id, ws || [ws[i]||'_'||ws[i+1] for i in range(1, len(ws))] AS fs FROM t),
        |s AS (SELECT doc_id, CAST(len(fs) AS BIGINT) AS n_feats,
        |  CAST(coalesce(list_aggregate(list_transform(fs,
        |    x -> (('0x' || substr(md5(x), 1, 8))::BIGINT % 4096) % 2001 - 1000), 'sum'), 0) AS BIGINT) AS w_sum
        | FROM f)
        |SELECT doc_id, n_feats, w_sum,
        | CASE WHEN n_feats > 0 THEN CAST(w_sum AS DOUBLE)/(n_feats * 1000.0) END AS score,
        | coalesce(CASE WHEN n_feats > 0 THEN CAST(w_sum AS DOUBLE)/(n_feats * 1000.0) END > 0.0, FALSE) AS keep
        |FROM s ORDER BY doc_id""".stripMargin,
    "q_classifier_weighted" ->
      // the SAME trained table the Spark side carries, embedded as a
      // 64-entry list literal (1-based index); fixed-point BIGINT sum,
      // one double division at 1e6 scale
      s"""WITH t AS (SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS ws FROM documents),
        |f AS (SELECT doc_id, ws || [ws[i]||'_'||ws[i+1] for i in range(1, len(ws))] AS fs FROM t),
        |s AS (SELECT doc_id, CAST(len(fs) AS BIGINT) AS n_feats,
        |  CAST(coalesce(list_aggregate(list_transform(fs,
        |    x -> (${SparkEntry.trainedDemoWeights.mkString("[", ", ", "]")})[(('0x' || substr(md5(x), 1, 8))::BIGINT % 64) + 1]), 'sum'), 0) AS BIGINT) AS w_sum
        | FROM f)
        |SELECT doc_id, n_feats, w_sum,
        | CASE WHEN n_feats > 0 THEN CAST(w_sum AS DOUBLE)/(n_feats * 1000000.0) END AS score,
        | coalesce(CASE WHEN n_feats > 0 THEN CAST(w_sum AS DOUBLE)/(n_feats * 1000000.0) END > 0.0, FALSE) AS keep
        |FROM s ORDER BY doc_id""".stripMargin,
    "q_ccnet_buckets" ->
      // q_lm_score's LM replay over ALL docs, then the NAIVE window
      // formulation the scalable decomposition must equal: row_number
      // per language over (score DESC, doc_id), integer tercile splits
      """WITH tw AS (SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS ws FROM documents),
        |rp AS (SELECT unnest([ws[i]||' '||ws[i+1] for i in range(1, len(ws))]) AS bg
        |  FROM tw WHERE doc_id % 2 = 0),
        |c12 AS (SELECT bg, count(*) AS c12 FROM rp GROUP BY bg),
        |heads AS (SELECT split_part(bg, ' ', 1) AS w1, sum(c12) AS c1 FROM c12 GROUP BY 1),
        |vocab AS (SELECT count(DISTINCT w) AS v FROM (
        |  SELECT split_part(bg,' ',1) AS w FROM c12 UNION SELECT split_part(bg,' ',2) AS w FROM c12)),
        |tp AS (SELECT doc_id, unnest([ws[i]||' '||ws[i+1] for i in range(1, len(ws))]) AS bg
        |  FROM tw),
        |j AS (SELECT t.doc_id,
        |   CAST(round(ln(CAST(coalesce(c.c12,0)+1 AS DOUBLE)/(coalesce(h.c1,0)+1*v.v)), 9) AS DECIMAL(28,9)) AS lp
        |  FROM tp t LEFT JOIN c12 c USING (bg)
        |  LEFT JOIN heads h ON split_part(t.bg,' ',1)=h.w1 CROSS JOIN vocab v),
        |sagg AS (SELECT doc_id, count(*) AS n_bigrams, sum(lp) AS slp FROM j GROUP BY doc_id),
        |sc AS (SELECT d.doc_id, d.lang, CAST(s.slp AS DOUBLE)/s.n_bigrams AS avg_logprob
        |  FROM documents d JOIN sagg s USING (doc_id)),
        |r AS (SELECT doc_id, lang, avg_logprob,
        |   row_number() OVER (PARTITION BY lang ORDER BY avg_logprob DESC, doc_id) AS rn,
        |   count(*) OVER (PARTITION BY lang) AS n
        |  FROM sc)
        |SELECT doc_id, lang, avg_logprob,
        | CASE WHEN rn*3 <= n THEN 'head' WHEN rn*3 <= 2*n THEN 'middle' ELSE 'tail' END AS bucket
        |FROM r ORDER BY doc_id""".stripMargin,
    "q_dsir_weights" ->
      // full DSIR replay: refit the log-ratio table, rescore every doc
      s"""$dsirCtes
        |SELECT doc_id, n_feats, w_sum, logw FROM sc ORDER BY doc_id""".stripMargin,
    "q_dsir_sample" ->
      // Gumbel-top-k membership on logw + g(md5 60-bit uniform); the
      // key decides the k winners only — output columns are the exact
      // integers/division of q_dsir_weights
      s"""$dsirCtes,
        |g AS (SELECT doc_id, n_feats, w_sum, logw,
        |   logw + (-ln(-ln((CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || 's1'), 1, 15))::BIGINT AS DOUBLE) + 0.5) / 1152921504606846976.0))) AS gk
        |  FROM sc WHERE logw IS NOT NULL),
        |topk AS (SELECT doc_id, n_feats, w_sum, logw FROM g
        |  ORDER BY gk DESC, doc_id ASC LIMIT 100)
        |SELECT doc_id, n_feats, w_sum, logw FROM topk ORDER BY doc_id""".stripMargin,
    "q_url_canon" ->
      s"""$urlDomainCtes
        |SELECT doc_id, url, url_canon, domain FROM dom ORDER BY doc_id""".stripMargin,
    "q_domain_cap" ->
      // ONE plain window replays the salted two-phase cap — top-k by a
      // total order is partition-invariant, so salt must not change
      // the kept set
      s"""$urlDomainCtes,
        |r AS (SELECT doc_id, domain,
        |  row_number() OVER (PARTITION BY domain
        |    ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
        | FROM dom)
        |SELECT doc_id, domain FROM r WHERE rn <= 3
        |ORDER BY domain, doc_id""".stripMargin,
    "q_domain_quality" ->
      // classifier replay (q_quality_classifier's CTEs) joined to the
      // domain derivation, aggregated per domain; mean = DECIMAL sum of
      // 9dp-rounded scores cast to DOUBLE, one division
      domainQualitySql,
    "q_domain_refresh" ->
      // THE SAME direct rollup as q_domain_quality, verbatim: the Spark
      // side computes merge(state(base), state(delta)) over a
      // deterministic corpus split — hash equality against the direct
      // single-pass oracle IS the mergeability proof
      domainQualitySql,
    "q_domain_sample" ->
      // domain keep rates → sqrt-flattened weights (IEEE-exact), kept
      // docs by INTEGER comparison: 60-bit md5 prefix <
      // floor(weight·2^60) — floor(), not a cast (DuckDB casts round,
      // Spark casts truncate)
      s"""$domainAggCtes,
        |wts AS (SELECT domain,
        |  least(1.0, greatest(sqrt(CAST(n_keep AS DOUBLE)/n_docs), 0.05)) AS weight
        | FROM agg)
        |SELECT d.doc_id, d.domain, w.weight
        |FROM dom d JOIN wts w USING (domain)
        |WHERE ('0x' || substr(md5(CAST(d.doc_id AS VARCHAR) || 's1'), 1, 15))::BIGINT
        |  < CAST(floor(w.weight * 1152921504606846976) AS BIGINT)
        |ORDER BY d.doc_id""".stripMargin,
    "q_line_dedup" ->
      // same derived 2-word lines, keep-first replayed by list_position
      // (first-occurrence index) — O(L²) is fine for the oracle
      """WITH l AS (SELECT doc_id,
        |  regexp_replace(text, '(\S+ \S+) ', '\1' || chr(10), 'g') AS t FROM documents),
        |s AS (SELECT doc_id, string_split(t, chr(10)) AS ls FROM l),
        |k AS (SELECT doc_id, ls,
        |  list_filter(ls, (x, i) -> list_position(ls, x) = i) AS kept FROM s)
        |SELECT doc_id, CAST(len(ls) AS BIGINT) AS n_segments,
        | CAST(len(kept) AS BIGINT) AS n_kept,
        | array_to_string(kept, chr(10)) AS text_deduped
        |FROM k ORDER BY doc_id""".stripMargin,
    "q_html_extract" ->
      // the declared extraction chain, verbatim: 5 structural regex
      // passes (comments, script, style, block→newline, tags), 6 entity
      // replaces in order (&amp; last), 3 whitespace passes + trim —
      // the native expression must match this bit-for-bit
      """WITH h AS (SELECT doc_id,
        |  '<!DOCTYPE html><html><head><title>Doc ' || CAST(doc_id AS VARCHAR) ||
        |  '</title><style type="text/css">body { margin: 0; }</style>' ||
        |  '<script>if (a < b && c > d) { x = "y"; }</script></head>' ||
        |  '<body><!-- id ' || CAST(doc_id AS VARCHAR) || ' --><h1>Doc ' || CAST(doc_id AS VARCHAR) ||
        |  '</h1><div class="main"><p>' ||
        |  regexp_replace(text, '(\S+ \S+ \S+ \S+ \S+) ', '\1</p><p>', 'g') ||
        |  '</p><p>&quot;x&quot; &lt;tag&gt; &amp;co&nbsp;end</p></div>' ||
        |  '<br><ul><li>a</li><li>b</li></ul></body></html>' AS html FROM documents),
        |ex AS (SELECT doc_id, trim(
        |  regexp_replace(regexp_replace(regexp_replace(
        |  replace(replace(replace(replace(replace(replace(
        |  regexp_replace(regexp_replace(regexp_replace(regexp_replace(regexp_replace(
        |    html,
        |    '<!--.*?-->', '', 'gs'),
        |    '<script\b[^>]*>.*?</script>', '', 'gis'),
        |    '<style\b[^>]*>.*?</style>', '', 'gis'),
        |    '</?(p|div|br|li|ul|ol|h[1-6]|tr|td|th|table|blockquote)\b[^>]*>', chr(10), 'gi'),
        |    '<[^>]*>', '', 'gs'),
        |  '&lt;', '<'), '&gt;', '>'), '&quot;', '"'), '&#39;', chr(39)), '&nbsp;', ' '), '&amp;', '&'),
        |  '[ \t\r\f]+', ' ', 'g'), ' *\n *', chr(10), 'g'), '\n+', chr(10), 'g'),
        |  ' ' || chr(10)) AS t FROM h)
        |SELECT doc_id, CAST(length(t) AS BIGINT) AS n_chars,
        |  CAST(length(t) - length(replace(t, chr(10), '')) + 1 AS BIGINT) AS n_lines,
        |  substr(t, 1, 60) AS head, md5(t) AS body_md5
        |FROM ex ORDER BY doc_id""".stripMargin,
    "q_fix_mojibake" ->
      // the corruption replayed forward; the REPAIRED truth is the
      // injected string itself (repair must invert the corruption), so
      // n_chars_fixed/fixed_md5 come from `injected`, never from a
      // reimplementation of the decoder
      """WITH inj AS (SELECT doc_id, translate(text, 'etqx', 'é’“”') AS injected FROM documents),
        |bad AS (SELECT doc_id, injected,
        |  replace(replace(replace(replace(injected,
        |    'é', 'Ã©'), '’', 'â€™'), '“', 'â€œ'), '”', 'â€' || chr(157)) AS b
        | FROM inj)
        |SELECT doc_id, CAST(length(b) AS BIGINT) AS n_chars_bad,
        |  CAST(length(injected) AS BIGINT) AS n_chars_fixed,
        |  md5(injected) AS fixed_md5
        |FROM bad ORDER BY doc_id""".stripMargin,
    "q_link_graph" ->
      // src domains from the shared url CTEs; hrefs re-extracted with
      // the same regex, then hostOf + registeredDomain replayed on each
      // target; relative links yield domain '' and drop
      s"""$linkGraphCtes
        |SELECT d.domain AS src_domain, t.dst_domain,
        |  CAST(count(*) AS BIGINT) AS n_links,
        |  CAST(count(DISTINCT d.url) AS BIGINT) AS n_pages
        |FROM dom d JOIN dstd t USING (doc_id)
        |WHERE t.dst_domain <> ''
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q_anchor_text" ->
      // anchorHtml replayed arithmetically; both capture groups of the
      // SAME pattern extracted and unnested in lockstep (DuckDB zips
      // parallel unnests positionally, exactly like the arrays_zip);
      // dst domains via the hostOf+registeredDomain replay; top anchor
      // by row_number ≡ the struct-min (max n, tie → min anchor)
      s"""$urlDomainCtes,
        |ah AS (SELECT d.doc_id, d.url,
        |  '<p><a href="https://www.site' || CAST((d.doc_id*5+2)%12 AS VARCHAR) || '.' ||
        |   ['com','org','co.uk','io','ac.jp'][CAST((d.doc_id*9+4)%5 AS INT)+1] ||
        |  '/p">' || substr(translate(t.text, '<>"&', ''), 1, 24) || '</a> ' ||
        |  '<a class="m" href="http://blog.site' || CAST((d.doc_id*7+4)%12 AS VARCHAR) || '.' ||
        |   ['com','net','org.uk','io','ne.jp'][CAST((d.doc_id*5+3)%5 AS INT)+1] ||
        |  '">Doc ' || CAST(d.doc_id%7 AS VARCHAR) || '</a> ' ||
        |  '<a href="/rel">skip me</a><a href="https://x.site0.com"><b>bold</b></a>' ||
        |  '<a href="https://ads.site9.com/z"></a></p>' AS html
        | FROM dom d JOIN documents t USING (doc_id)),
        |prs AS (SELECT doc_id, url,
        |  unnest(regexp_extract_all(html, '<a [^>]*href="([^"]*)"[^>]*>([^<]*)</a>', 1)) AS href,
        |  unnest(regexp_extract_all(html, '<a [^>]*href="([^"]*)"[^>]*>([^<]*)</a>', 2)) AS anchor
        | FROM ah),
        |pa AS (SELECT doc_id, url, anchor, lower(regexp_replace(regexp_extract(regexp_replace(
        |    regexp_replace(trim(href), '#.*$$', ''),
        |    '^[A-Za-z][A-Za-z0-9+.\\-]*://', ''), '^([^/?]*)', 1), '^[^@/]*@', '')) AS auth FROM prs),
        |pa2 AS (SELECT doc_id, url, anchor, regexp_replace(auth, ':[0-9]+$$', '') AS host FROM pa),
        |pa3 AS (SELECT doc_id, url, anchor, host, string_split(host, '.') AS ls, len(string_split(host, '.')) AS n FROM pa2),
        |aex AS (SELECT doc_id, url, anchor,
        |   CASE WHEN n <= 2 THEN host
        |        WHEN list_contains($suffixListSql, ls[n-1] || '.' || ls[n]) THEN ls[n-2] || '.' || ls[n-1] || '.' || ls[n]
        |        ELSE ls[n-1] || '.' || ls[n] END AS dst_domain FROM pa3
        | ),
        |ex AS (SELECT * FROM aex WHERE dst_domain <> '' AND anchor <> ''),
        |ba AS (SELECT dst_domain, anchor, count(*) AS n FROM ex GROUP BY 1, 2),
        |tp AS (SELECT dst_domain, anchor AS top_anchor, n AS top_anchor_n,
        |  row_number() OVER (PARTITION BY dst_domain ORDER BY n DESC, anchor) AS rn FROM ba)
        |SELECT e.dst_domain, CAST(count(*) AS BIGINT) AS n_anchors,
        |  CAST(count(DISTINCT e.url) AS BIGINT) AS n_pages,
        |  t.top_anchor, CAST(t.top_anchor_n AS BIGINT) AS top_anchor_n
        |FROM ex e JOIN tp t ON e.dst_domain = t.dst_domain AND t.rn = 1
        |GROUP BY 1, t.top_anchor, t.top_anchor_n
        |ORDER BY 1""".stripMargin,
    "q_url_blocklist" ->
      // host suffixes generated from dot positions (list_filter over
      // generate_series ≡ the Spark HOF chain), longest matching entry
      // via arg_max (suffix lengths are strictly decreasing — unique)
      s"""$urlDomainCtes,
        |bl AS (SELECT unnest(['site3.com','www.site3.com','api.site7.io',
        |   'news.site1.org','site5.co.uk','nohit.example']) AS entry),
        |sf AS (SELECT doc_id, unnest(list_prepend(host,
        |   list_transform(list_filter(generate_series(1, length(host)),
        |     i -> substr(host, i, 1) = '.'),
        |     p -> substr(host, p + 1, length(host))))) AS suf FROM dom),
        |ht AS (SELECT s.doc_id, arg_max(s.suf, length(s.suf)) AS blocked_by
        | FROM sf s JOIN bl b ON s.suf = b.entry GROUP BY s.doc_id)
        |SELECT COALESCE(h.blocked_by, '') AS blocked_by,
        |  CAST(count(*) AS BIGINT) AS n_docs
        |FROM dom d LEFT JOIN ht h USING (doc_id)
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_domain_tiered_cap" ->
      // PageRank replayed (same unrolled CTEs), integer tier caps,
      // then the md5-order cap replay with a per-domain k and the
      // defaultK fallback for unranked domains
      s"""$linkGraphCtes,
        |edges AS (SELECT DISTINCT d.domain AS src, t.dst_domain AS dst
        |  FROM dom d JOIN dstd t USING (doc_id) WHERE t.dst_domain <> ''),
        |nodes AS (SELECT src AS node FROM edges UNION SELECT dst FROM edges),
        |outd AS (SELECT src, count(*) AS od FROM edges GROUP BY src),
        |prr0 AS (SELECT node, CAST(1000000000 AS BIGINT) AS r FROM nodes),
        |$pageRankIterSql,
        |caps AS (SELECT node AS cdom,
        |  CASE WHEN r >= 1000000000 THEN 120 ELSE 40 END AS k FROM prr8),
        |capk AS (SELECT d.doc_id, d.domain, COALESCE(c.k, 60) AS k,
        |  md5(CAST(d.doc_id AS VARCHAR)) AS o
        | FROM dom d LEFT JOIN caps c ON d.domain = c.cdom),
        |rn AS (SELECT *, row_number() OVER (PARTITION BY domain ORDER BY o, doc_id) AS rn FROM capk),
        |kept AS (SELECT * FROM rn WHERE rn <= k)
        |SELECT domain, CAST(max(k) AS INT) AS k_cap,
        |  CAST(count(*) AS BIGINT) AS n_kept
        |FROM kept GROUP BY domain ORDER BY domain""".stripMargin,
    "q_pagerank" ->
      // the link-graph CTEs feed the distinct domain edge set; then 8
      // unrolled fixed-point iterations — floor division on longs
      // (DuckDB `//` ≡ Spark DIV on non-negatives), teleport
      // 0.15·scale, damping 85/100, dangling mass dropped. Bit-exact
      // by construction: no float touches the recursion
      pageRankOracleSql,
    "q_pagerank_resume" ->
      // warm start over the SAME edges is exactly the continued
      // recursion — the oracle is the identical 8-round unrolled SQL
      pageRankOracleSql,
    "q_dup_spans" ->
      // winnowing replayed list-for-list: per-position 60-bit md5 gram
      // hashes, per-window list_min with FIRST-occurrence position
      // (list_position = Spark array_position), distinct (fp, pos) per
      // doc, min pos per (doc, fp), doc-frequency cap, fp equi-join,
      // then the span text compared character-exactly before counting
      """WITH docs AS (SELECT doc_id, text FROM documents WHERE length(text) >= 30),
        |hs AS (SELECT doc_id,
        |  list_transform(generate_series(1, length(text)-30+1),
        |    i -> ('0x' || substr(md5(substr(text, i, 30)), 1, 15))::BIGINT) AS h
        | FROM docs),
        |wn AS (SELECT doc_id,
        |  -- no list_distinct (DuckDB lacks it for struct lists); the
        |  -- min-pos GROUP BY in fp1 collapses duplicates identically
        |  list_transform(generate_series(1, greatest(len(h)-10+1, 1)),
        |    j -> struct_pack(fp := list_min(h[j:j+9]),
        |                     pos := j + list_position(h[j:j+9], list_min(h[j:j+9])) - 1)) AS fps
        | FROM hs),
        |fpu AS (SELECT doc_id, u.fp AS fp, u.pos AS pos
        | FROM (SELECT doc_id, unnest(fps) AS u FROM wn)),
        |fp1 AS (SELECT doc_id, fp, min(pos) AS pos FROM fpu GROUP BY doc_id, fp),
        |safe AS (SELECT * FROM fp1 WHERE fp NOT IN
        |  (SELECT fp FROM fp1 GROUP BY fp HAVING count(*) > 64)),
        |ver AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, a.pos AS pos_a, b.pos AS pos_b
        | FROM safe a JOIN safe b ON a.fp = b.fp AND a.doc_id < b.doc_id
        | JOIN docs ta ON a.doc_id = ta.doc_id
        | JOIN docs tb ON b.doc_id = tb.doc_id
        | WHERE substr(ta.text, CAST(a.pos AS INTEGER), 30) = substr(tb.text, CAST(b.pos AS INTEGER), 30)),
        |sel AS (SELECT id_a, id_b, pos_a, pos_b,
        |  row_number() OVER (PARTITION BY id_a, id_b ORDER BY pos_a, pos_b) AS rn,
        |  count(*) OVER (PARTITION BY id_a, id_b) AS n
        | FROM ver)
        |SELECT id_a, id_b, CAST(n AS BIGINT) AS n_spans,
        |  CAST(pos_a AS INTEGER) AS pos_a, CAST(pos_b AS INTEGER) AS pos_b
        |FROM sel WHERE rn = 1 ORDER BY id_a, id_b""".stripMargin,
    "q_dup_span_strip" ->
      // same winnow/verify CTEs; then per loser doc the sorted distinct
      // anchor starts, and a per-char mask (kept iff no span start in
      // (i-k, i]) rebuilt with an ordered string_agg — the identical
      // list algebra the Spark side runs with zip_with/exists
      """WITH docs AS (SELECT doc_id, text FROM documents WHERE length(text) >= 30),
        |hs AS (SELECT doc_id,
        |  list_transform(generate_series(1, length(text)-30+1),
        |    i -> ('0x' || substr(md5(substr(text, i, 30)), 1, 15))::BIGINT) AS h
        | FROM docs),
        |wn AS (SELECT doc_id,
        |  list_transform(generate_series(1, greatest(len(h)-10+1, 1)),
        |    j -> struct_pack(fp := list_min(h[j:j+9]),
        |                     pos := j + list_position(h[j:j+9], list_min(h[j:j+9])) - 1)) AS fps
        | FROM hs),
        |fpu AS (SELECT doc_id, u.fp AS fp, u.pos AS pos
        | FROM (SELECT doc_id, unnest(fps) AS u FROM wn)),
        |fp1 AS (SELECT doc_id, fp, min(pos) AS pos FROM fpu GROUP BY doc_id, fp),
        |safe AS (SELECT * FROM fp1 WHERE fp NOT IN
        |  (SELECT fp FROM fp1 GROUP BY fp HAVING count(*) > 64)),
        |ver AS (SELECT b.doc_id AS doc_id, b.pos AS pos
        | FROM safe a JOIN safe b ON a.fp = b.fp AND a.doc_id < b.doc_id
        | JOIN docs ta ON a.doc_id = ta.doc_id
        | JOIN docs tb ON b.doc_id = tb.doc_id
        | WHERE substr(ta.text, CAST(a.pos AS INTEGER), 30) = substr(tb.text, CAST(b.pos AS INTEGER), 30)),
        |spans AS (SELECT doc_id, list_sort(list(DISTINCT pos)) AS ps FROM ver GROUP BY doc_id),
        |strip AS (SELECT d.doc_id,
        |  CAST(len(s.ps) AS BIGINT) AS n_anchor_sites,
        |  coalesce(list_aggregate(list_transform(
        |    list_filter(generate_series(1, length(d.text)),
        |      i -> len(list_filter(s.ps, p -> p <= i AND i < p + 30)) = 0),
        |    i -> substr(d.text, CAST(i AS INTEGER), 1)), 'string_agg', ''), '') AS text_stripped,
        |  length(d.text) AS orig_len
        | FROM docs d JOIN spans s ON d.doc_id = s.doc_id)
        |SELECT doc_id, n_anchor_sites,
        |  CAST(orig_len - length(text_stripped) AS BIGINT) AS n_chars_removed,
        |  text_stripped
        |FROM strip ORDER BY doc_id""".stripMargin,
    "q_cross_spans" ->
      // the winnow CTEs instantiated over BOTH sides (corpus, and the
      // +500000 re-arrival drop), corpus-side doc-frequency cap,
      // asymmetric fp join, exact substr verify, first-position window
      """WITH docs AS (SELECT doc_id, text FROM documents WHERE length(text) >= 30),
        |drp AS (SELECT doc_id + 500000 AS doc_id, text FROM documents
        |        WHERE doc_id % 7 = 0 AND length(text) >= 30),
        |chs AS (SELECT doc_id,
        |  list_transform(generate_series(1, length(text)-30+1),
        |    i -> ('0x' || substr(md5(substr(text, i, 30)), 1, 15))::BIGINT) AS h
        | FROM docs),
        |cwn AS (SELECT doc_id,
        |  list_transform(generate_series(1, greatest(len(h)-10+1, 1)),
        |    j -> struct_pack(fp := list_min(h[j:j+9]),
        |                     pos := j + list_position(h[j:j+9], list_min(h[j:j+9])) - 1)) AS fps
        | FROM chs),
        |cfp1 AS (SELECT doc_id, u.fp AS fp, min(u.pos) AS pos
        | FROM (SELECT doc_id, unnest(fps) AS u FROM cwn) GROUP BY doc_id, u.fp),
        |dhs AS (SELECT doc_id,
        |  list_transform(generate_series(1, length(text)-30+1),
        |    i -> ('0x' || substr(md5(substr(text, i, 30)), 1, 15))::BIGINT) AS h
        | FROM drp),
        |dwn AS (SELECT doc_id,
        |  list_transform(generate_series(1, greatest(len(h)-10+1, 1)),
        |    j -> struct_pack(fp := list_min(h[j:j+9]),
        |                     pos := j + list_position(h[j:j+9], list_min(h[j:j+9])) - 1)) AS fps
        | FROM dhs),
        |dfp1 AS (SELECT doc_id, u.fp AS fp, min(u.pos) AS pos
        | FROM (SELECT doc_id, unnest(fps) AS u FROM dwn) GROUP BY doc_id, u.fp),
        |safe_new AS (SELECT * FROM dfp1 WHERE fp NOT IN
        |  (SELECT fp FROM cfp1 GROUP BY fp HAVING count(*) > 64)),
        |ver AS (SELECT n.doc_id AS new_id, c.doc_id AS corpus_id,
        |        n.pos AS pos_new, c.pos AS pos_corpus
        | FROM safe_new n JOIN cfp1 c ON n.fp = c.fp
        | JOIN drp tn ON n.doc_id = tn.doc_id
        | JOIN docs tc ON c.doc_id = tc.doc_id
        | WHERE substr(tn.text, CAST(n.pos AS INTEGER), 30) = substr(tc.text, CAST(c.pos AS INTEGER), 30)),
        |sel AS (SELECT new_id, corpus_id, pos_new, pos_corpus,
        |  row_number() OVER (PARTITION BY new_id, corpus_id ORDER BY pos_new, pos_corpus) AS rn,
        |  count(*) OVER (PARTITION BY new_id, corpus_id) AS n
        | FROM ver)
        |SELECT new_id, corpus_id, CAST(n AS BIGINT) AS n_spans,
        |  CAST(pos_new AS INTEGER) AS pos_new, CAST(pos_corpus AS INTEGER) AS pos_corpus
        |FROM sel WHERE rn = 1 ORDER BY new_id, corpus_id""".stripMargin,
    "q_outliers" ->
      // the engine's exact-moment formula replayed verbatim (decimal
      // sums → double ratios → IEEE sqrt — NOT avg/stddev_pop, whose
      // double accumulation is order-dependent); planted 100× rows
      // separate cleanly (z≈30 vs ≤0.3) so no boundary comparisons
      """WITH c AS (SELECT o_orderpriority AS g,
        |  CASE WHEN o_orderkey % 997 = 0 THEN o_totalprice * 100
        |       ELSE o_totalprice END AS amount FROM orders),
        |s AS (SELECT g, count(amount) AS n,
        |  CAST(sum(CAST(amount AS DECIMAL(18,4))) AS DOUBLE)/count(amount) AS m,
        |  CAST(sum(CAST(amount AS DECIMAL(19,4)) * CAST(amount AS DECIMAL(19,4))) AS DOUBLE)/count(amount) AS ex2
        | FROM c GROUP BY g),
        |j AS (SELECT c.g, c.amount, s.n, s.m,
        |  sqrt(greatest(s.ex2 - s.m*s.m, 0)) AS sd FROM c JOIN s USING (g))
        |SELECT g AS o_orderpriority, count(*) AS n_outliers,
        | min(amount) AS min_outlier, max(amount) AS max_outlier
        |FROM j WHERE n >= 2 AND sd > 0 AND abs(amount - m) > 3.0*sd
        |GROUP BY g ORDER BY o_orderpriority""".stripMargin,
    "q_pps_sample" ->
      // systematic PPS reproduced integer-exactly: HUGEINT cumulative
      // sums over the identical md5 order, integral // division — the
      // selected set and repeat counts are bit-identical cross-engine
      """WITH t AS (SELECT lang, doc_id,
        |  CAST(len(string_split_regex(lower(trim(text)), '\s+')) AS HUGEINT) AS w,
        |  md5(CAST(doc_id AS VARCHAR) || 's1') AS ord
        | FROM documents WHERE len(trim(text)) > 0),
        |c AS (SELECT lang, doc_id, w,
        |  sum(w) OVER (PARTITION BY lang ORDER BY ord, doc_id ROWS UNBOUNDED PRECEDING) AS cum,
        |  sum(w) OVER (PARTITION BY lang) AS tot
        | FROM t WHERE w > 0)
        |SELECT lang, doc_id, CAST(w AS BIGINT) AS weight,
        | CAST((cum*10)//tot - ((cum-w)*10)//tot AS BIGINT) AS n_hits
        |FROM c WHERE (cum*10)//tot > ((cum-w)*10)//tot
        |ORDER BY lang, doc_id""".stripMargin,
    "q_vocab_div" ->
      """WITH wa AS (SELECT unnest(string_split_regex(lower(trim(text)), '\s+')) AS token
        |  FROM documents WHERE doc_id % 2 = 0),
        |ca AS (SELECT token, count(*) AS ca FROM wa GROUP BY token),
        |wb AS (SELECT unnest(string_split_regex(lower(trim(text)), '\s+')) AS token
        |  FROM documents WHERE doc_id % 2 = 1),
        |cb AS (SELECT token, count(*) AS cb FROM wb GROUP BY token),
        |j AS (SELECT coalesce(ca.ca, 0) AS ca, coalesce(cb.cb, 0) AS cb
        |  FROM ca FULL OUTER JOIN cb USING (token)),
        |tot AS (SELECT sum(ca) AS ta, sum(cb) AS tb FROM j),
        |terms AS (SELECT ca, cb, ta, tb,
        |  CAST(ca AS DOUBLE)/ta AS p, CAST(cb AS DOUBLE)/tb AS q FROM j, tot),
        |r AS (SELECT ca, cb, ta, tb,
        |  CAST(round(CASE WHEN p > 0 THEN p*ln(2.0*p/(p+q)) ELSE 0.0 END, 9) AS DECIMAL(28,9)) AS tp,
        |  CAST(round(CASE WHEN q > 0 THEN q*ln(2.0*q/(p+q)) ELSE 0.0 END, 9) AS DECIMAL(28,9)) AS tq
        | FROM terms)
        |SELECT 0.5*CAST(sum(tp) AS DOUBLE) + 0.5*CAST(sum(tq) AS DOUBLE) AS js_divergence,
        | CAST(max(ta) AS BIGINT) AS n_tokens_a, CAST(max(tb) AS BIGINT) AS n_tokens_b,
        | CAST(sum(CASE WHEN ca > 0 THEN 1 ELSE 0 END) AS BIGINT) AS vocab_a,
        | CAST(sum(CASE WHEN cb > 0 THEN 1 ELSE 0 END) AS BIGINT) AS vocab_b
        |FROM r""".stripMargin,
    "q_profile" -> Seq("o_custkey", "o_orderkey", "o_totalprice").map(c =>
      s"""SELECT '$c' AS "column", CAST(count(*) AS BIGINT) AS n,
         | CAST(sum(CASE WHEN $c IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS nulls,
         | CAST(min($c) AS DOUBLE) AS min, CAST(max($c) AS DOUBLE) AS max,
         | CAST(sum(CAST($c AS DECIMAL(38,8))) AS DOUBLE) / count($c) AS mean
         |FROM orders""".stripMargin)
      .mkString("", "\nUNION ALL\n", "\nORDER BY \"column\""),
    "q_interval_join" ->
      // b side replays the fixed 1024-order md5 panel (r17 bound)
      """WITH a AS (SELECT o_orderkey AS a_id,
        |  CAST(date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) AS BIGINT) AS a_start
        | FROM orders WHERE o_orderkey % 97 = 0),
        |b AS (SELECT o_orderkey AS b_id,
        |  CAST(date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) AS BIGINT) AS b_start
        | FROM orders WHERE o_orderkey % 199 = 0
        | ORDER BY md5(CAST(o_orderkey AS VARCHAR) || ':ivj'), o_orderkey
        | LIMIT 1024)
        |SELECT a_id, b_id, a_start, b_start
        |FROM a JOIN b ON a_start <= b_start + 30 AND b_start <= a_start + 21
        |ORDER BY a_id, b_id""".stripMargin,
    "q_range_join" ->
      // interval side replays the fixed 1024-order md5 panel (r17 bound)
      """WITH p AS (SELECT o_orderkey AS point_id,
        |  CAST(date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) AS BIGINT) AS day
        | FROM orders WHERE o_orderkey % 7 = 0),
        |i AS (SELECT o_orderkey AS interval_id,
        |  CAST(date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) AS BIGINT) AS start_day
        | FROM orders WHERE o_orderkey % 199 = 0
        | ORDER BY md5(CAST(o_orderkey AS VARCHAR) || ':rji'), o_orderkey
        | LIMIT 1024)
        |SELECT point_id, interval_id, day
        |FROM p JOIN i ON day BETWEEN start_day AND start_day + 30
        |ORDER BY point_id, interval_id""".stripMargin,
    "q_chunk" ->
      // fixed 0..511 start grid + filter stands in for a lateral
      // generate_series (docs are ≤ a few hundred tokens; chunkByTokens
      // itself has no such bound)
      """WITH t AS (SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS toks
        |  FROM documents WHERE len(trim(text)) > 0),
        |s AS (SELECT doc_id, toks, len(toks) AS n FROM t),
        |c AS (SELECT doc_id, toks, n, g.st AS st
        |  FROM s, generate_series(0, 511, 24) g(st)
        |  WHERE g.st <= greatest(0, CAST(ceil(CAST(n - 32 AS DOUBLE)/24) AS INTEGER)*24))
        |SELECT doc_id, CAST(st/24 AS INTEGER) AS chunk_idx,
        | array_to_string(list_slice(toks, st+1, least(st+32, n)), ' ') AS chunk_text,
        | CAST(least(32, n - st) AS INTEGER) AS n_tokens
        |FROM c ORDER BY doc_id, chunk_idx""".stripMargin,
    "q_audio_fp" ->
      // fingerprint bit f set iff amp rises frame f→f+1, i.e. doc_id
      // bit f+1 set and bit f clear
      """WITH f AS (SELECT doc_id, CAST(g.f AS INTEGER) AS f
        |  FROM documents, generate_series(0, 14) g(f))
        |SELECT doc_id,
        | CAST(coalesce(sum(CASE WHEN ((doc_id >> (f+1)) & 1) = 1
        |    AND ((doc_id >> f) & 1) = 0
        |   THEN (1::BIGINT << f) ELSE 0 END), 0) AS BIGINT) AS afp
        |FROM f GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "q_image_phash" ->
      // the dHash oracle: synthetic colors depend only on x, so the 8×8
      // luma plane is 8 identical rows; difference bits at y·7+x
      """WITH gx AS (SELECT doc_id, CAST(g.x AS INTEGER) AS x
        |  FROM documents, generate_series(0, 7) g(x)),
        |rgb AS (SELECT doc_id, x,
        |  CASE WHEN doc_id % 2 = 0 THEN CAST(doc_id % 256 AS INTEGER)
        |       ELSE CAST(x*255//7 AS INTEGER) END AS r,
        |  CASE WHEN doc_id % 2 = 0 THEN CAST((doc_id*7 + 3) % 256 AS INTEGER)
        |       ELSE CAST(doc_id % 256 AS INTEGER) END AS g,
        |  CASE WHEN doc_id % 2 = 0 THEN CAST((doc_id*13 + 5) % 256 AS INTEGER)
        |       ELSE CAST(255 - x*255//7 AS INTEGER) END AS b
        | FROM gx),
        |lum AS (SELECT doc_id, x, (299*r + 587*g + 114*b)//1000 AS l FROM rgb),
        |bits AS (SELECT a.doc_id, a.x,
        |  CASE WHEN b.l > a.l THEN 1 ELSE 0 END AS bit
        | FROM lum a JOIN lum b ON a.doc_id = b.doc_id AND b.x = a.x + 1
        | WHERE a.x < 7)
        |SELECT doc_id,
        | CAST(coalesce(sum(bit * (1::BIGINT << (y.y*7 + x))), 0) AS BIGINT) AS phash
        |FROM bits, generate_series(0, 7) y(y)
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin,
  )
}
