package graft

import graft.functions.TextFunctions
import OracleCtes._

/** DuckDB oracle SQL — relational/dedup/events half of the registry
  * (TPC-H-ish aggregates, joins, dedup families, cluster dedup,
  * MinHash/SimHash twins, percentiles, as-of joins, curation,
  * sessionization/funnels, multimodal decode). See
  * [[SparkEntry.oracleSql]].
  */
private[graft] object OracleSqlCore {

  // FULL RECOMPUTE over the v3 corpus — the Spark side runs the
  // incremental path (edge ledger carried v1 → v2 → v3, only
  // added/changed docs pay pair generation), so a green row IS the
  // cross-engine identity proof. CC via the q_dedup_clusters
  // reachability CTE. Shared verbatim by q_inc_curate (in-flight
  // unchanged-side shingling) and q_inc_curate_store (persisted
  // shingle-store twin) — one truth, two engine paths.
  private val incCurateFullRecompute: String =
    """WITH RECURSIVE v1 AS (SELECT CAST(doc_id AS BIGINT) doc_id, text FROM documents WHERE doc_id % 3 <> 2),
      |v2 AS (
      | SELECT doc_id, CASE WHEN doc_id % 13 = 0 THEN text || ' r2' ELSE text END AS text
      | FROM v1 WHERE doc_id % 11 <> 0
      | UNION ALL
      | SELECT CAST(doc_id AS BIGINT), text FROM documents WHERE doc_id % 3 = 2 AND doc_id % 2 = 0),
      |v3 AS (
      | SELECT doc_id, CASE WHEN doc_id % 7 = 0 THEN text || ' r3' ELSE text END AS text
      | FROM v2 WHERE doc_id % 19 <> 0
      | UNION ALL
      | SELECT CAST(doc_id AS BIGINT), text FROM documents WHERE doc_id % 3 = 2 AND doc_id % 2 = 1),
      |w AS (SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS ws FROM v3),
      |sh AS (SELECT doc_id, unnest(list_distinct(
      |  [ws[i]||'_'||ws[i+1]||'_'||ws[i+2] for i in range(1, len(ws)-1)])) AS s FROM w),
      |sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id),
      |cand AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS common
      | FROM sh a JOIN sh b ON a.s=b.s AND a.doc_id < b.doc_id GROUP BY 1, 2),
      |pairs AS (SELECT doc_a, doc_b FROM cand
      | JOIN sizes sa ON doc_a=sa.doc_id JOIN sizes sb ON doc_b=sb.doc_id
      | WHERE CAST(common AS DOUBLE)/(sa.sz + sb.sz - common) >= 0.8),
      |edges AS (SELECT doc_a AS u, doc_b AS v FROM pairs
      | UNION SELECT doc_b, doc_a FROM pairs),
      |reach(node, comp) AS (
      | SELECT u, u FROM edges
      | UNION
      | SELECT e.u, r.comp FROM edges e JOIN reach r ON e.v = r.node),
      |comps AS (SELECT node, min(comp) AS comp FROM reach GROUP BY node)
      |SELECT d.doc_id, COALESCE(c.comp, d.doc_id) AS cluster_id,
      | COALESCE(c.comp, d.doc_id) = d.doc_id AS is_canonical
      |FROM v3 d LEFT JOIN comps c ON d.doc_id = c.node
      |ORDER BY doc_id""".stripMargin

  val sql: Map[String, String] = Map(
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
        | CAST(SUM(CAST(l_quantity AS DECIMAL(27,2))) AS DOUBLE) AS sum_qty,
        | CAST(SUM(CAST(l_extendedprice AS DECIMAL(27,2))) AS DOUBLE) AS sum_base_price,
        | CAST(SUM(CAST(l_extendedprice*(1-l_discount) AS DECIMAL(27,4))) AS DOUBLE) AS sum_disc_price,
        | CAST(SUM(CAST(l_extendedprice*(1-l_discount)*(1+l_tax) AS DECIMAL(27,6))) AS DOUBLE) AS sum_charge,
        | count(*) AS count_order
        |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        |GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q3_top10" ->
      """SELECT l.l_orderkey, o.o_orderdate, o.o_orderpriority,
        | CAST(SUM(CAST(l.l_extendedprice*(1-l.l_discount) AS DECIMAL(27,4))) AS DOUBLE) AS revenue
        |FROM lineitem l JOIN orders o ON l.l_orderkey=o.o_orderkey
        | JOIN customer c ON o.o_custkey=c.c_custkey
        |WHERE c.c_mktsegment='BUILDING' AND o.o_orderdate < TIMESTAMP '1998-07-01'
        | AND l.l_shipdate > TIMESTAMP '1998-07-01'
        |GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
        |ORDER BY revenue DESC, l.l_orderkey LIMIT 10""".stripMargin,
    "q_a2_sortedset" ->
      """SELECT l_returnflag,
        | CAST(SUM(CAST(l_quantity AS DECIMAL(27,2))) AS DOUBLE) AS sum_qty,
        | string_agg(DISTINCT l_linestatus, '; ' ORDER BY l_linestatus) AS statuses
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q_a4_masked" ->
      """SELECT
        | CAST(SUM(CASE WHEN l_returnflag='R' THEN CAST(l_quantity AS DECIMAL(27,2)) END) AS DOUBLE) AS returned_qty,
        | CAST(SUM(CASE WHEN EXTRACT(year FROM l_shipdate)=1997 THEN CAST(l_quantity AS DECIMAL(27,2)) END) AS DOUBLE) AS qty_1997,
        | CAST(SUM(CASE WHEN l_discount>0.05 THEN CAST(l_quantity AS DECIMAL(27,2)) END) AS DOUBLE) AS high_disc_qty
        |FROM lineitem""".stripMargin,
    "q_a7_window_count" ->
      """SELECT doc_id, lang, count(*) OVER (PARTITION BY lang) AS lang_count
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q_a8_hist" ->
      """SELECT CAST(floor(o_totalprice/20000)*20000 AS BIGINT) AS bucket, count(*) AS n
        |FROM orders GROUP BY 1 ORDER BY bucket""".stripMargin,
    "q_a10_pivot" ->
      """SELECT o_orderpriority,
        | CAST(SUM(CASE WHEN o_orderstatus='F' THEN CAST(o_totalprice AS DECIMAL(27,2)) END) AS DOUBLE) AS f_total,
        | CAST(SUM(CASE WHEN o_orderstatus='O' THEN CAST(o_totalprice AS DECIMAL(27,2)) END) AS DOUBLE) AS o_total,
        | CAST(SUM(CASE WHEN o_orderstatus='P' THEN CAST(o_totalprice AS DECIMAL(27,2)) END) AS DOUBLE) AS p_total
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "q_a11_summary" ->
      """SELECT metric, value FROM (
        | SELECT 'n_orders' AS metric, CAST(count(*) AS DOUBLE) AS value FROM orders
        | UNION ALL SELECT 'total_value', CAST(SUM(CAST(o_totalprice AS DECIMAL(27,2))) AS DOUBLE) FROM orders
        | UNION ALL SELECT 'max_price', max(o_totalprice) FROM orders
        | UNION ALL SELECT 'min_price', min(o_totalprice) FROM orders
        |) ORDER BY metric""".stripMargin,
    "q_c_clean" ->
      """SELECT event_id,
        | CAST(json_extract_string(props, '$.k') AS BIGINT) AS k,
        | lower(regexp_replace(CAST(event_type AS VARCHAR), '\s+', '', 'g')) AS etype_norm,
        | CASE WHEN trim(CAST(event_type AS VARCHAR)) IN ('','0') THEN NULL ELSE event_type END AS etype_nn,
        | coalesce(value, 0.0) AS value_filled,
        | concat_ws('|', coalesce(CAST(event_type AS VARCHAR),'nan'), coalesce(CAST(user_id AS VARCHAR),'nan')) AS row_key
        |FROM events ORDER BY event_id""".stripMargin,
    "q_c20_dates" ->
      """SELECT o_orderkey,
        | date_trunc('month', o_orderdate) AS month_start,
        | o_orderdate + INTERVAL 1 MONTH AS next_month,
        | last_day(o_orderdate) AS month_end,
        | monthname(o_orderdate) AS month_name,
        | strptime(strftime(o_orderdate, '%m/%d/%Y'), '%m/%d/%Y') AS parsed_back
        |FROM orders WHERE o_orderkey < 100 ORDER BY o_orderkey""".stripMargin,
    "q_d2_dup_after_first" ->
      """SELECT l_orderkey, l_linenumber FROM (
        | SELECT l_orderkey, l_linenumber,
        |  row_number() OVER (PARTITION BY l_orderkey ORDER BY l_linenumber) AS rn
        | FROM lineitem) WHERE rn > 1 ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "q_d3_dup_all" ->
      """SELECT l_orderkey, l_linenumber FROM (
        | SELECT l_orderkey, l_linenumber, count(*) OVER (PARTITION BY l_orderkey) AS n
        | FROM lineitem) WHERE n > 1 ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "q_d4_dup_count" ->
      """SELECT l_orderkey, l_linenumber,
        | count(*) OVER (PARTITION BY l_orderkey) AS duplicate_count
        |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "q_d5_keepfirst" ->
      """SELECT l_orderkey, l_linenumber, l_quantity FROM (
        | SELECT l_orderkey, l_linenumber, l_quantity,
        |  row_number() OVER (PARTITION BY l_orderkey ORDER BY l_linenumber, l_quantity) AS rn
        | FROM lineitem) WHERE rn = 1 ORDER BY l_orderkey""".stripMargin,
    "q_d6_prefer" ->
      """SELECT l_orderkey, l_linenumber, l_returnflag FROM (
        | SELECT l_orderkey, l_linenumber, l_returnflag,
        |  row_number() OVER (PARTITION BY l_orderkey
        |   ORDER BY CASE WHEN l_returnflag='R' THEN 0 ELSE 1 END, l_linenumber, l_returnflag) AS rn
        | FROM lineitem) WHERE rn = 1 ORDER BY l_orderkey""".stripMargin,
    "q_d8_metric" ->
      // coalesce: Spark counts a null key as its own duplicate group
      // (pandas duplicated() semantics); bare count(DISTINCT) would not
      "SELECT count(*) - count(DISTINCT coalesce(lang, chr(1))) AS duplicate_rows FROM documents",
    "q_dedup_exact" ->
      """SELECT md5(lower(regexp_replace(trim(nfc_normalize(text)), '\s+', ' ', 'g'))) AS fp,
        | min(doc_id) AS canonical_id, count(*) AS n_copies
        |FROM documents GROUP BY 1 ORDER BY fp""".stripMargin,
    "q_j1_left" ->
      """SELECT o_orderkey, o_custkey, c_name, c_mktsegment, o_totalprice
        |FROM orders LEFT JOIN customer ON o_custkey=c_custkey
        |ORDER BY o_orderkey""".stripMargin,
    "q_j3_right" ->
      """SELECT c_custkey, c_name, o_orderkey, o_totalprice
        |FROM orders RIGHT JOIN customer ON o_custkey=c_custkey
        |ORDER BY c_custkey, o_orderkey NULLS FIRST""".stripMargin,
    "q_j4_anti" ->
      """SELECT c_custkey, c_name FROM customer c
        |WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey=c.c_custkey)
        |ORDER BY c_custkey""".stripMargin,
    "q_j5_semi" ->
      """SELECT c_custkey, c_name FROM customer c
        |WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey=c.c_custkey)
        |ORDER BY c_custkey""".stripMargin,
    "q_j6_containment" ->
      // fixed-budget needle side: same md5 selection as the Spark fixture
      """WITH sup AS (SELECT s_suppkey, s_name FROM supplier
        |  ORDER BY md5(CAST(s_suppkey AS VARCHAR) || ':j6'), s_suppkey LIMIT 1000)
        |SELECT c_custkey, s_suppkey FROM (
        | SELECT c.c_custkey, s.s_suppkey,
        |  row_number() OVER (PARTITION BY c.c_custkey ORDER BY s.s_suppkey NULLS LAST) AS rn
        | FROM customer c LEFT JOIN sup s ON contains(c.c_name, substr(s.s_name, 9, 10))
        |) WHERE rn = 1 ORDER BY c_custkey""".stripMargin,
    "q_j7_key_discovery" ->
      """SELECT * FROM (
        | SELECT 'c_custkey' AS left_col, 'o_custkey' AS right_col,
        |  (SELECT count(*) FROM (SELECT DISTINCT CAST(c_custkey AS VARCHAR) v FROM customer WHERE c_custkey IS NOT NULL) t
        |   WHERE EXISTS (SELECT 1 FROM orders o WHERE CAST(o.o_custkey AS VARCHAR)=t.v)) AS overlap
        | UNION ALL
        | SELECT 'c_custkey', 'o_orderkey',
        |  (SELECT count(*) FROM (SELECT DISTINCT CAST(c_custkey AS VARCHAR) v FROM customer WHERE c_custkey IS NOT NULL) t
        |   WHERE EXISTS (SELECT 1 FROM orders o WHERE CAST(o.o_orderkey AS VARCHAR)=t.v))
        | UNION ALL
        | SELECT 'o_orderkey', 'l_orderkey',
        |  (SELECT count(*) FROM (SELECT DISTINCT CAST(o_orderkey AS VARCHAR) v FROM orders WHERE o_orderkey IS NOT NULL) t
        |   WHERE EXISTS (SELECT 1 FROM lineitem l WHERE CAST(l.l_orderkey AS VARCHAR)=t.v))
        |) ORDER BY left_col, right_col""".stripMargin,
    "q_j8_union_common" ->
      """SELECT o_orderkey, o_totalprice FROM orders
        |UNION ALL
        |SELECT o_orderkey, o_totalprice FROM orders WHERE o_orderstatus='F'
        |ORDER BY o_orderkey, o_totalprice""".stripMargin,
    "q_j9_append" ->
      """SELECT o_orderkey, o_custkey, o_totalprice, CAST(NULL AS VARCHAR) AS o_orderpriority
        |FROM orders
        |UNION ALL
        |SELECT o_orderkey, NULL, NULL, o_orderpriority FROM orders WHERE o_orderstatus='F'
        |ORDER BY o_orderkey, o_custkey ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST""".stripMargin,
    "q_bloom_join" ->
      // plain join replayed — bloom false positives must be invisible
      """SELECT o.o_orderpriority,
        | count(*) AS n_lines,
        | CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(27,2))) AS DOUBLE) AS sum_price
        |FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        |WHERE o.o_totalprice > 150000.0
        |GROUP BY o.o_orderpriority ORDER BY o.o_orderpriority""".stripMargin,
    "q_salted_join" ->
      """SELECT l.l_orderkey, l.l_linenumber, l.l_quantity, o.o_orderpriority
        |FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        |ORDER BY l.l_orderkey, l.l_linenumber""".stripMargin,
    "q_upsert" ->
      // MERGE replay: updates override, inserts add, untouched rows
      // pass through (doubling a double is IEEE-exact cross-engine)
      """WITH upd AS (
        | SELECT c_custkey, c_name, c_nationkey, c_acctbal*2 AS c_acctbal, c_mktsegment
        | FROM customer WHERE c_custkey % 7 = 0
        | UNION ALL
        | SELECT -(c_custkey + 1) AS c_custkey, c_name, c_nationkey, c_acctbal,
        |   'NEW' AS c_mktsegment
        | FROM customer WHERE c_custkey % 11 = 0)
        |SELECT c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment FROM upd
        |UNION ALL
        |SELECT c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment FROM customer
        |WHERE c_custkey NOT IN (SELECT c_custkey FROM upd)
        |ORDER BY c_custkey""".stripMargin,
    "q_a2_salted" ->
      """SELECT l_returnflag,
        | CAST(SUM(CAST(l_quantity AS DECIMAL(27,2))) AS DOUBLE) AS sum_qty,
        | string_agg(DISTINCT l_linestatus, '; ' ORDER BY l_linestatus) AS statuses
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q_recon" ->
      """WITH oa AS (
        | SELECT o_custkey, CAST(SUM(CAST(o_totalprice AS DECIMAL(27,2))) AS DOUBLE) AS total_spend,
        |  count(*) AS n_orders
        | FROM orders GROUP BY o_custkey)
        |SELECT c.c_custkey, c.c_acctbal, oa.o_custkey, oa.total_spend, oa.n_orders,
        | CASE WHEN c.c_custkey IS NOT NULL AND oa.o_custkey IS NOT NULL THEN 'both'
        |      WHEN oa.o_custkey IS NULL THEN 'left_only' ELSE 'right_only' END AS _merge
        |FROM customer c FULL OUTER JOIN oa ON c.c_custkey=oa.o_custkey
        |ORDER BY coalesce(c.c_custkey, oa.o_custkey)""".stripMargin,
    "q_recon_summary" ->
      """WITH oa AS (
        | SELECT o_custkey, CAST(SUM(CAST(o_totalprice AS DECIMAL(27,2))) AS DOUBLE) AS total_spend,
        |  count(*) AS n_orders
        | FROM orders GROUP BY o_custkey),
        |d AS (
        | SELECT c.c_custkey, oa.o_custkey, oa.total_spend,
        |  CASE WHEN c.c_custkey IS NOT NULL AND oa.o_custkey IS NOT NULL THEN 'both'
        |       WHEN oa.o_custkey IS NULL THEN 'left_only' ELSE 'right_only' END AS _merge
        | FROM customer c FULL OUTER JOIN oa ON c.c_custkey=oa.o_custkey)
        |SELECT metric, value FROM (
        | SELECT 'matched_spend' AS metric,
        |  CAST(SUM(CASE WHEN _merge='both' THEN CAST(total_spend AS DECIMAL(27,2)) END) AS DOUBLE) AS value FROM d
        | UNION ALL SELECT 'matched_customers', CAST(count(CASE WHEN _merge='both' THEN 1 END) AS DOUBLE) FROM d
        | UNION ALL SELECT 'customer_only', CAST(count(CASE WHEN _merge='left_only' THEN 1 END) AS DOUBLE) FROM d
        | UNION ALL SELECT 'order_only_spend',
        |  coalesce(CAST(SUM(CASE WHEN _merge='right_only' THEN CAST(total_spend AS DECIMAL(27,2)) END) AS DOUBLE), 0.0) FROM d
        | UNION ALL SELECT 'total_spend_all', CAST(SUM(CAST(total_spend AS DECIMAL(27,2))) AS DOUBLE) FROM d
        |) ORDER BY metric""".stripMargin,
    "q_f_orders" ->
      """SELECT o_orderkey, o_orderdate, o_orderpriority, o_orderstatus
        |FROM orders
        |WHERE o_orderdate BETWEEN TIMESTAMP '1996-01-01' AND TIMESTAMP '1997-12-31'
        | AND o_orderpriority IN ('1-URGENT','2-HIGH')
        | AND o_orderstatus <> 'P'
        | AND regexp_matches(o_orderpriority, '^[12]-')
        |ORDER BY o_orderkey""".stripMargin,
    "q_f3_nullkeep" ->
      """SELECT event_id, value FROM events
        |WHERE (value < 50 OR value IS NULL) AND event_type IN ('click','view')
        |ORDER BY event_id""".stripMargin,
    "q_p_project" ->
      """SELECT c_custkey, c_name AS customer_name, 'crm' AS src
        |FROM customer ORDER BY c_custkey""".stripMargin,
    "q_p5_rowid" ->
      """SELECT s_suppkey, CAST(row_number() OVER (ORDER BY s_suppkey) AS BIGINT) AS row_id
        |FROM supplier ORDER BY s_suppkey""".stripMargin,
    "q_o1_sort_limit" ->
      """SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem
        |ORDER BY l_quantity DESC, l_orderkey, l_linenumber LIMIT 20""".stripMargin,
    "q_o3_top1" ->
      """SELECT o_orderkey, o_orderdate FROM orders
        |ORDER BY o_orderdate DESC, o_orderkey DESC LIMIT 1""".stripMargin,
    "q_v2_align" ->
      """SELECT c_custkey, c_name, CAST(NULL AS DOUBLE) AS loyalty_score
        |FROM customer ORDER BY c_custkey""".stripMargin,
    "q_w_running" ->
      """SELECT o_custkey, o_orderkey, o_orderdate, o_totalprice,
        | CAST(row_number() OVER w AS INTEGER) AS rk,
        | lag(o_totalprice, 1) OVER w AS prev_price,
        | CAST(SUM(CAST(o_totalprice AS DECIMAL(27,2)))
        |  OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_spend
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
        |ORDER BY o_custkey, rk""".stripMargin,
    "q_keywords" ->
      // tf·round9(ln(N/df)) replayed; identical doubles ⇒ identical
      // ordering, ties on token
      """WITH tok AS (SELECT doc_id,
        |  unnest(string_split_regex(lower(trim(text)), '\s+')) AS token
        | FROM documents),
        |nn AS (SELECT count(*) AS n FROM documents),
        |dfx AS (SELECT token, count(DISTINCT doc_id) AS df FROM tok GROUP BY token),
        |tf AS (SELECT doc_id, token, count(*) AS tf FROM tok GROUP BY 1, 2),
        |sc AS (SELECT doc_id, token,
        |  tf * round(ln(CAST(nn.n AS DOUBLE) / df), 9) AS score
        | FROM tf JOIN dfx USING (token) CROSS JOIN nn),
        |r AS (SELECT doc_id, token, score, row_number() OVER (
        |  PARTITION BY doc_id ORDER BY score DESC, token) AS rk FROM sc)
        |SELECT doc_id, CAST(rk AS INTEGER) AS rk, token,
        | round(score, 9) AS score
        |FROM r WHERE rk <= 3 ORDER BY doc_id, rk""".stripMargin,
    "q_quantile_gate" ->
      // discrete per-group median by rank, replayed with the same
      // (value, id) ascending order
      """WITH r AS (SELECT lang, doc_id, n_chars,
        |  row_number() OVER (PARTITION BY lang
        |   ORDER BY n_chars NULLS FIRST, doc_id NULLS FIRST) AS rn,
        |  count(*) OVER (PARTITION BY lang) AS n
        | FROM documents),
        |t AS (SELECT lang, n_chars AS thr FROM r
        | WHERE rn = CAST(ceil(0.5 * n) AS BIGINT))
        |SELECT d.lang, d.doc_id, d.n_chars
        |FROM documents d JOIN t ON d.lang = t.lang AND d.n_chars >= t.thr
        |ORDER BY d.lang NULLS FIRST, d.doc_id""".stripMargin,
    "q_bpe_merges" ->
      // the same 8-step BPE training loop as chained CTEs: per step,
      // pair counts over the wrapped-symbol strings, (count DESC, lhs,
      // rhs) argmax, left-to-right non-overlapping replace
      graft.operators.BpeTrain.oracleSql(8),
    "q_bpe_encode" ->
      // the training chain's final state IS every word encoded; emit
      // the top-50 by frequency as joined token strings
      graft.operators.BpeTrain.encodeOracleSql(8, 50),
    "q_bpe_docs" ->
      // production-regime tokenization: 80-rule chain (the corpus's
      // 31-word vocab ceilings at 89 learnable merges, so 80 is the
      // deepest table with argmax margin), then every doc's token
      // stream checked by count + md5
      graft.operators.BpeTrain.docsOracleSql(80),
    "q_answer_parse" ->
      // identical synthesis + the notebook's DOTALL patterns in RE2;
      // regexp-based trim on both sides so newline handling agrees
      """WITH raw AS (SELECT doc_id,
        | CASE WHEN doc_id % 7 = 0 THEN
        |  '<|end|><|start|>assistant<|channel|>analysis<|message|>'
        |   || 'step:' || chr(10) || ' ' || substr(text, 1, 80) || ' ' || chr(10)
        |   || '<|end|>' || 'truncated'
        | ELSE
        |  '<|end|><|start|>assistant<|channel|>analysis<|message|>'
        |   || 'step:' || chr(10) || ' ' || substr(text, 1, 80) || ' ' || chr(10)
        |   || '<|end|>'
        |   || '<|start|>assistant<|channel|>final<|message|>'
        |   || ' final: ' || substr(text, 1, 40) || chr(10) || '<|return|>'
        | END AS raw FROM documents)
        |SELECT doc_id,
        | CASE WHEN regexp_matches(raw,
        |   '(?s)<\|end\|><\|start\|>assistant<\|channel\|>analysis<\|message\|>(.*?)<\|end\|>')
        |  THEN regexp_replace(regexp_extract(raw,
        |   '(?s)<\|end\|><\|start\|>assistant<\|channel\|>analysis<\|message\|>(.*?)<\|end\|>', 1),
        |   '^\s+|\s+$', '', 'g')
        |  ELSE 'N/A' END AS thinking,
        | CASE WHEN regexp_matches(raw,
        |   '(?s)<\|start\|>assistant<\|channel\|>final<\|message\|>(.*?)<\|return\|>')
        |  THEN regexp_replace(regexp_extract(raw,
        |   '(?s)<\|start\|>assistant<\|channel\|>final<\|message\|>(.*?)<\|return\|>', 1),
        |   '^\s+|\s+$', '', 'g')
        |  ELSE 'N/A' END AS final_text
        |FROM raw ORDER BY doc_id""".stripMargin,
    "q_oov" ->
      // identical tf-ranked vocab cutoff; OOV counts are exact integers
      """WITH tok AS (SELECT lang,
        |  unnest(string_split_regex(lower(trim(text)), '\s+')) AS token
        | FROM documents),
        |v AS (SELECT token FROM (
        |  SELECT token, count(*) AS tf FROM tok GROUP BY token
        |  ORDER BY tf DESC, token LIMIT 1000)),
        |j AS (SELECT t.lang, v.token AS iv
        | FROM tok t LEFT JOIN v ON t.token = v.token)
        |SELECT lang, count(*) AS n_tokens,
        | count(CASE WHEN iv IS NULL THEN 1 END) AS n_oov,
        | round(CAST(count(CASE WHEN iv IS NULL THEN 1 END) AS DOUBLE)
        |   / count(*), 9) AS oov_rate
        |FROM j GROUP BY lang ORDER BY lang NULLS FIRST""".stripMargin,
    "q_entropy" ->
      // same 9dp-round-then-DECIMAL-sum ln terms; final H is one IEEE
      // expression over the exact decimal sum
      """WITH tok AS (SELECT doc_id,
        |  unnest(string_split_regex(lower(trim(text)), '\s+')) AS token
        | FROM documents),
        |c AS (SELECT doc_id, token, count(*) AS c FROM tok GROUP BY 1, 2),
        |d AS (SELECT doc_id,
        |  SUM(CAST(round(CAST(c AS DOUBLE) * ln(c), 9) AS DECIMAL(28,9))) AS s,
        |  CAST(SUM(c) AS BIGINT) AS n FROM c GROUP BY doc_id)
        |SELECT doc_id, n AS n_tokens,
        | round(ln(n) - CAST(s AS DOUBLE) / n, 9) AS entropy
        |FROM d ORDER BY doc_id""".stripMargin,
    "q_text_stats" ->
      """WITH t AS (SELECT doc_id, text,
        |  string_split_regex(lower(trim(text)), '\s+') AS toks FROM documents)
        |SELECT doc_id,
        | CAST(length(text) AS INTEGER) AS char_len,
        | CAST(len(toks) AS BIGINT) AS n_tokens,
        | CAST(length(text) AS DOUBLE) / greatest(CAST(len(toks) AS DOUBLE), 1.0) AS avg_token_len,
        | CAST(length(regexp_replace(text, '[^.,;:!?]', '', 'g')) AS DOUBLE)
        |  / greatest(CAST(length(text) AS DOUBLE), 1.0) AS punct_ratio,
        | CAST(length(regexp_replace(text, '[^0-9]', '', 'g')) AS DOUBLE)
        |  / greatest(CAST(length(text) AS DOUBLE), 1.0) AS digit_ratio,
        | CAST(len(list_filter(toks, x -> x IN ('the','and','of','to','a','in','is','it','that','was'))) AS DOUBLE)
        |  / greatest(CAST(len(toks) AS DOUBLE), 1.0) AS stopword_ratio,
        | CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS INTEGER) AS bpe_tokens
        |FROM t ORDER BY doc_id""".stripMargin,
    "q_token_shards" ->
      // the oracle may use the global window the engine deliberately
      // avoids — DuckDB is single-node, the funnel-through-one-task
      // concern does not apply to it
      """WITH t AS (SELECT doc_id,
        |  CAST(len(string_split_regex(lower(trim(text)), '\s+')) AS BIGINT) AS n_tokens
        | FROM documents),
        |c AS (SELECT doc_id, n_tokens,
        |  SUM(n_tokens) OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING) AS running_total FROM t)
        |SELECT doc_id, n_tokens, CAST(running_total AS BIGINT) AS running_total,
        | CAST((running_total - n_tokens) // 2000 AS BIGINT) AS shard_id
        |FROM c ORDER BY doc_id""".stripMargin,
    "q_seq_pack" ->
      // same window/prefix-sum caveat as q_token_shards: the oracle may
      // use the single-node window the engine avoids
      """WITH t AS (SELECT doc_id,
        |  CAST(len(string_split_regex(lower(trim(text)), '\s+')) AS BIGINT) AS n_tokens
        | FROM documents),
        |c AS (SELECT doc_id, n_tokens,
        |  CAST(SUM(n_tokens) OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING) - n_tokens AS BIGINT) AS s
        | FROM t),
        |w AS (SELECT doc_id, n_tokens, s, s + n_tokens AS e FROM c WHERE n_tokens > 0),
        |x AS (SELECT doc_id, n_tokens, s, e,
        |  unnest(generate_series(s // 512, (e - 1) // 512)) AS seq_id FROM w)
        |SELECT doc_id, n_tokens, CAST(seq_id AS BIGINT) AS seq_id,
        |  CAST(greatest(s, seq_id * 512) - seq_id * 512 AS BIGINT) AS seq_offset,
        |  CAST(greatest(s, seq_id * 512) - s AS BIGINT) AS doc_offset,
        |  CAST(least(e, (seq_id + 1) * 512) - greatest(s, seq_id * 512) AS BIGINT) AS span_len
        |FROM x ORDER BY doc_id, seq_id""".stripMargin,
    "q_pii_scan" ->
      // same injection, same three redaction passes (RE2-compatible
      // patterns, 'g' flag = Spark's replace-all), same per-source tag
      // counts; n_leaked = docs still containing '@' after redaction
      """WITH base AS (SELECT source, text ||
        |  CASE WHEN doc_id % 10 = 0
        |   THEN ' reach me at user' || CAST(doc_id AS VARCHAR) || '@example.com'
        |   WHEN doc_id % 10 = 5 THEN ' call 415-555-1234 now' ELSE '' END ||
        |  CASE WHEN doc_id % 7 = 0 THEN ' account 12345678901234 on file'
        |   ELSE '' END AS t FROM documents),
        |r AS (SELECT source, regexp_replace(regexp_replace(regexp_replace(t,
        |  '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
        |  '(\+?[0-9]{1,2}[-. ])?\(?[0-9]{3}\)?[-. ]?[0-9]{3}[-. ][0-9]{4}', '<PHONE>', 'g'),
        |  '[0-9]{9,16}', '<NUM>', 'g') AS red FROM base)
        |SELECT source, count(*) AS n_docs,
        | CAST(sum(CASE WHEN red LIKE '%<EMAIL>%' THEN 1 ELSE 0 END) AS BIGINT) AS n_email,
        | CAST(sum(CASE WHEN red LIKE '%<PHONE>%' THEN 1 ELSE 0 END) AS BIGINT) AS n_phone,
        | CAST(sum(CASE WHEN red LIKE '%<NUM>%' THEN 1 ELSE 0 END) AS BIGINT) AS n_num,
        | CAST(sum(CASE WHEN red LIKE '%@%' THEN 1 ELSE 0 END) AS BIGINT) AS n_leaked
        |FROM r GROUP BY source ORDER BY source""".stripMargin,
    "q_corpus_shuffle" ->
      // mirrors TextQuality.shuffleShards bit for bit: md5(':'||id) key,
      // first 56 digest bits pick the shard, per-shard row_number over
      // (key, id). The oracle's window is fine single-node; the engine's
      // is partitioned by shard on purpose
      """WITH t AS (SELECT doc_id,
        |  md5(':' || CAST(doc_id AS VARCHAR)) AS k FROM documents),
        |s AS (SELECT doc_id, k,
        |  ('0x' || substr(k, 1, 14))::BIGINT % 32 AS shard FROM t)
        |SELECT doc_id, shard,
        | CAST(row_number() OVER (PARTITION BY shard ORDER BY k, doc_id) AS BIGINT) AS pos
        |FROM s ORDER BY shard, pos""".stripMargin,
    "q_prep_pipeline" ->
      // same md5 literals end to end: fingerprint dedup (q_curate), split
      // thresholds (hashSplit 0.9/0.95), shard = first 56 digest bits of
      // md5('e1:'||id) mod 8 (q_corpus_shuffle idiom)
      s"""WITH t AS (SELECT doc_id,
         |  md5(lower(regexp_replace(trim(nfc_normalize(text)), '\\s+', ' ', 'g'))) AS fp,
         |  CAST(len(string_split_regex(lower(trim(text)), '\\s+')) AS BIGINT) AS n_tokens
         | FROM documents),
         |c AS (SELECT doc_id, n_tokens FROM (
         |  SELECT *, row_number() OVER (PARTITION BY fp ORDER BY doc_id) AS rn FROM t)
         | WHERE rn = 1 AND n_tokens >= 30),
         |sp AS (SELECT doc_id, n_tokens,
         |  CASE WHEN md5(CAST(doc_id AS VARCHAR)) < '${TextFunctions.md5SampleThreshold(0.9)}' THEN 'train'
         |       WHEN md5(CAST(doc_id AS VARCHAR)) < '${TextFunctions.md5SampleThreshold(0.95)}' THEN 'val'
         |       ELSE 'test' END AS split,
         |  ('0x' || substr(md5('e1:' || CAST(doc_id AS VARCHAR)), 1, 14))::BIGINT % 8 AS shard
         | FROM c)
         |SELECT split, shard, CAST(count(*) AS BIGINT) AS n_docs,
         | CAST(sum(n_tokens) AS BIGINT) AS n_tokens
         |FROM sp GROUP BY split, shard
         |ORDER BY split NULLS FIRST, shard NULLS FIRST""".stripMargin,
    "q_mix_plan" ->
      // binary-exact weights (0.5, 0.125) make floor/ceil/least
      // arithmetic bit-identical across engines; token counting is the
      // q_text_stats split
      """WITH t AS (SELECT lang AS stratum,
        |  CAST(len(string_split_regex(lower(trim(text)), '\s+')) AS BIGINT) AS nt FROM documents),
        |g AS (SELECT stratum, count(*) AS n_docs,
        |  CAST(sum(nt) AS BIGINT) AS n_tokens FROM t GROUP BY 1),
        |p AS (SELECT stratum, n_docs, n_tokens,
        |  CAST(CASE stratum WHEN 'en' THEN 0.5 WHEN 'de' THEN 0.125
        |   WHEN 'es' THEN 0.125 WHEN 'fr' THEN 0.125 WHEN 'zh' THEN 0.125
        |   ELSE 0.0 END AS DOUBLE) AS weight FROM g),
        |q AS (SELECT stratum, n_docs, n_tokens, weight,
        |  CAST(floor(weight * CAST(50000 AS DOUBLE)) AS BIGINT) AS target_tokens FROM p)
        |SELECT stratum, n_docs, n_tokens, weight, target_tokens,
        | CASE WHEN n_tokens > 0
        |  THEN least(CAST(1.0 AS DOUBLE), CAST(target_tokens AS DOUBLE)/n_tokens)
        |  ELSE CAST(0.0 AS DOUBLE) END AS sample_rate,
        | CASE WHEN target_tokens = 0 OR n_tokens = 0 THEN CAST(0 AS BIGINT)
        |  ELSE CAST(ceil(CAST(target_tokens AS DOUBLE)/n_tokens) AS BIGINT) END AS epochs
        |FROM q ORDER BY stratum""".stripMargin,
    "q_repetition" ->
      // max_token_run needs gaps-and-islands + two windows in SQL; the
      // Spark side is a single map-side fold expression. Top-gram ties
      // break on (cnt DESC, gram DESC) in both engines.
      """WITH t AS (SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS ws FROM documents),
        |tok AS (SELECT doc_id, unnest(ws) AS tok, unnest(range(1, len(ws)+1)) AS ord FROM t),
        |runs AS (SELECT doc_id, tok, ord - row_number() OVER (PARTITION BY doc_id, tok ORDER BY ord) AS grp FROM tok),
        |maxrun AS (SELECT doc_id, max(cnt) AS max_token_run FROM (
        |  SELECT doc_id, count(*) AS cnt FROM runs GROUP BY doc_id, tok, grp) GROUP BY doc_id),
        |grams AS (SELECT doc_id, unnest([ws[i]||'_'||ws[i+1] for i in range(1, len(ws))]) AS gram FROM t),
        |gcnt AS (SELECT doc_id, gram, count(*) AS cnt FROM grams GROUP BY 1, 2),
        |top AS (SELECT doc_id, gram, cnt,
        |  CAST(cnt AS DOUBLE)/sum(cnt) OVER (PARTITION BY doc_id) AS frac,
        |  row_number() OVER (PARTITION BY doc_id ORDER BY cnt DESC, gram DESC) AS rn FROM gcnt)
        |SELECT t.doc_id,
        | CAST(len(ws) AS BIGINT) AS n_tokens,
        | CAST(len(list_distinct(ws)) AS BIGINT) AS n_distinct_tokens,
        | CAST(len(ws) - len(list_distinct(ws)) AS DOUBLE)/greatest(len(ws), 1) AS dup_token_frac,
        | m.max_token_run,
        | tp.gram AS top_ngram,
        | COALESCE(tp.cnt, 0) AS top_ngram_count,
        | COALESCE(tp.frac, 0.0) AS top_ngram_frac
        |FROM t JOIN maxrun m USING (doc_id)
        |LEFT JOIN (SELECT * FROM top WHERE rn = 1) tp USING (doc_id)
        |ORDER BY doc_id""".stripMargin,
    "q_image_meta" ->
      """SELECT doc_id, 'png' AS format,
        | CAST(64 + doc_id % 512 AS INTEGER) AS width,
        | CAST(48 + doc_id % 256 AS INTEGER) AS height
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q_multimodal_meta" ->
      // every 10th doc carries non-image bytes → invalid with null dims;
      // the rest are real 8×8 synthesized PNGs
      """SELECT doc_id,
        | doc_id % 10 <> 0 AS valid,
        | CASE WHEN doc_id % 10 <> 0 THEN 'png' END AS format,
        | CASE WHEN doc_id % 10 <> 0 THEN CAST(8 AS INTEGER) END AS width,
        | CASE WHEN doc_id % 10 <> 0 THEN CAST(8 AS INTEGER) END AS height
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q_frame_sample" ->
      // frame colors recomputed arithmetically: doc d frame f is a solid
      // ((5d+49f)%256, (11d+23f)%256, (3d+77f)%256) 8×8 GIF frame, so the
      // decoded mean equals the color exactly
      """WITH f AS (SELECT doc_id, CAST(g.f AS INTEGER) AS frame_idx
        |  FROM documents, generate_series(0, 3) g(f) WHERE g.f <= doc_id % 4)
        |SELECT doc_id, frame_idx,
        | CAST((doc_id*5 + frame_idx*49) % 256 AS DOUBLE) AS mean_r,
        | CAST((doc_id*11 + frame_idx*23) % 256 AS DOUBLE) AS mean_g,
        | CAST((doc_id*3 + frame_idx*77) % 256 AS DOUBLE) AS mean_b
        |FROM f ORDER BY doc_id, frame_idx""".stripMargin,
    "q_image_frames" ->
      // the decoded-pixel oracle: color depends only on x (8 identical
      // rows per column), so sums over the 8 x-values stand in for the
      // full 64-pixel grid — mean = sum_x/8, hist = 8·count_x. Integer
      // luma (299r+587g+114b)//1000 keeps every step exact cross-engine.
      """WITH px AS (SELECT doc_id, CAST(g.x AS INTEGER) AS x
        |  FROM documents, generate_series(0, 7) g(x)),
        |rgb AS (SELECT doc_id, x,
        |  CASE WHEN doc_id % 2 = 0 THEN CAST(doc_id % 256 AS INTEGER)
        |       ELSE CAST(x*255//7 AS INTEGER) END AS r,
        |  CASE WHEN doc_id % 2 = 0 THEN CAST((doc_id*7 + 3) % 256 AS INTEGER)
        |       ELSE CAST(doc_id % 256 AS INTEGER) END AS g,
        |  CASE WHEN doc_id % 2 = 0 THEN CAST((doc_id*13 + 5) % 256 AS INTEGER)
        |       ELSE CAST(255 - x*255//7 AS INTEGER) END AS b
        | FROM px),
        |lum AS (SELECT doc_id, r, g, b,
        |  (299*r + 587*g + 114*b)//1000 AS luma FROM rgb)
        |SELECT doc_id,
        | CAST(0 AS INTEGER) AS frame_idx,
        | CAST(8 AS INTEGER) AS width, CAST(8 AS INTEGER) AS height,
        | CAST(sum(r) AS DOUBLE)/8 AS mean_r,
        | CAST(sum(g) AS DOUBLE)/8 AS mean_g,
        | CAST(sum(b) AS DOUBLE)/8 AS mean_b,
        | CAST(8*sum(CASE WHEN luma//32 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS h0,
        | CAST(8*sum(CASE WHEN luma//32 = 1 THEN 1 ELSE 0 END) AS BIGINT) AS h1,
        | CAST(8*sum(CASE WHEN luma//32 = 2 THEN 1 ELSE 0 END) AS BIGINT) AS h2,
        | CAST(8*sum(CASE WHEN luma//32 = 3 THEN 1 ELSE 0 END) AS BIGINT) AS h3,
        | CAST(8*sum(CASE WHEN luma//32 = 4 THEN 1 ELSE 0 END) AS BIGINT) AS h4,
        | CAST(8*sum(CASE WHEN luma//32 = 5 THEN 1 ELSE 0 END) AS BIGINT) AS h5,
        | CAST(8*sum(CASE WHEN luma//32 = 6 THEN 1 ELSE 0 END) AS BIGINT) AS h6,
        | CAST(8*sum(CASE WHEN luma//32 = 7 THEN 1 ELSE 0 END) AS BIGINT) AS h7
        |FROM lum GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "q_image_resize" ->
      // nearest-neighbor 8×8→4×4 samples source x' = 2x (y collapses —
      // color depends only on x), so resized means are the 4-point
      // averages of the original column colors
      """WITH px AS (SELECT doc_id, CAST(g.x AS INTEGER) AS x
        |  FROM documents, generate_series(0, 3) g(x)),
        |rgb AS (SELECT doc_id,
        |  CASE WHEN doc_id % 2 = 0 THEN CAST(doc_id % 256 AS INTEGER)
        |       ELSE CAST((2*x)*255//7 AS INTEGER) END AS r,
        |  CASE WHEN doc_id % 2 = 0 THEN CAST((doc_id*7 + 3) % 256 AS INTEGER)
        |       ELSE CAST(doc_id % 256 AS INTEGER) END AS g,
        |  CASE WHEN doc_id % 2 = 0 THEN CAST((doc_id*13 + 5) % 256 AS INTEGER)
        |       ELSE CAST(255 - (2*x)*255//7 AS INTEGER) END AS b
        | FROM px)
        |SELECT doc_id,
        | CAST(4 AS INTEGER) AS width, CAST(4 AS INTEGER) AS height,
        | CAST(sum(r) AS DOUBLE)/4 AS mean_r,
        | CAST(sum(g) AS DOUBLE)/4 AS mean_g,
        | CAST(sum(b) AS DOUBLE)/4 AS mean_b
        |FROM rgb GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "q_wav_meta" ->
      // expected header values recomputed arithmetically from the
      // synthesis parameters: ms = 40 + (doc_id % 60)*2 at 16 kHz mono
      // PCM16 → n_samples = 16·ms, duration = ms
      """SELECT doc_id,
        | CAST(16000 AS INTEGER) AS sample_rate,
        | CAST(1 AS INTEGER) AS channels,
        | CAST(16 AS INTEGER) AS bits_per_sample,
        | CAST(16*(40 + (doc_id % 60)*2) AS BIGINT) AS n_samples,
        | CAST(40 + (doc_id % 60)*2 AS BIGINT) AS duration_ms
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q_wav_resample" ->
      // decimation headers closed-form: rate halves, sample count
      // halves (16·ms is even), duration in ms is unchanged
      """SELECT doc_id,
        | CAST(8000 AS INTEGER) AS sample_rate,
        | CAST(8*(40 + (doc_id % 60)*2) AS BIGINT) AS n_samples,
        | CAST(40 + (doc_id % 60)*2 AS BIGINT) AS duration_ms
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q_lang_id" ->
      // fully deterministic cross-engine: scores are exact integer
      // ratios (no transcendentals), argmax ties break on the lang
      // string via struct ordering in BOTH engines
      """WITH t AS (SELECT doc_id, lang, string_split_regex(lower(trim(text)), '\s+') AS toks FROM documents),
        |s AS (SELECT doc_id, lang, list_max([
        |  {'score': CAST(len(list_filter(toks, x -> x IN ('der','die','und','das','ist','von','mit','den','nicht','ein'))) AS DOUBLE)/greatest(len(toks), 1), 'lang': 'de'},
        |  {'score': CAST(len(list_filter(toks, x -> x IN ('the','and','of','to','a','in','is','it','that','was'))) AS DOUBLE)/greatest(len(toks), 1), 'lang': 'en'},
        |  {'score': CAST(len(list_filter(toks, x -> x IN ('el','la','de','que','y','en','un','los','se','no'))) AS DOUBLE)/greatest(len(toks), 1), 'lang': 'es'},
        |  {'score': CAST(len(list_filter(toks, x -> x IN ('le','la','et','les','des','en','un','du','une','est'))) AS DOUBLE)/greatest(len(toks), 1), 'lang': 'fr'},
        |  {'score': CAST(len(list_filter(toks, x -> x IN ('的','了','是','我','不','在','有','他','这','中'))) AS DOUBLE)/greatest(len(toks), 1), 'lang': 'zh'}
        | ]) AS best FROM t)
        |SELECT doc_id, lang,
        | CASE WHEN best.score >= 0.05 THEN best.lang ELSE 'und' END AS lang_pred
        |FROM s ORDER BY doc_id""".stripMargin,
    "q_fingerprint" ->
      """SELECT doc_id, md5(lower(regexp_replace(trim(nfc_normalize(text)), '\s+', ' ', 'g'))) AS fp
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q_contamination" ->
      """WITH w AS (SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS ws FROM documents),
        |g AS (SELECT doc_id, unnest(list_distinct(
        |  [list_aggregate(ws[i:i+3], 'string_agg', '_') for i in range(1, len(ws)-2)])) AS gram FROM w),
        |ev AS (SELECT DISTINCT gram FROM g WHERE doc_id % 50 = 0),
        |tot AS (SELECT doc_id, count(*) AS n_grams FROM g WHERE doc_id % 50 <> 0 GROUP BY 1),
        |hits AS (SELECT g.doc_id, count(*) AS n_hit FROM g JOIN ev USING (gram)
        | WHERE g.doc_id % 50 <> 0 GROUP BY 1)
        |SELECT h.doc_id, h.n_hit, t.n_grams,
        | CAST(h.n_hit AS DOUBLE)/t.n_grams AS overlap_frac
        |FROM hits h JOIN tot t USING (doc_id) ORDER BY doc_id""".stripMargin,
    "q_dedup_clusters" ->
      // connected components of the jaccard≥0.8 pair graph via a
      // recursive reachability CTE: comp(node) = min reachable node id —
      // identical labels to the Spark large-star/small-star result
      """WITH RECURSIVE w AS (SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS ws FROM documents),
        |sh AS (SELECT doc_id, unnest(list_distinct(
        |  [ws[i]||'_'||ws[i+1]||'_'||ws[i+2] for i in range(1, len(ws)-1)])) AS s FROM w),
        |sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id),
        |cand AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS common
        | FROM sh a JOIN sh b ON a.s=b.s AND a.doc_id < b.doc_id GROUP BY 1, 2),
        |pairs AS (SELECT doc_a, doc_b FROM cand
        | JOIN sizes sa ON doc_a=sa.doc_id JOIN sizes sb ON doc_b=sb.doc_id
        | WHERE CAST(common AS DOUBLE)/(sa.sz + sb.sz - common) >= 0.8),
        |edges AS (SELECT doc_a AS u, doc_b AS v FROM pairs
        | UNION SELECT doc_b, doc_a FROM pairs),
        |reach(node, comp) AS (
        | SELECT u, u FROM edges
        | UNION
        | SELECT e.u, r.comp FROM edges e JOIN reach r ON e.v = r.node),
        |comps AS (SELECT node, min(comp) AS comp FROM reach GROUP BY node)
        |SELECT d.doc_id, COALESCE(c.comp, d.doc_id) AS cluster_id,
        | COALESCE(c.comp, d.doc_id) = d.doc_id AS is_canonical
        |FROM documents d LEFT JOIN comps c ON d.doc_id = c.node
        |ORDER BY doc_id""".stripMargin,
    "q_dedup_clusters_sampled" ->
      // the q_dedup_clusters CTEs over the md5 quarter-sample — the
      // sf10 gate form (the full exact pair stage is the known JIT-band
      // swinger at 100×; full-exact stays on the oracle gates)
      s"""WITH RECURSIVE docs_s AS (SELECT * FROM ${panelDocsSrc(1280, "dcp")}),
        |w AS (SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS ws FROM docs_s),
        |sh AS (SELECT doc_id, unnest(list_distinct(
        |  [ws[i]||'_'||ws[i+1]||'_'||ws[i+2] for i in range(1, len(ws)-1)])) AS s FROM w),
        |sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id),
        |cand AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS common
        | FROM sh a JOIN sh b ON a.s=b.s AND a.doc_id < b.doc_id GROUP BY 1, 2),
        |pairs AS (SELECT doc_a, doc_b FROM cand
        | JOIN sizes sa ON doc_a=sa.doc_id JOIN sizes sb ON doc_b=sb.doc_id
        | WHERE CAST(common AS DOUBLE)/(sa.sz + sb.sz - common) >= 0.8),
        |edges AS (SELECT doc_a AS u, doc_b AS v FROM pairs
        | UNION SELECT doc_b, doc_a FROM pairs),
        |reach(node, comp) AS (
        | SELECT u, u FROM edges
        | UNION
        | SELECT e.u, r.comp FROM edges e JOIN reach r ON e.v = r.node),
        |comps AS (SELECT node, min(comp) AS comp FROM reach GROUP BY node)
        |SELECT d.doc_id, COALESCE(c.comp, d.doc_id) AS cluster_id,
        | COALESCE(c.comp, d.doc_id) = d.doc_id AS is_canonical
        |FROM docs_s d LEFT JOIN comps c ON d.doc_id = c.node
        |ORDER BY doc_id""".stripMargin,
    "q_cluster_rollup" ->
      // reachability CTE + per-cluster aggregate joined to the min-id
      // canonical row
      """WITH RECURSIVE w AS (SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS ws FROM documents),
        |sh AS (SELECT doc_id, unnest(list_distinct(
        |  [ws[i]||'_'||ws[i+1]||'_'||ws[i+2] for i in range(1, len(ws)-1)])) AS s FROM w),
        |sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id),
        |cand AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS common
        | FROM sh a JOIN sh b ON a.s=b.s AND a.doc_id < b.doc_id GROUP BY 1, 2),
        |pairs AS (SELECT doc_a, doc_b FROM cand
        | JOIN sizes sa ON doc_a=sa.doc_id JOIN sizes sb ON doc_b=sb.doc_id
        | WHERE CAST(common AS DOUBLE)/(sa.sz + sb.sz - common) >= 0.8),
        |edges AS (SELECT doc_a AS u, doc_b AS v FROM pairs
        | UNION SELECT doc_b, doc_a FROM pairs),
        |reach(node, comp) AS (
        | SELECT u, u FROM edges
        | UNION
        | SELECT e.u, r.comp FROM edges e JOIN reach r ON e.v = r.node),
        |comps AS (SELECT node, min(comp) AS comp FROM reach GROUP BY node),
        |a AS (SELECT d.doc_id, COALESCE(c.comp, d.doc_id) AS cluster_id,
        |  d.source, d.n_chars
        | FROM documents d LEFT JOIN comps c ON d.doc_id = c.node),
        |r AS (SELECT cluster_id, count(*) AS cluster_size,
        |  CAST(SUM(CAST(n_chars AS DECIMAL(27,0))) AS DOUBLE) AS total_chars,
        |  count(DISTINCT source) AS n_sources FROM a GROUP BY cluster_id)
        |SELECT a.doc_id, a.cluster_id, r.cluster_size, r.total_chars, r.n_sources
        |FROM a JOIN r USING (cluster_id) WHERE a.doc_id = a.cluster_id
        |ORDER BY a.doc_id""".stripMargin,
    "q_cluster_keep_best" ->
      // same reachability CTE; survivor = argmax(n_chars, tie min id)
      """WITH RECURSIVE w AS (SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS ws FROM documents),
        |sh AS (SELECT doc_id, unnest(list_distinct(
        |  [ws[i]||'_'||ws[i+1]||'_'||ws[i+2] for i in range(1, len(ws)-1)])) AS s FROM w),
        |sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id),
        |cand AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS common
        | FROM sh a JOIN sh b ON a.s=b.s AND a.doc_id < b.doc_id GROUP BY 1, 2),
        |pairs AS (SELECT doc_a, doc_b FROM cand
        | JOIN sizes sa ON doc_a=sa.doc_id JOIN sizes sb ON doc_b=sb.doc_id
        | WHERE CAST(common AS DOUBLE)/(sa.sz + sb.sz - common) >= 0.8),
        |edges AS (SELECT doc_a AS u, doc_b AS v FROM pairs
        | UNION SELECT doc_b, doc_a FROM pairs),
        |reach(node, comp) AS (
        | SELECT u, u FROM edges
        | UNION
        | SELECT e.u, r.comp FROM edges e JOIN reach r ON e.v = r.node),
        |comps AS (SELECT node, min(comp) AS comp FROM reach GROUP BY node),
        |a AS (SELECT d.doc_id, COALESCE(c.comp, d.doc_id) AS cluster_id, d.n_chars
        | FROM documents d LEFT JOIN comps c ON d.doc_id = c.node),
        |best AS (SELECT cluster_id, doc_id AS keep FROM (
        | SELECT cluster_id, doc_id,
        |  row_number() OVER (PARTITION BY cluster_id
        |   ORDER BY n_chars DESC, doc_id) AS rn FROM a) WHERE rn = 1)
        |SELECT a.doc_id, a.cluster_id, a.doc_id = b.keep AS is_canonical
        |FROM a JOIN best b USING (cluster_id)
        |ORDER BY doc_id""".stripMargin,
    "q_inc_clusters" ->
      // the FULL-recompute CTE, verbatim from q_dedup_clusters: the
      // incremental star-replay path must land on identical labels
      """WITH RECURSIVE w AS (SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS ws FROM documents),
        |sh AS (SELECT doc_id, unnest(list_distinct(
        |  [ws[i]||'_'||ws[i+1]||'_'||ws[i+2] for i in range(1, len(ws)-1)])) AS s FROM w),
        |sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id),
        |cand AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS common
        | FROM sh a JOIN sh b ON a.s=b.s AND a.doc_id < b.doc_id GROUP BY 1, 2),
        |pairs AS (SELECT doc_a, doc_b FROM cand
        | JOIN sizes sa ON doc_a=sa.doc_id JOIN sizes sb ON doc_b=sb.doc_id
        | WHERE CAST(common AS DOUBLE)/(sa.sz + sb.sz - common) >= 0.8),
        |edges AS (SELECT doc_a AS u, doc_b AS v FROM pairs
        | UNION SELECT doc_b, doc_a FROM pairs),
        |reach(node, comp) AS (
        | SELECT u, u FROM edges
        | UNION
        | SELECT e.u, r.comp FROM edges e JOIN reach r ON e.v = r.node),
        |comps AS (SELECT node, min(comp) AS comp FROM reach GROUP BY node)
        |SELECT d.doc_id, COALESCE(c.comp, d.doc_id) AS cluster_id,
        | COALESCE(c.comp, d.doc_id) = d.doc_id AS is_canonical
        |FROM documents d LEFT JOIN comps c ON d.doc_id = c.node
        |ORDER BY doc_id""".stripMargin,
    "q_inc_curate" -> incCurateFullRecompute,
    // the STORE-backed incremental path (persisted shingle segments +
    // tombstones instead of re-shingling the unchanged side) against
    // the SAME full-recompute oracle — a green row proves the store
    // twin lands row-identical too
    "q_inc_curate_store" -> incCurateFullRecompute,
    "q_subset_dup" ->
      """WITH w AS (SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS ws FROM documents),
        |sh AS (SELECT doc_id, unnest(list_distinct(
        |  [ws[i]||'_'||ws[i+1]||'_'||ws[i+2] for i in range(1, len(ws)-1)])) AS s FROM w),
        |sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id),
        |cand AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS common
        | FROM sh a JOIN sh b ON a.s=b.s AND a.doc_id < b.doc_id GROUP BY 1, 2)
        |SELECT doc_a, doc_b,
        | CAST(common AS DOUBLE)/least(sa.sz, sb.sz) AS containment
        |FROM cand JOIN sizes sa ON doc_a=sa.doc_id JOIN sizes sb ON doc_b=sb.doc_id
        |WHERE CAST(common AS DOUBLE)/least(sa.sz, sb.sz) >= 0.8
        |ORDER BY doc_a, doc_b""".stripMargin,
    "q_cluster_stats" ->
      """WITH RECURSIVE w AS (SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS ws FROM documents),
        |sh AS (SELECT doc_id, unnest(list_distinct(
        |  [ws[i]||'_'||ws[i+1]||'_'||ws[i+2] for i in range(1, len(ws)-1)])) AS s FROM w),
        |sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id),
        |cand AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS common
        | FROM sh a JOIN sh b ON a.s=b.s AND a.doc_id < b.doc_id GROUP BY 1, 2),
        |prs AS (SELECT doc_a, doc_b FROM cand
        | JOIN sizes sa ON doc_a=sa.doc_id JOIN sizes sb ON doc_b=sb.doc_id
        | WHERE CAST(common AS DOUBLE)/(sa.sz + sb.sz - common) >= 0.8),
        |edges AS (SELECT doc_a AS u, doc_b AS v FROM prs
        | UNION SELECT doc_b, doc_a FROM prs),
        |reach(node, comp) AS (
        | SELECT u, u FROM edges
        | UNION
        | SELECT e.u, r.comp FROM edges e JOIN reach r ON e.v = r.node),
        |comps AS (SELECT node, min(comp) AS comp FROM reach GROUP BY node),
        |assign AS (SELECT d.doc_id, COALESCE(c.comp, d.doc_id) AS cluster_id
        | FROM documents d LEFT JOIN comps c ON d.doc_id = c.node),
        |sz2 AS (SELECT cluster_id, count(*) AS n_members FROM assign GROUP BY 1)
        |SELECT n_members, count(*) AS n_clusters FROM sz2 GROUP BY 1
        |ORDER BY n_members""".stripMargin,
    "q_jaccard_pairs" ->
      """WITH w AS (SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS ws FROM documents),
        |sh AS (SELECT doc_id, unnest(list_distinct(
        |  [ws[i]||'_'||ws[i+1]||'_'||ws[i+2] for i in range(1, len(ws)-1)])) AS s FROM w),
        |sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id),
        |pairs AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS common
        | FROM sh a JOIN sh b ON a.s=b.s AND a.doc_id < b.doc_id GROUP BY 1, 2)
        |SELECT doc_a, doc_b,
        | CAST(common AS DOUBLE)/(sa.sz + sb.sz - common) AS jaccard
        |FROM pairs JOIN sizes sa ON doc_a=sa.doc_id JOIN sizes sb ON doc_b=sb.doc_id
        |WHERE CAST(common AS DOUBLE)/(sa.sz + sb.sz - common) >= 0.8
        |ORDER BY doc_a, doc_b""".stripMargin,
    "q_minhash_pairs_md5" ->
      // mirrors minhashLshPairsPortable bit for bit: same "_"-joined
      // shingles, same md5-seeded double-hashing family h_i = a + i*b
      // over the digest's two 48-bit halves, same md5-of-band-slice
      // buckets, est_jaccard = agree/16 (exact power-of-two division —
      // bit-identical doubles)
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
         |scored AS (SELECT doc_a, doc_b,
         |  CAST(len(list_filter(list_zip(sig_a, sig_b), x -> x[1] = x[2])) AS DOUBLE) / 16 AS est_jaccard
         | FROM cand)
         |SELECT doc_a, doc_b, est_jaccard FROM scored
         |WHERE est_jaccard >= 0.5
         |ORDER BY doc_a, doc_b""".stripMargin,
    "q_lsh_recall" ->
      // the exact-Jaccard CTEs of q_jaccard_pairs + the portable-LSH
      // CTEs of q_minhash_pairs_md5 (both at threshold 0.8), full-outer
      // joined into confusion counts; recall/precision are
      // bigint-over-bigint double divisions (bit-identical IEEE)
      s"""WITH w AS (SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS ws FROM documents),
         |sh AS (SELECT doc_id, unnest(list_distinct(
         |  [ws[i]||'_'||ws[i+1]||'_'||ws[i+2] for i in range(1, len(ws)-1)])) AS s FROM w),
         |sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id),
         |cpairs AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS common
         | FROM sh a JOIN sh b ON a.s=b.s AND a.doc_id < b.doc_id GROUP BY 1, 2),
         |exact AS (SELECT doc_a, doc_b
         | FROM cpairs JOIN sizes sa ON doc_a=sa.doc_id JOIN sizes sb ON doc_b=sb.doc_id
         | WHERE CAST(common AS DOUBLE)/(sa.sz + sb.sz - common) >= 0.8),
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
         | WHERE CAST(len(list_filter(list_zip(sig_a, sig_b), x -> x[1] = x[2])) AS DOUBLE) / 16 >= 0.8),
         |j AS (SELECT e.doc_a AS ea, l.doc_a AS la FROM exact e
         | FULL OUTER JOIN lshp l ON e.doc_a = l.doc_a AND e.doc_b = l.doc_b),
         |c AS (SELECT count(ea) AS n_exact, count(la) AS n_lsh,
         |  count(CASE WHEN ea IS NOT NULL AND la IS NOT NULL THEN 1 END) AS n_hit FROM j)
         |SELECT n_exact, n_lsh, n_hit,
         | CASE WHEN n_exact > 0 THEN CAST(n_hit AS DOUBLE)/n_exact END AS recall,
         | CASE WHEN n_lsh > 0 THEN CAST(n_hit AS DOUBLE)/n_lsh END AS "precision"
         |FROM c""".stripMargin,
    "q_block_dedup" ->
      // 16-token non-overlapping blocks (the q_chunk grid at stride =
      // size), keep-first = row_number over md5(block) ordered by
      // (doc_id, block_idx), reassembly = ordered string_agg of
      // survivors; md5 hashes identically cross-engine
      """WITH t AS (SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS toks
        |  FROM documents WHERE len(trim(text)) > 0),
        |s AS (SELECT doc_id, toks, len(toks) AS n FROM t),
        |b AS (SELECT doc_id, CAST(st/16 AS INTEGER) AS block_idx,
        |  array_to_string(list_slice(toks, st+1, least(st+16, n)), ' ') AS block_text,
        |  least(16, n - st) AS n_tok
        | FROM s, generate_series(0, 511, 16) g(st)
        | WHERE g.st <= greatest(0, CAST(ceil(CAST(n - 16 AS DOUBLE)/16) AS INTEGER)*16)),
        |k AS (SELECT *, row_number() OVER (PARTITION BY md5(block_text)
        |   ORDER BY doc_id, block_idx) AS rn FROM b)
        |SELECT doc_id,
        | count(*) AS n_blocks,
        | count(*) FILTER (WHERE rn = 1) AS n_blocks_kept,
        | CAST(coalesce(sum(n_tok) FILTER (WHERE rn > 1), 0) AS BIGINT) AS n_tokens_removed,
        | coalesce(string_agg(block_text, ' ' ORDER BY block_idx) FILTER (WHERE rn = 1), '') AS text_deduped
        |FROM k GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "q_boilerplate" ->
      // 8-token blocks; hot = blocks in ≥3 distinct docs; every hot
      // occurrence stripped (not keep-first), same reassembly shape
      """WITH t AS (SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS toks
        |  FROM documents WHERE len(trim(text)) > 0),
        |s AS (SELECT doc_id, toks, len(toks) AS n FROM t),
        |b AS (SELECT doc_id, CAST(st/8 AS INTEGER) AS block_idx,
        |  array_to_string(list_slice(toks, st+1, least(st+8, n)), ' ') AS block_text,
        |  least(8, n - st) AS n_tok
        | FROM s, generate_series(0, 511, 8) g(st)
        | WHERE g.st <= greatest(0, CAST(ceil(CAST(n - 8 AS DOUBLE)/8) AS INTEGER)*8)),
        |hot AS (SELECT md5(block_text) AS fp FROM b
        | GROUP BY 1 HAVING count(DISTINCT doc_id) >= 3),
        |k AS (SELECT b.*, h.fp IS NOT NULL AS is_hot
        | FROM b LEFT JOIN hot h ON md5(b.block_text) = h.fp)
        |SELECT doc_id,
        | count(*) AS n_blocks,
        | count(*) FILTER (WHERE NOT is_hot) AS n_blocks_kept,
        | CAST(coalesce(sum(n_tok) FILTER (WHERE is_hot), 0) AS BIGINT) AS n_tokens_removed,
        | coalesce(string_agg(block_text, ' ' ORDER BY block_idx) FILTER (WHERE NOT is_hot), '') AS text_cleaned
        |FROM k GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "q_cross_dedup_md5" ->
      // same sig/band CTE shape as q_minhash_pairs_md5, applied to the
      // asymmetric (drop × corpus) screen; est_jaccard = agree/16 exact
      s"""WITH docs2 AS (
         |  SELECT doc_id, text, 'corpus' AS side FROM documents
         |  UNION ALL
         |  SELECT doc_id + 500000 AS doc_id, text, 'new' AS side
         |  FROM documents WHERE doc_id % 7 = 0),
         |w AS (SELECT doc_id, side, string_split_regex(lower(trim(text)), '\\s+') AS ws FROM docs2),
         |sh AS (SELECT doc_id, side, unnest(list_distinct(
         |  [ws[i]||'_'||ws[i+1]||'_'||ws[i+2] for i in range(1, len(ws)-1)])) AS s FROM w),
         |ab AS (SELECT doc_id, side,
         |  ('0x' || substr(md5(s), 1, 12))::BIGINT AS a,
         |  ('0x' || substr(md5(s), 13, 12))::BIGINT AS b FROM sh),
         |sig AS (SELECT doc_id, side,
         |  [${(0 until 16).map(i => s"min(a + $i*b)").mkString(", ")}] AS sig
         | FROM ab GROUP BY doc_id, side),
         |bd AS (SELECT doc_id, side, sig, band,
         |  md5(array_to_string(list_slice(sig, band*4+1, band*4+4), '|')) AS bucket
         | FROM sig, (SELECT unnest(range(0, 4)) AS band) bands),
         |cand AS (SELECT DISTINCT nw.doc_id AS new_id, cp.doc_id AS corpus_id,
         |  nw.sig AS sig_new, cp.sig AS sig_corpus
         | FROM bd nw JOIN bd cp ON nw.band = cp.band AND nw.bucket = cp.bucket
         | WHERE nw.side = 'new' AND cp.side = 'corpus'),
         |scored AS (SELECT new_id, corpus_id,
         |  CAST(len(list_filter(list_zip(sig_new, sig_corpus), x -> x[1] = x[2])) AS DOUBLE) / 16 AS est_jaccard
         | FROM cand)
         |SELECT new_id, corpus_id, est_jaccard FROM scored
         |WHERE est_jaccard >= 0.8
         |ORDER BY new_id, corpus_id""".stripMargin,
    "q_simhash_pairs_md5" ->
      // mirrors simhashPairsPortable bit for bit: 56-bit md5 token
      // hashes, per-occurrence majority vote (ties → 0), 4×14-bit band
      // buckets, popcount-of-xor verify
      s"""WITH w AS (SELECT doc_id, unnest(string_split_regex(lower(trim(text)), '\\s+')) AS t FROM documents),
         |th AS (SELECT doc_id, ('0x' || substr(md5(t), 1, 14))::BIGINT AS h FROM w),
         |v AS (SELECT doc_id,
         |  ${(0 until 56).map(b => s"sum(CASE WHEN (h >> $b) & 1 = 1 THEN 1 ELSE -1 END) AS v$b").mkString(",\n         |  ")}
         | FROM th GROUP BY doc_id),
         |sig AS (SELECT doc_id,
         |  ${(0 until 56).map(b => s"(CASE WHEN v$b > 0 THEN (1::BIGINT << $b) ELSE 0 END)").mkString(" +\n         |  ")} AS simhash
         | FROM v),
         |bd AS (SELECT doc_id, simhash, band,
         |  (simhash >> (band * 14)) & 16383 AS bucket
         | FROM sig, (SELECT unnest(range(0, 4)) AS band) bands),
         |cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
         |  CAST(bit_count(xor(a.simhash, b.simhash)) AS INTEGER) AS hamming
         | FROM bd a JOIN bd b ON a.band = b.band AND a.bucket = b.bucket
         |  AND a.doc_id < b.doc_id)
         |SELECT doc_a, doc_b, hamming FROM cand
         |WHERE hamming <= 3
         |ORDER BY doc_a, doc_b""".stripMargin,
    "q_setops" ->
      """WITH hv AS (SELECT DISTINCT o_custkey AS custkey FROM orders WHERE o_totalprice > 150000),
        |b AS (SELECT DISTINCT c_custkey AS custkey FROM customer WHERE c_mktsegment='BUILDING')
        |SELECT custkey, 'intersect' AS op FROM (SELECT custkey FROM hv INTERSECT SELECT custkey FROM b)
        |UNION ALL
        |SELECT custkey, 'except' FROM (SELECT custkey FROM hv EXCEPT SELECT custkey FROM b)
        |ORDER BY op, custkey""".stripMargin,
    "q_rollup" ->
      """SELECT coalesce(o_orderstatus,'ALL') AS status,
        | coalesce(o_orderpriority,'ALL') AS priority,
        | CAST(SUM(CAST(o_totalprice AS DECIMAL(27,2))) AS DOUBLE) AS total,
        | count(*) AS n
        |FROM orders GROUP BY ROLLUP(o_orderstatus, o_orderpriority)
        |ORDER BY status, priority""".stripMargin,
    "q_rank" ->
      """SELECT o_orderkey, o_orderpriority, o_totalprice,
        | CAST(rank() OVER (PARTITION BY o_orderpriority ORDER BY o_totalprice DESC) AS INTEGER) AS rnk,
        | CAST(dense_rank() OVER (PARTITION BY o_orderpriority ORDER BY o_totalprice DESC) AS INTEGER) AS drnk,
        | CAST(ntile(4) OVER (PARTITION BY o_orderpriority ORDER BY o_totalprice DESC, o_orderkey) AS INTEGER) AS quartile
        |FROM orders QUALIFY rnk <= 20
        |ORDER BY o_orderpriority, rnk, o_orderkey""".stripMargin,
    "q_random_proj" ->
      // the sign matrix re-derived cell by cell from md5 parity inside
      // a nested lambda; the projection is the same left fold as the
      // native dot (0-init vs first-element-init agree exactly — the
      // q_ann_topk raw-double convention)
      """WITH e0 AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
        |p AS (SELECT vec_id, list_transform(generate_series(1, 8), j ->
        |  list_reduce(list_transform(generate_series(1, 64), i ->
        |    e[i] * (CASE WHEN ('0x'||substr(md5(CAST(i AS VARCHAR)||':'||CAST(j AS VARCHAR)||':rp'),1,1))::BIGINT % 2 = 0
        |            THEN 1.0 ELSE -1.0 END)), (a,b) -> a + b)) AS pr
        | FROM e0)
        |SELECT vec_id, pr[1] AS p1, pr[2] AS p2, pr[3] AS p3, pr[4] AS p4,
        |  pr[5] AS p5, pr[6] AS p6, pr[7] AS p7, pr[8] AS p8
        |FROM p ORDER BY vec_id""".stripMargin,
    "q_rp_recall" ->
      // both searches replayed with the q_ann_topk normalize/top-k
      // CTEs — exact over the raw 64-dim vectors, approximate over the
      // re-derived 8-dim projections — then the recall overlap
      """WITH e0 AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
        |p AS (SELECT vec_id, list_transform(generate_series(1, 8), j ->
        |  list_reduce(list_transform(generate_series(1, 64), i ->
        |    e[i] * (CASE WHEN ('0x'||substr(md5(CAST(i AS VARCHAR)||':'||CAST(j AS VARCHAR)||':rp'),1,1))::BIGINT % 2 = 0
        |            THEN 1.0 ELSE -1.0 END)), (a,b) -> a + b)) AS e
        | FROM e0),
        |eq AS (SELECT vec_id qid, list_transform(e,
        |  x -> x / sqrt(list_reduce(list_transform(e, y->y*y),(a,b)->a+b))) AS v FROM e0 WHERE vec_id<10),
        |ec AS (SELECT vec_id nid, list_transform(e,
        |  x -> x / sqrt(list_reduce(list_transform(e, y->y*y),(a,b)->a+b))) AS v FROM e0),
        |es AS (SELECT qid, nid, list_reduce(list_transform(list_zip(eq.v, ec.v), x -> x[1]*x[2]), (a,b)->a+b) AS sim
        | FROM eq, ec WHERE qid<>nid),
        |er AS (SELECT qid, nid, row_number() OVER (PARTITION BY qid ORDER BY sim DESC, nid) AS rank FROM es),
        |pq AS (SELECT vec_id qid, list_transform(e,
        |  x -> x / sqrt(list_reduce(list_transform(e, y->y*y),(a,b)->a+b))) AS v FROM p WHERE vec_id<10),
        |pc AS (SELECT vec_id nid, list_transform(e,
        |  x -> x / sqrt(list_reduce(list_transform(e, y->y*y),(a,b)->a+b))) AS v FROM p),
        |ps AS (SELECT qid, nid, list_reduce(list_transform(list_zip(pq.v, pc.v), x -> x[1]*x[2]), (a,b)->a+b) AS sim
        | FROM pq, pc WHERE qid<>nid),
        |prr AS (SELECT qid, nid, row_number() OVER (PARTITION BY qid ORDER BY sim DESC, nid) AS rank FROM ps),
        |ee AS (SELECT qid, nid, 1 AS fe FROM er WHERE rank<=5),
        |pp AS (SELECT qid, nid, 1 AS fp FROM prr WHERE rank<=5)
        |SELECT CAST(count(fe) AS BIGINT) AS n_exact,
        |  CAST(count(fp) AS BIGINT) AS n_proj,
        |  CAST(count(CASE WHEN fe IS NOT NULL AND fp IS NOT NULL THEN 1 END) AS BIGINT) AS n_hit,
        |  CASE WHEN count(fe) > 0
        |    THEN CAST(count(CASE WHEN fe IS NOT NULL AND fp IS NOT NULL THEN 1 END) AS DOUBLE) / count(fe)
        |  END AS recall
        |FROM ee FULL OUTER JOIN pp USING (qid, nid)""".stripMargin,
    "q_ann_topk" ->
      """WITH q0 AS (SELECT vec_id qid, embedding::DOUBLE[] qe FROM embeddings WHERE vec_id<10),
        |c0 AS (SELECT vec_id nid, embedding::DOUBLE[] ce FROM embeddings),
        |q AS (SELECT qid, list_transform(qe,
        |  x -> x / sqrt(list_reduce(list_transform(qe, y->y*y),(a,b)->a+b))) AS qn FROM q0),
        |c AS (SELECT nid, list_transform(ce,
        |  x -> x / sqrt(list_reduce(list_transform(ce, y->y*y),(a,b)->a+b))) AS cn FROM c0),
        |s AS (SELECT qid, nid,
        |  list_reduce(list_transform(list_zip(qn, cn), x -> x[1]*x[2]), (a,b)->a+b) AS sim
        | FROM q, c WHERE qid<>nid),
        |r AS (SELECT qid AS query_id, nid AS neighbor_id, sim,
        |  row_number() OVER (PARTITION BY qid ORDER BY sim DESC, nid) AS rank FROM s)
        |SELECT query_id, CAST(rank AS INTEGER) AS rank, neighbor_id, sim
        |FROM r WHERE rank<=5 ORDER BY query_id, rank""".stripMargin,
    "q_ann_ivf" ->
      // full IVF replay: normalize, modulo centroid set, argmax-dot
      // corpus assignment (tie → lowest cent_id, same as the struct-max),
      // nprobe=4 query probe list, within-cell cosine, top-5
      annIvfOracle,
    "q_ann_ivf_capped" ->
      // cap = observed max occupancy ⇒ definitionally the uncapped
      // probe; the shared oracle pins the cap machinery as identity
      annIvfOracle,
    "q_ivf_cells" ->
      // the same assignment CTE, aggregated to per-cell occupancy
      """WITH e0 AS (SELECT vec_id, embedding::DOUBLE[] e FROM embeddings),
        |n0 AS (SELECT vec_id, e,
        |  sqrt(list_reduce(list_transform(e, y->y*y),(p,q)->p+q)) AS nrm FROM e0),
        |n AS (SELECT vec_id, list_transform(e,
        |  x -> CASE WHEN nrm = 0 THEN 0.0 ELSE x / nrm END) AS v FROM n0),
        |cents AS (SELECT vec_id AS cent_id, v AS cv FROM n
        |  WHERE vec_id % 25 = 0 AND vec_id < 2000),
        |ca AS (SELECT vec_id, cent_id FROM (
        |  SELECT nn.vec_id, c.cent_id, row_number() OVER (
        |    PARTITION BY nn.vec_id ORDER BY
        |    list_reduce(list_transform(list_zip(nn.v, c.cv), x->x[1]*x[2]),(p,q)->p+q) DESC,
        |    c.cent_id) AS rn
        |  FROM n nn CROSS JOIN cents c) WHERE rn = 1)
        |SELECT cent_id, CAST(count(*) AS BIGINT) AS n_vectors
        |FROM ca GROUP BY cent_id
        |ORDER BY n_vectors DESC, cent_id LIMIT 20""".stripMargin,
    "q_ann_ivf_md5" ->
      """WITH e0 AS (SELECT vec_id, embedding::DOUBLE[] e FROM embeddings),
        |n0 AS (SELECT vec_id, e,
        |  sqrt(list_reduce(list_transform(e, y->y*y),(p,q)->p+q)) AS nrm FROM e0),
        |n AS (SELECT vec_id, list_transform(e,
        |  x -> CASE WHEN nrm = 0 THEN 0.0 ELSE x / nrm END) AS v FROM n0),
        |cents AS (SELECT vec_id AS cent_id, v AS cv FROM n
        | ORDER BY md5(vec_id::VARCHAR || ':7'), vec_id LIMIT 25),
        |ca AS (SELECT vec_id, cent_id, v FROM (
        |  SELECT nn.vec_id, c.cent_id, nn.v, row_number() OVER (
        |    PARTITION BY nn.vec_id ORDER BY
        |    list_reduce(list_transform(list_zip(nn.v, c.cv), x->x[1]*x[2]),(p,q)->p+q) DESC,
        |    c.cent_id) AS rn
        |  FROM n nn CROSS JOIN cents c) WHERE rn = 1),
        |qa AS (SELECT vec_id AS query_id, cent_id, v AS qv FROM (
        |  SELECT nn.vec_id, c.cent_id, nn.v, row_number() OVER (
        |    PARTITION BY nn.vec_id ORDER BY
        |    list_reduce(list_transform(list_zip(nn.v, c.cv), x->x[1]*x[2]),(p,q)->p+q) DESC,
        |    c.cent_id) AS rn
        |  FROM n nn CROSS JOIN cents c WHERE nn.vec_id < 10) WHERE rn <= 4),
        |s AS (SELECT qa.query_id, ca.vec_id AS neighbor_id,
        |  list_reduce(list_transform(list_zip(qa.qv, ca.v), x->x[1]*x[2]),(p,q)->p+q) AS sim
        | FROM qa JOIN ca USING (cent_id) WHERE qa.query_id <> ca.vec_id),
        |r AS (SELECT query_id, neighbor_id, sim,
        |  row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id) AS rank FROM s)
        |SELECT query_id, CAST(rank AS INTEGER) AS rank, neighbor_id, sim
        |FROM r WHERE rank<=5 ORDER BY query_id, rank""".stripMargin,
    "q_ann_quantized" ->
      // int8 quantization is exactly reproducible cross-engine: the
      // integer dot is exact, the only float ops (normalize, scale,
      // rescale) are the same IEEE doubles in the same order
      """WITH e0 AS (SELECT vec_id, embedding::DOUBLE[] e FROM embeddings),
        |n0 AS (SELECT vec_id, e,
        |  sqrt(list_reduce(list_transform(e, y->y*y),(a,b)->a+b)) AS nrm FROM e0),
        |n AS (SELECT vec_id, list_transform(e,
        |  x -> CASE WHEN nrm = 0 THEN 0.0 ELSE x / nrm END) AS v FROM n0),
        |s AS (SELECT vec_id, v, list_max(list_transform(v, x -> abs(x))) / 127.0 AS scale FROM n),
        |qv AS (SELECT vec_id, scale,
        |  list_transform(v, x -> CAST(round(
        |    CASE WHEN scale = 0 THEN 0.0 ELSE x / scale END) AS INTEGER)) AS q FROM s),
        |p AS (SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
        |  CAST(list_reduce(list_transform(list_zip(a.q, b.q), x -> x[1]*x[2]), (m,w)->m+w) AS DOUBLE)
        |    * a.scale * b.scale AS sim
        | FROM qv a, qv b WHERE a.vec_id < 10 AND a.vec_id <> b.vec_id),
        |r AS (SELECT query_id, neighbor_id, sim,
        |  row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id) AS rank FROM p)
        |SELECT query_id, CAST(rank AS INTEGER) AS rank, neighbor_id, sim
        |FROM r WHERE rank<=5 ORDER BY query_id, rank""".stripMargin,
    "q_cosine_pairs" ->
      // fixed-budget panel replay: same md5 selection as the Spark side
      """WITH sel AS (SELECT vec_id, embedding FROM embeddings
        |  ORDER BY md5(CAST(vec_id AS VARCHAR) || ':cosp'), vec_id LIMIT 1024),
        |e AS (SELECT vec_id, list_transform(embedding::DOUBLE[],
        |  x -> x / sqrt(list_reduce(list_transform(embedding::DOUBLE[], y->y*y),(a,b)->a+b))) AS v
        | FROM sel)
        |SELECT a.vec_id AS id_a, b.vec_id AS id_b,
        | list_reduce(list_transform(list_zip(a.v, b.v), x -> x[1]*x[2]), (p,q)->p+q) AS sim
        |FROM e a JOIN e b ON a.vec_id < b.vec_id
        |WHERE list_reduce(list_transform(list_zip(a.v, b.v), x -> x[1]*x[2]), (p,q)->p+q) >= 0.4
        |ORDER BY id_a, id_b""".stripMargin,
    "q_percentiles" ->
      """SELECT l_returnflag,
        | quantile_cont(l_extendedprice, 0.5) AS med_price,
        | quantile_cont(l_extendedprice, 0.95) AS p95_price,
        | quantile_cont(l_quantity, 0.5) AS med_qty
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q_percentiles_scale" ->
      """SELECT l_returnflag,
        | quantile_cont(l_extendedprice, 0.5) AS med_price,
        | quantile_cont(l_extendedprice, 0.95) AS p95_price,
        | quantile_cont(l_quantity, 0.5) AS med_qty
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q_percentiles_hist" ->
      // the histogram path answers with the SAME interpolation as
      // quantile_cont — bit-equal, so the oracle is the plain form
      """SELECT l_returnflag,
        | quantile_cont(l_quantity, 0.5) AS med_qty,
        | quantile_cont(l_quantity, 0.95) AS p95_qty
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q_stats" ->
      """WITH m AS (SELECT l_returnflag,
        |  CAST(count(*) AS DOUBLE) AS n,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(27,6))) AS DOUBLE) AS sx,
        |  CAST(SUM(CAST(l_quantity*l_quantity AS DECIMAL(27,6))) AS DOUBLE) AS sxx,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(27,6))) AS DOUBLE) AS sy,
        |  CAST(SUM(CAST(l_extendedprice*l_extendedprice AS DECIMAL(27,6))) AS DOUBLE) AS syy,
        |  CAST(SUM(CAST(l_quantity*l_extendedprice AS DECIMAL(27,6))) AS DOUBLE) AS sxy
        | FROM lineitem GROUP BY l_returnflag)
        |SELECT l_returnflag,
        | (sx / n) AS mean_qty,
        | sqrt((sxx - sx * sx / n) / (n - 1)) AS sd_qty,
        | round((sxy - sx * sy / n) /
        |  (sqrt(sxx - sx * sx / n) * sqrt(syy - sy * sy / n)), 12) AS corr_qty_price
        |FROM m ORDER BY l_returnflag""".stripMargin,
    "q_skew_report" ->
      """WITH c AS (SELECT o_custkey, count(*) AS n FROM orders GROUP BY o_custkey)
        |SELECT max(n) AS max_per_key, min(n) AS min_per_key,
        | CAST(SUM(n) AS DOUBLE) / count(*) AS mean_per_key,
        | quantile_cont(n, 0.99) AS p99_per_key
        |FROM c""".stripMargin,
    "q_vocab" ->
      """WITH tok AS (SELECT doc_id,
        |  unnest(string_split_regex(lower(trim(text)), '\s+')) AS token
        | FROM documents)
        |SELECT token, count(*) AS tf, count(DISTINCT doc_id) AS df
        |FROM tok GROUP BY token ORDER BY tf DESC, token LIMIT 100""".stripMargin,
    "q_kll_rollup" ->
      // exact group counts replayed; the rank-guarantee booleans pinned
      // TRUE — a sketch whose quantile drifts past 4% rank error (6σ)
      // fails the gate
      """SELECT l_returnflag, count(*) AS n_rows,
        | TRUE AS med_ok, TRUE AS p95_ok
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q_heavy_tokens" ->
      // exact counts replayed; est_ok pinned TRUE — the CMS one-sided
      // bound (estimate never undercounts) must hold on every row
      """WITH tok AS (SELECT lang,
        |  unnest(string_split_regex(lower(trim(text)), '\s+')) AS token
        | FROM documents),
        |c AS (SELECT lang, token, count(*) AS n_exact FROM tok GROUP BY 1, 2),
        |r AS (SELECT lang, token, n_exact, row_number() OVER (
        |  PARTITION BY lang ORDER BY n_exact DESC, token) AS rn FROM c)
        |SELECT lang, token, n_exact, TRUE AS est_ok FROM r WHERE rn <= 10
        |ORDER BY lang NULLS FIRST, n_exact DESC, token""".stripMargin,
    "q_asof" ->
      """WITH p0 AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_id, value
        |  FROM events WHERE event_type='purchase'),
        |p AS (SELECT user_id, ts, event_id, value FROM (
        |  SELECT *, row_number() OVER (PARTITION BY user_id, ts ORDER BY event_id DESC) AS rn
        |  FROM p0) WHERE rn = 1),
        |c AS (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts
        |  FROM events WHERE event_type='click')
        |SELECT c.event_id, c.user_id, c.ts,
        | p.event_id AS asof_event_id, p.value AS asof_value
        |FROM c ASOF LEFT JOIN p ON c.user_id = p.user_id AND c.ts >= p.ts
        |ORDER BY c.event_id""".stripMargin,
    "q_asof_tol" ->
      """WITH p0 AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_id, value
        |  FROM events WHERE event_type='purchase'),
        |p AS (SELECT user_id, ts, event_id, value FROM (
        |  SELECT *, row_number() OVER (PARTITION BY user_id, ts ORDER BY event_id DESC) AS rn
        |  FROM p0) WHERE rn = 1),
        |c AS (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts
        |  FROM events WHERE event_type='click')
        |SELECT c.event_id, c.user_id, c.ts,
        | CASE WHEN epoch_ms(c.ts) - epoch_ms(p.ts) <= 3600000
        |      THEN p.event_id END AS asof_event_id,
        | CASE WHEN epoch_ms(c.ts) - epoch_ms(p.ts) <= 3600000
        |      THEN p.value END AS asof_value
        |FROM c ASOF LEFT JOIN p ON c.user_id = p.user_id AND c.ts >= p.ts
        |ORDER BY c.event_id""".stripMargin,
    "q_asof_forward" ->
      """WITH p0 AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_id, value
        |  FROM events WHERE event_type='purchase'),
        |p AS (SELECT user_id, ts, event_id, value FROM (
        |  SELECT *, row_number() OVER (PARTITION BY user_id, ts ORDER BY event_id ASC) AS rn
        |  FROM p0) WHERE rn = 1),
        |c AS (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts
        |  FROM events WHERE event_type='click')
        |SELECT c.event_id, c.user_id, c.ts,
        | p.event_id AS asof_event_id, p.value AS asof_value
        |FROM c ASOF LEFT JOIN p ON c.user_id = p.user_id AND c.ts <= p.ts
        |ORDER BY c.event_id""".stripMargin,
    "q_curate" ->
      """WITH t AS (SELECT doc_id, lang,
        |  md5(lower(regexp_replace(trim(nfc_normalize(text)), '\s+', ' ', 'g'))) AS fp,
        |  CAST(len(string_split_regex(lower(trim(text)), '\s+')) AS INTEGER) AS n_tokens
        | FROM documents)
        |SELECT doc_id, lang, n_tokens FROM (
        | SELECT *, row_number() OVER (PARTITION BY fp ORDER BY doc_id) AS rn FROM t)
        |WHERE rn = 1 AND n_tokens >= 30 ORDER BY doc_id""".stripMargin,
    "q_bm25" ->
      // constants appear as decimal literals whose nearest double equals
      // the Scala-side fold (1.2+1.0 == double 2.2 — verified bitwise);
      // ln() ulp divergence between libms is absorbed by the 9 dp
      // per-term round + DECIMAL sum (see Retrieval Scaladoc)
      """WITH t AS (SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS ws FROM documents),
        |lens AS (SELECT doc_id, CAST(len(ws) AS DOUBLE) AS dl FROM t),
        |stats AS (SELECT CAST(count(*) AS DOUBLE) AS n_docs, avg(dl) AS avg_dl FROM lens),
        |tok AS (SELECT doc_id, unnest(ws) AS term FROM t),
        |tf AS (SELECT doc_id, term, CAST(count(*) AS DOUBLE) AS tf FROM tok
        | WHERE term IN ('spark', 'window', 'join') GROUP BY 1, 2),
        |dfreq AS (SELECT term, CAST(count(*) AS DOUBLE) AS df FROM tf GROUP BY term),
        |ts AS (SELECT tf.doc_id,
        |  ln((s.n_docs - d.df + 0.5)/(d.df + 0.5) + 1.0) * (tf.tf * 2.2) /
        |    (tf.tf + 1.2 * (0.25 + 0.75 * l.dl / s.avg_dl)) AS sc
        | FROM tf JOIN dfreq d USING (term) JOIN lens l USING (doc_id) CROSS JOIN stats s),
        |agg AS (SELECT doc_id,
        |  round(CAST(sum(CAST(round(sc, 9) AS DECIMAL(27,9))) AS DOUBLE), 6) AS score
        | FROM ts GROUP BY doc_id),
        |top AS (SELECT doc_id, score FROM agg ORDER BY score DESC, doc_id LIMIT 20)
        |SELECT CAST(row_number() OVER (ORDER BY score DESC, doc_id) AS BIGINT) AS rank,
        | doc_id, score
        |FROM top ORDER BY rank""".stripMargin,
    "q_curate_full" -> curateFullSql,
    "q_approx_profile" ->
      // verdict form: exact distinct counts are the comparable
      // quantities; the bounded-error booleans are claims the engine
      // asserts in-query (|HLL - exact| <= 15%)
      """SELECT count(DISTINCT l_orderkey) AS exact_orders,
        | count(DISTINCT l_partkey) AS exact_parts,
        | true AS orders_ok, true AS parts_ok
        |FROM lineitem""".stripMargin,
    "q_hll_rollup" ->
      """SELECT source, count(*) AS n_rows,
        | count(DISTINCT doc_id) AS exact_distinct, true AS hll_ok
        |FROM documents GROUP BY source ORDER BY source""".stripMargin,
    "q_percentiles_approx" ->
      // rank-interval verdicts: the engine checks each sketch estimate's
      // exact rank bracket overlaps target +- 2% in-query
      """SELECT l_returnflag, count(*) AS n_rows,
        | true AS med_price_ok, true AS p95_price_ok, true AS med_qty_ok
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q_compress_ratio" ->
      // exact byte totals per language (strlen = UTF-8 bytes, matching
      // Spark octet_length); deflate band verdicts asserted in-engine
      """SELECT lang, count(*) AS n_docs,
        | CAST(sum(strlen(text)) AS BIGINT) AS total_bytes,
        | true AS bounds_ok, true AS big_docs_ok, true AS avg_ratio_ok
        |FROM documents GROUP BY lang ORDER BY lang""".stripMargin,
    "q_minhash_pairs" ->
      // truth-set size from the exact-Jaccard CTEs (threshold 0.5);
      // recall/precision >= 0.9 of the xxhash64 LSH asserted in-engine
      """WITH w AS (SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS ws FROM documents),
        |sh AS (SELECT doc_id, unnest(list_distinct(
        |  [ws[i]||'_'||ws[i+1]||'_'||ws[i+2] for i in range(1, len(ws)-1)])) AS s FROM w),
        |sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id),
        |cand AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS common
        | FROM sh a JOIN sh b ON a.s=b.s AND a.doc_id < b.doc_id GROUP BY 1, 2),
        |exact AS (SELECT doc_a
        | FROM cand JOIN sizes sa ON doc_a=sa.doc_id JOIN sizes sb ON doc_b=sb.doc_id
        | WHERE CAST(common AS DOUBLE)/(sa.sz + sb.sz - common) >= 0.5)
        |SELECT count(*) AS n_exact, true AS recall_ok, true AS precision_ok
        |FROM exact""".stripMargin,
    "q_minhash_pairs_sampled" ->
      // the q_minhash_pairs CTEs over the md5 quarter-sample — the
      // sampled truth count is md5-deterministic, so the 100 TB gate
      // query is itself oracle-exact; verdict booleans asserted
      // in-engine (full-corpus LSH restricted to sampled endpoints
      // equals LSH-on-the-sample: pairwise property)
      s"""WITH w AS (SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS ws FROM ${panelDocsSrc(1280, "mvp")}),
        |sh AS (SELECT doc_id, unnest(list_distinct(
        |  [ws[i]||'_'||ws[i+1]||'_'||ws[i+2] for i in range(1, len(ws)-1)])) AS s FROM w),
        |sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id),
        |cand AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS common
        | FROM sh a JOIN sh b ON a.s=b.s AND a.doc_id < b.doc_id GROUP BY 1, 2),
        |exact AS (SELECT doc_a
        | FROM cand JOIN sizes sa ON doc_a=sa.doc_id JOIN sizes sb ON doc_b=sb.doc_id
        | WHERE CAST(common AS DOUBLE)/(sa.sz + sb.sz - common) >= 0.5)
        |SELECT count(*) AS n_exact_sampled, true AS recall_ok, true AS precision_ok
        |FROM exact""".stripMargin,
    "q_simhash_pairs" ->
      // identical-normalized-text pair count (md5 groups, exact in any
      // engine); the hamming-0 guaranteed-recall and banded==brute
      // verdicts are asserted in-engine
      """WITH g AS (SELECT md5(lower(trim(text))) AS h, count(*) AS c
        | FROM documents WHERE trim(text) <> '' GROUP BY 1)
        |SELECT CAST(coalesce(sum(c*(c-1)//2), 0) AS BIGINT) AS n_identical_pairs,
        | true AS identical_found_ok, true AS banded_equals_brute_ok
        |FROM g""".stripMargin,
    "q_cross_dedup" ->
      // exact drop x corpus truth-set size (trigram Jaccard >= 0.8 over
      // the corpus + offset re-arrivals); planted-recall and screen-
      // recall verdicts asserted in-engine
      """WITH docs2 AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 500000 AS doc_id, text FROM documents WHERE doc_id % 7 = 0),
        |w AS (SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS ws FROM docs2),
        |sh AS (SELECT doc_id, unnest(list_distinct(
        |  [ws[i]||'_'||ws[i+1]||'_'||ws[i+2] for i in range(1, len(ws)-1)])) AS s FROM w),
        |sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id),
        |cand AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS common
        | FROM sh a JOIN sh b ON a.s=b.s AND a.doc_id < b.doc_id GROUP BY 1, 2),
        |truth AS (SELECT doc_a
        | FROM cand JOIN sizes sa ON doc_a=sa.doc_id JOIN sizes sb ON doc_b=sb.doc_id
        | WHERE CAST(common AS DOUBLE)/(sa.sz + sb.sz - common) >= 0.8
        |  AND doc_a < 500000 AND doc_b >= 500000)
        |SELECT count(*) AS n_true, true AS all_planted_found_ok, true AS recall_ok
        |FROM truth""".stripMargin,
    "q_curate_lsh" ->
      // agreement-verdict form: the exact quantities are the corpus
      // size and the EXACT path's kept count (curateFullSql, collapsed
      // to a count); the fast-path agreement boolean is asserted
      // in-engine
      s"""SELECT (SELECT count(*) FROM documents) AS n_docs,
         |  (SELECT count(*) FROM ($curateFullSql) kept) AS n_kept_exact,
         |  true AS fast_path_agrees_ok""".stripMargin,
    "q_curate_lsh_sampled" ->
      // the exact curation replay over the md5 quarter-sample: kept
      // count is md5-deterministic; the fast-vs-exact agreement boolean
      // (both paths on the SAME subcorpus) asserted in-engine
      s"""SELECT (SELECT count(*) FROM documents) AS n_docs,
         |  (SELECT count(*) FROM (${curateFullSqlOver(panelDocsSrc(1280, "clp"))}) kept) AS n_kept_exact_sampled,
         |  true AS fast_path_agrees_ok""".stripMargin,
    "q_curate_lsh_md5" -> curateLshMd5Sql,
    "q_funnel" ->
      // chained min-aggregations reproduce the greedy-earliest anchored
      // semantics: for a fixed first-touch anchor, earliest-qualifying
      // per step is the unique optimal match
      """WITH e AS (SELECT user_id, epoch_ms(ts) AS t, event_type FROM events
        | WHERE event_type IN ('view', 'click', 'purchase')),
        |t1 AS (SELECT user_id, min(t) AS t1 FROM e WHERE event_type='view' GROUP BY 1),
        |t2 AS (SELECT e.user_id, min(t) AS t2 FROM e JOIN t1 USING (user_id)
        | WHERE event_type='click' AND t >= t1.t1 AND t <= t1.t1 + 3600000 GROUP BY 1),
        |t3 AS (SELECT e.user_id, min(t) AS t3 FROM e JOIN t2 USING (user_id) JOIN t1 USING (user_id)
        | WHERE event_type='purchase' AND t >= t2.t2 AND t <= t1.t1 + 3600000 GROUP BY 1)
        |SELECT * FROM (VALUES
        | (CAST(1 AS INTEGER), 'view', (SELECT count(*) FROM t1)),
        | (CAST(2 AS INTEGER), 'click', (SELECT count(*) FROM t2)),
        | (CAST(3 AS INTEGER), 'purchase', (SELECT count(*) FROM t3))
        |) AS v(step, step_name, n_users) ORDER BY step""".stripMargin,
    "q_transitions" ->
      """WITH o AS (SELECT user_id, event_type,
        |  lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS from_type
        | FROM events)
        |SELECT from_type, event_type AS to_type, count(*) AS n
        |FROM o WHERE from_type IS NOT NULL
        |GROUP BY 1, 2 ORDER BY from_type, to_type""".stripMargin,
    "q_retention" ->
      // week offsets are exact multiples of 7 days (both wk columns are
      // week-truncated), so the /7 division is exact in every engine
      """WITH a AS (SELECT DISTINCT user_id, CAST(date_trunc('week', ts) AS DATE) AS wk FROM events),
        |c AS (SELECT user_id, min(wk) AS cohort_week FROM a GROUP BY 1),
        |g AS (SELECT c.cohort_week, CAST((a.wk - c.cohort_week)/7 AS INTEGER) AS week_offset,
        |  count(*) AS n_users
        | FROM a JOIN c USING (user_id) GROUP BY 1, 2),
        |s AS (SELECT cohort_week, n_users AS cohort_size FROM g WHERE week_offset = 0)
        |SELECT g.cohort_week, g.week_offset, g.n_users,
        | CAST(g.n_users AS DOUBLE)/s.cohort_size AS retention
        |FROM g JOIN s USING (cohort_week)
        |ORDER BY cohort_week, week_offset""".stripMargin,
    "q_events_hourly" ->
      """SELECT CAST(ts AS DATE) AS event_date,
        | CAST(EXTRACT(hour FROM ts) AS INTEGER) AS hr, event_type,
        | count(*) AS n,
        | CAST(SUM(CAST(value AS DECIMAL(27,4))) AS DOUBLE) AS total_value
        |FROM events GROUP BY 1,2,3 ORDER BY event_date, hr, event_type""".stripMargin,
    "q_mix_temp" ->
      // sqrt(mass) rounded to 9dp, DECIMAL-summed, one IEEE division
      """WITH tok AS (SELECT lang,
        |  unnest(string_split_regex(lower(trim(text)), '\s+')) AS t
        | FROM documents),
        |c AS (SELECT lang, count(*) AS n_tokens FROM tok GROUP BY lang),
        |w AS (SELECT lang, n_tokens,
        |  CAST(round(sqrt(n_tokens), 9) AS DECIMAL(28,9)) AS w FROM c),
        |t AS (SELECT SUM(w) AS tw FROM w)
        |SELECT lang, n_tokens,
        | round(CAST(w AS DOUBLE) / CAST(tw AS DOUBLE), 9) AS share
        |FROM w CROSS JOIN t ORDER BY lang NULLS FIRST""".stripMargin,
    "q_kanon" ->
      // group sizes with the same >= k split
      """SELECT lang, source, count(*) AS n_rows, count(*) >= 20 AS released
        |FROM documents GROUP BY lang, source
        |ORDER BY lang NULLS FIRST, source NULLS FIRST""".stripMargin,
    "q_scd2" ->
      // same window replay: lead + row_number over (ts, event_id)
      """SELECT user_id, event_id,
        | CAST(ts AS TIMESTAMP) AS effective_from,
        | lead(CAST(ts AS TIMESTAMP)) OVER w AS effective_to,
        | CAST(row_number() OVER w AS INTEGER) AS version,
        | lead(CAST(ts AS TIMESTAMP)) OVER w IS NULL AS is_current
        |FROM events WHERE event_type = 'purchase'
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        |ORDER BY user_id, version""".stripMargin,
    "q_w_rolling" ->
      // same RANGE frame over floor(epoch seconds); frames are
      // value-sized so equal timestamps share one frame in both engines
      """SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts, value,
        | count(*) OVER w AS n_trailing_1h,
        | CAST(SUM(CAST(value AS DECIMAL(27,4))) OVER w AS DOUBLE) AS sum_trailing_1h
        |FROM events
        |WINDOW w AS (PARTITION BY user_id
        | ORDER BY CAST(floor(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT)
        | RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW)
        |ORDER BY user_id, ts, event_id""".stripMargin,
    "q_attribution" ->
      // DuckDB ASOF LEFT JOIN + the same floor(epoch) second arithmetic;
      // FALSE AND NULL = FALSE in both engines, so the no-click bucket
      // groups as unattributed
      """WITH c0 AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_id
        |  FROM events WHERE event_type = 'click'),
        |c AS (SELECT user_id, ts, event_id FROM (
        |  SELECT *, row_number() OVER (PARTITION BY user_id, ts
        |    ORDER BY event_id DESC) AS rn FROM c0) WHERE rn = 1),
        |p AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, value
        | FROM events WHERE event_type = 'purchase'),
        |a AS (SELECT p.ts, p.value, c.ts AS click_ts
        | FROM p ASOF LEFT JOIN c ON p.user_id = c.user_id AND c.ts <= p.ts)
        |SELECT (click_ts IS NOT NULL AND
        |  CAST(floor(epoch(ts)) AS BIGINT) -
        |   CAST(floor(epoch(click_ts)) AS BIGINT) <= 3600) AS attributed,
        | count(*) AS n_purchases,
        | CAST(SUM(CAST(value AS DECIMAL(27,4))) AS DOUBLE) AS total_value
        |FROM a GROUP BY 1 ORDER BY attributed""".stripMargin,
    "q_paths" ->
      // identical windowed-lead trigrams; NULL-propagating || means the
      // tail rows drop with the same l2 filter
      """WITH p AS (SELECT
        |  event_type || '>' || lead(event_type, 1) OVER w || '>' ||
        |   lead(event_type, 2) OVER w AS path,
        |  lead(event_type, 2) OVER w AS l2
        | FROM events
        | WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
        |SELECT path, count(*) AS n FROM p WHERE l2 IS NOT NULL
        |GROUP BY path ORDER BY n DESC, path LIMIT 10""".stripMargin,
    "q_events_hopping" ->
      // window starts are hop-aligned: event t lands in starts
      // floor(t/hop)·hop and the one hop earlier (len = 2·hop) —
      // replayed as an explicit unnest([0,1]) fan-out
      """WITH e AS (SELECT CAST(ts AS TIMESTAMP) AS ts, event_type, value FROM events),
        |w AS (SELECT CAST(to_timestamp(
        |   CAST(floor(epoch(e.ts)/1800)*1800 - 1800 + os.o*1800 AS BIGINT)) AS TIMESTAMP)
        |   AS win_start, event_type, value
        | FROM e, (SELECT unnest([0, 1]) AS o) os)
        |SELECT win_start, event_type, count(*) AS n,
        | CAST(SUM(CAST(value AS DECIMAL(27,4))) AS DOUBLE) AS total_value
        |FROM w GROUP BY 1, 2 ORDER BY win_start, event_type""".stripMargin,
    "q_events_sessions_native" ->
      // identical oracle to q_events_sessions: the native session_window
      // form produces the same sessions on data without exact-gap
      // boundaries (asserted by the fixture check + parity spec)
      """WITH e AS (
        | SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts, value,
        |  lag(CAST(ts AS TIMESTAMP)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
        | FROM events),
        |f AS (
        | SELECT user_id, event_id, ts, value,
        |  CASE WHEN prev_ts IS NULL OR epoch_ms(ts) - epoch_ms(prev_ts) > 21600000
        |       THEN 1 ELSE 0 END AS new_session
        | FROM e),
        |g AS (
        | SELECT user_id, ts, value,
        |  CAST(SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_seq
        | FROM f)
        |SELECT user_id, session_seq, min(ts) AS session_start, max(ts) AS session_end,
        | count(*) AS n_events,
        | CAST(SUM(CAST(value AS DECIMAL(27,4))) AS DOUBLE) AS total_value
        |FROM g GROUP BY user_id, session_seq ORDER BY user_id, session_seq""".stripMargin,
    "q_events_sessions" ->
      // session_seq: DuckDB SUM(int) yields HUGEINT which lands as float64
      // on the driver side — CAST ... AS BIGINT matches Spark's LongType
      // (this, not tie order, was the round-1 hash mismatch: the fixture
      // has zero duplicate (user_id, ts) pairs). event_id tie-break kept
      // in both engines for determinism under future fixtures.
      """WITH e AS (
        | SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts, value,
        |  lag(CAST(ts AS TIMESTAMP)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
        | FROM events),
        |f AS (
        | SELECT user_id, event_id, ts, value,
        |  CASE WHEN prev_ts IS NULL OR epoch_ms(ts) - epoch_ms(prev_ts) > 21600000
        |       THEN 1 ELSE 0 END AS new_session
        | FROM e),
        |g AS (
        | SELECT user_id, ts, value,
        |  CAST(SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_seq
        | FROM f)
        |SELECT user_id, session_seq, min(ts) AS session_start, max(ts) AS session_end,
        | count(*) AS n_events,
        | CAST(SUM(CAST(value AS DECIMAL(27,4))) AS DOUBLE) AS total_value
        |FROM g GROUP BY user_id, session_seq ORDER BY user_id, session_seq""".stripMargin
  )
}
