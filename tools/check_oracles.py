#!/usr/bin/env python3
"""Local pre-check of SparkEntry.oracleSql against DuckDB — mirrors the
driver's correctness gate (rows / schema / value-hash after sorting
columns by name) so oracle drift is caught before the round closes.

Usage: python3 tools/check_oracles.py <verify_out_dir> <sf_dir>
(dev tool only — the engine itself never depends on duckdb/pandas)
"""
import json, sys, glob, os, math

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def decimal_cols(df: pd.DataFrame):
    """Columns holding raw decimal.Decimal objects. The driver's raw-read
    layer coerces DuckDB decimals to float64 but leaves Spark parquet
    decimals as objects, so a high-precision DECIMAL output column hash-
    splits at the driver even when values are bit-equal — queries must
    cast to double at the output boundary. Flag it here so the local gate
    FAILS where the driver would (r13 lesson: q_score_agreement)."""
    import decimal
    out = []
    for c in df.columns:
        s = df[c]
        # sample NON-NULL values: a decimal column whose first 20 rows
        # are all null would otherwise slip past the gate
        if s.dtype == object and any(isinstance(v, decimal.Decimal)
                                     for v in s.dropna().head(20)):
            out.append(c)
    return out


def canon(df: pd.DataFrame):
    df = df.reindex(sorted(df.columns), axis=1)

    def cell(v):
        if v is None or (isinstance(v, float) and math.isnan(v)) or v is pd.NaT:
            return "NULL"
        # date vs timestamp render identically in the driver's compare;
        # normalize both to 'YYYY-MM-DD HH:MM:SS'
        import datetime
        if isinstance(v, pd.Timestamp):
            v = v.to_pydatetime()
        if isinstance(v, datetime.datetime):
            return v.strftime("%Y-%m-%d %H:%M:%S")
        if isinstance(v, datetime.date):
            return v.strftime("%Y-%m-%d") + " 00:00:00"
        if isinstance(v, float):
            if v == int(v) and abs(v) < 1e15:
                return repr(round(v, 9))
            return repr(round(v, 9))
        if isinstance(v, (list, tuple)) or type(v).__name__ == "ndarray":
            return "[" + ",".join(cell(x) for x in v) + "]"
        return str(v)

    rows = sorted(tuple(cell(v) for v in row) for row in df.itertuples(index=False, name=None))
    return list(df.columns), rows


def main(out_dir, sf_dir):
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    results = {}
    for name in sorted(os.listdir(out_dir)):
        qdir = os.path.join(out_dir, name)
        if not os.path.isdir(qdir):
            continue
        files = glob.glob(os.path.join(qdir, "*.parquet"))
        spark_df = pd.concat([pd.read_parquet(f) for f in files]) if files else pd.DataFrame()
        if name not in oracle:
            results[name] = {"status": "no_oracle", "spark_rows": len(spark_df)}
            continue
        try:
            ora_df = con.execute(oracle[name]).fetchdf()
        except Exception as e:
            results[name] = {"status": "oracle_error", "err": str(e)[:300]}
            continue
        sc, sr = canon(spark_df)
        oc, orows = canon(ora_df)
        raw_dec = decimal_cols(spark_df) + decimal_cols(ora_df)
        res = {
            "rows_match": len(sr) == len(orows),
            "schema_match": sc == oc,
            "hash_match": sr == orows and not raw_dec,
            "spark_rows": len(sr), "oracle_rows": len(orows),
        }
        if raw_dec:
            res["raw_decimal_cols"] = sorted(set(raw_dec))
        res["status"] = "pass" if all(
            res[k] for k in ("rows_match", "schema_match", "hash_match")) else "FAIL"
        if res["status"] == "FAIL" and sc == oc and len(sr) == len(orows):
            diff = [(a, b) for a, b in zip(sr, orows) if a != b][:2]
            res["first_diff"] = repr(diff)[:400]
        results[name] = res
    n_pass = sum(1 for r in results.values() if r.get("status") == "pass")
    n_no = sum(1 for r in results.values() if r.get("status") == "no_oracle")
    bad = {k: v for k, v in results.items() if v.get("status") not in ("pass", "no_oracle")}
    print(f"pass={n_pass} no_oracle={n_no} fail={len(bad)} total={len(results)}")
    for k, v in bad.items():
        print("FAIL", k, json.dumps(v)[:500])
    for k, v in results.items():
        if v.get("status") == "no_oracle":
            print("no_oracle", k)


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
