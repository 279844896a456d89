#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run each oracle SQL in
DuckDB over the sf parquet tables, compare against the Spark result
parquet written by graft.Verify (column-name-sorted, row-sorted, value
compare). Usage: selfcheck.py <sfdir> <verify_outdir>."""
import sys, json, math, glob, os
import duckdb

TABLES = ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]

def type_names(con, rel_sql):
    """Column name -> duckdb type name for an arbitrary SELECT."""
    r = con.sql(rel_sql)
    return dict(zip(r.columns, [str(t) for t in r.types]))

def norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v): return "NaN"
        # Bit-exact: repr() round-trips IEEE doubles exactly (shortest
        # repr), so a 1-ulp Spark-vs-DuckDB divergence FAILS here just
        # like the driver's type-sensitive hash does. Round 18 shipped
        # q128 red because the old "%.10g" normalization was blind to
        # exactly that class (VERDICT r18 "What's missing" #1).
        return repr(v)
    return str(v)

def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(norm_cell(r[i]) for i in order) for r in rows]
    return sorted(out), [cols[i] for i in order]

def main(sfdir, outdir):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sfdir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    n_ok = n_bad = 0
    for name, sql in sorted(oracle.items()):
        spark_dir = f"{outdir}/{name}"
        files = glob.glob(f"{spark_dir}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output"); n_bad += 1; continue
        try:
            sr = con.execute(f"SELECT * FROM read_parquet('{spark_dir}/*.parquet')")
            s_rows, s_cols = sr.fetchall(), [d[0] for d in sr.description]
            orr = con.execute(sql)
            o_rows, o_cols = orr.fetchall(), [d[0] for d in orr.description]
        except Exception as e:
            print(f"FAIL {name}: {e}"); n_bad += 1; continue
        s_canon, s_c = canon(s_rows, s_cols)
        o_canon, o_c = canon(o_rows, o_cols)
        if s_c != o_c:
            print(f"FAIL {name}: columns {s_c} vs {o_c}"); n_bad += 1; continue
        # Type gate (round 7): the driver's hash is TYPE-SENSITIVE. A bare
        # DuckDB sum(BIGINT) in an oracle final SELECT surfaces as HUGEINT
        # (int128) and fails the driver even when every value matches the
        # Spark BIGINT output. Require the oracle's duckdb types to equal
        # the types duckdb assigns to the Spark result parquet, per column.
        try:
            s_types = type_names(con, f"SELECT * FROM read_parquet('{spark_dir}/*.parquet')")
            o_types = type_names(con, sql)
            t_bad = [(c, s_types[c], o_types[c]) for c in s_types
                     if s_types[c] != o_types[c]]
            if t_bad:
                print(f"FAIL {name}: TYPE mismatch (spark,oracle): {t_bad}")
                n_bad += 1; continue
        except Exception as e:
            print(f"FAIL {name}: type-gate error {e}"); n_bad += 1; continue
        if len(s_canon) != len(o_canon):
            print(f"FAIL {name}: rows {len(s_canon)} vs {len(o_canon)}"); n_bad += 1; continue
        if s_canon != o_canon:
            bad = [(a, b) for a, b in zip(s_canon, o_canon) if a != b][:3]
            print(f"FAIL {name}: value mismatch, first diffs: {bad}"); n_bad += 1; continue
        print(f"OK   {name} ({len(s_canon)} rows)"); n_ok += 1
    print(f"== {n_ok} ok, {n_bad} bad ==")
    return 1 if n_bad else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
