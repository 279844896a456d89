#!/usr/bin/env python3
"""Driver-faithful correctness proxy (VERDICT r19, "What's missing" #1).

`selfcheck.py` normalizes BOTH sides through the same DuckDB client, so
it is structurally blind to representation classes that differ between
the driver's two read paths — round 19 shipped with every local gate
green while 45 driver gates were hash-red, because DECIMAL output
columns never hash identically across the driver's Spark-parquet reader
and its DuckDB oracle client. This script reproduces the driver's
ASYMMETRIC shape:

  Spark side : the result parquet read via PYARROW -> pandas
               (decimal128 -> Python Decimal objects, int64 -> numpy
               int64, ...).
  Oracle side: the paired SQL run in DuckDB -> .df() pandas
               (DECIMAL -> float64 in current builds, HUGEINT -> object,
               ...).

Then a TYPE-SENSITIVE canonical form (dtype name + repr of every cell,
columns sorted by name, rows sorted) is hashed per side and compared —
so a column whose two client representations disagree FAILS here even
when the values are numerically identical, exactly like the driver.

Additionally every Spark output column's arrow type must be on the
DRIVER-PROVEN allowlist — the set of types that have appeared in
driver-green gates (r18: 127/128 with DOUBLE/BIGINT/STRING/TIMESTAMP/
DATE/BOOL outputs; r19 proved DECIMAL is NOT in the set, 45/45 red).
An unproven output type is a FAIL even if this proxy happens to match:
nothing local can certify the driver's hash on a type it has never
accepted, so the gate forces the conversation before shipping.

Usage: driverproxy.py <sfdir> <verify_outdir> [out_json]
"""
import sys, json, math, glob, os, hashlib, datetime
import duckdb
import pyarrow.parquet as pq

TABLES = ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]

# Arrow type name prefixes that have appeared in driver-GREEN gate
# outputs. DECIMAL is deliberately absent (judge-confirmed red, r19).
PROVEN = ("int64", "int32", "double", "float", "string", "large_string",
          "bool", "timestamp", "date32", "date64")


def canon_cell(v):
    # dtype-qualified repr: 1 (int) != 1.0 (float) != Decimal('1.0') !=
    # '1' — mirrors a type-sensitive hash. Temporal values are the one
    # DRIVER-PROVEN exception: DATE columns hash green against oracle
    # dates even though the two clients surface them as datetime.date
    # vs midnight datetime64 (q99/q100 green in r18, and in r19 red
    # ONLY via their decimal column) — so all temporal cells normalize
    # to their ISO instant, not their client class.
    if v is None or (isinstance(v, float) and math.isnan(v)):
        return "NULL"
    if isinstance(v, datetime.datetime):
        return f"ts:{v.isoformat()}"
    if isinstance(v, datetime.date):
        return f"ts:{v.isoformat()}T00:00:00"
    return f"{type(v).__name__}:{v!r}"


def canon_dtype(dt):
    # unit width of a temporal dtype is a client artifact (pyarrow
    # keeps ns, duckdb's .df() yields us) — proven equal in the driver
    s = str(dt)
    return "datetime64" if s.startswith("datetime64") else s


def frame_hash(df):
    # NO dtype line: the per-cell tags (int:/float:/str:/Decimal:/ts:)
    # carry the type sensitivity; a pandas-level dtype would only
    # re-add client artifacts (pyarrow surfaces a DATE column as
    # `object` of datetime.date, duckdb as datetime64 — driver-proven
    # equal) without catching anything the cell tags miss.
    cols = sorted(df.columns)
    rows = sorted(
        tuple(canon_cell(v) for v in row)
        for row in df[cols].itertuples(index=False, name=None))
    h = hashlib.sha256()
    h.update(("|".join(cols) + "\n").encode())
    for r in rows:
        h.update(("\x1f".join(r) + "\n").encode())
    return h.hexdigest(), cols


def main(sfdir, outdir, out_json=None):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sfdir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    n_ok = n_bad = 0
    report = {}
    for name, sql in sorted(oracle.items()):
        spark_dir = f"{outdir}/{name}"
        files = sorted(glob.glob(f"{spark_dir}/*.parquet"))
        if not files:
            print(f"FAIL {name}: no spark output")
            report[name] = {"ok": False, "why": "no spark output"}
            n_bad += 1
            continue
        try:
            tbl = pq.read_table(files[0]) if len(files) == 1 else \
                pq.ParquetDataset(spark_dir).read()
            unproven = [
                (f.name, str(f.type)) for f in tbl.schema
                if not str(f.type).startswith(PROVEN)]
            sdf = tbl.to_pandas()
            odf = con.execute(sql).df()
        except Exception as e:
            print(f"FAIL {name}: {e}")
            report[name] = {"ok": False, "why": str(e)}
            n_bad += 1
            continue
        sh, sc = frame_hash(sdf)
        oh, oc = frame_hash(odf)
        why = []
        if unproven:
            why.append(f"UNPROVEN output type(s) {unproven} — never seen "
                       f"in a driver-green gate")
        if sc != oc:
            why.append(f"columns {sc} vs {oc}")
        elif len(sdf) != len(odf):
            why.append(f"rows {len(sdf)} vs {len(odf)}")
        elif sh != oh:
            srows = sorted(tuple(canon_cell(v) for v in row)
                           for row in sdf[sc].itertuples(index=False,
                                                         name=None))
            orows = sorted(tuple(canon_cell(v) for v in row)
                           for row in odf[oc].itertuples(index=False,
                                                         name=None))
            diffs = [(a, b) for a, b in zip(srows, orows) if a != b][:2]
            why.append(f"typed-hash mismatch, first diffs: {diffs}"
                       if diffs else
                       "typed-hash mismatch (dtype line differs: "
                       f"{[(c, canon_dtype(sdf[c].dtype), canon_dtype(odf[c].dtype)) for c in sc if canon_dtype(sdf[c].dtype) != canon_dtype(odf[c].dtype)]})")
        if why:
            print(f"FAIL {name}: {'; '.join(why)}")
            report[name] = {"ok": False, "why": "; ".join(why)}
            n_bad += 1
        else:
            print(f"OK   {name} ({len(sdf)} rows)")
            report[name] = {"ok": True, "rows": len(sdf)}
            n_ok += 1
    print(f"== {n_ok} ok, {n_bad} bad ==")
    if out_json:
        json.dump({"sfdir": sfdir, "ok": n_ok, "bad": n_bad,
                   "queries": report}, open(out_json, "w"), indent=1)
    return 1 if n_bad else 0


if __name__ == "__main__":
    sys.exit(main(*sys.argv[1:4]))
