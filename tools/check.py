#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run graft.Verify
first (sbt "runMain graft.Verify <sfDir> <outDir>"), then this script
compares each query's parquet dump against its DuckDB oracle on the
same tables. Usage: python3 tools/check.py <sfDir> <outDir>
"""
import sys, os, json, glob
import duckdb
import pandas as pd

sf_dir, out_dir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for p in glob.glob(f"{sf_dir}/*.parquet"):
    name = os.path.basename(p)[:-8]
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM '{p}'")

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
try:
    expected = json.load(open(f"{out_dir}/queries.json"))
except FileNotFoundError:
    expected = sorted(d for d in os.listdir(out_dir) if os.path.isdir(os.path.join(out_dir, d)))
fails = 0
for name in expected:
    qdir = os.path.join(out_dir, name)
    if not os.path.isdir(qdir):
        fails += 1
        print(f"[FAIL] {name}: no result dump (query crashed in Verify)")
        continue
    got = con.execute(f"SELECT * FROM '{qdir}/*.parquet'").fetchdf()
    if name not in oracle:
        print(f"[rows-only] {name}: {len(got)} rows")
        continue
    want = con.execute(oracle[name]).fetchdf()
    # DECIMAL is not a hash-stable carrier: DuckDB's pandas reader
    # flattens it to float64 (so the value-compare below can't see the
    # divergence) while the driver's reader keeps Spark's parquet
    # fixed-len decimal as decimal.Decimal — the round-13
    # q_parse_numeric miss. Flag a decimal column on EITHER side
    # before the values are even compared: project through
    # CAST(... AS STRING) or FLOAT64 instead.
    decs = []
    try:
        import pyarrow.parquet as pq
        for f in glob.glob(f"{qdir}/*.parquet"):
            sch = pq.read_schema(f)
            decs += [f"{n} (dump: {t})" for n, t in zip(sch.names, sch.types)
                     if "decimal" in str(t)]
            break
    except Exception:
        pass
    decs += [f"{r[0]} (oracle: {r[1]})"
             for r in con.execute("DESCRIBE " + oracle[name]).fetchall()
             if str(r[1]).startswith("DECIMAL")]
    if decs:
        fails += 1
        print(f"[FAIL] {name}: decimal carrier is not hash-stable across the "
              f"driver's readers — project CAST(... AS STRING): {decs}")
        continue
    got = got.reindex(sorted(got.columns), axis=1)
    want = want.reindex(sorted(want.columns), axis=1)
    status = []
    if list(got.columns) != list(want.columns):
        status.append(f"schema: got {list(got.columns)} want {list(want.columns)}")
    else:
        # the driver's value-hash is dtype-sensitive across CARRIER
        # classes: bigint 3 vs HUGEINT->float64 3.0 hash differently,
        # and (round 13) a Spark parquet DECIMAL(38,9) vs DuckDB
        # decimal->float64 sailed through check_dtype=False while the
        # driver flagged it. Compare the dtype CLASS of every column:
        # ints are one class (width doesn't matter to the value hash),
        # everything else must match kind-for-kind — float vs object
        # (decimal.Decimal), float vs int, datetime vs object all trip.
        def klass(k):
            return "int" if k in ("i", "u") else k
        for c in got.columns:
            gk, wk = got[c].dtype.kind, want[c].dtype.kind
            if klass(gk) != klass(wk):
                status.append(f"dtype-class: {c} got {got[c].dtype} want {want[c].dtype} (carrier classes hash differently)")
    if len(got) != len(want):
        status.append(f"rows: got {len(got)} want {len(want)}")
    if not status:
        g = got.sort_values(by=list(got.columns)).reset_index(drop=True)
        w = want.sort_values(by=list(want.columns)).reset_index(drop=True)
        try:
            pd.testing.assert_frame_equal(g, w, check_dtype=False, check_exact=True)
        except AssertionError as e:
            status.append("values: " + str(e).split("\n")[0])
            # show first mismatching rows
            neq = (g != w) & ~(g.isna() & w.isna())
            bad = neq.any(axis=1)
            if bad.any():
                i = bad.idxmax()
                status.append(f"  first diff row {i}: got={g.loc[i].to_dict()} want={w.loc[i].to_dict()}")
    if status:
        fails += 1
        print(f"[FAIL] {name}: " + " | ".join(status))
    else:
        print(f"[ok] {name}: {len(got)} rows")
print(f"\n{fails} failures")
sys.exit(1 if fails else 0)
