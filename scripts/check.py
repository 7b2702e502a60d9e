#!/usr/bin/env python3
"""Local replica of the driver's t2 correctness gate.

Usage: python3 scripts/check.py [sfDir] [verifyOutDir]

Reads every `<verifyOutDir>/<name>/` parquet written by `graft.Verify`,
runs the matching SQL from `oracle_sql.json` in DuckDB over the same
testdata parquet tables, then compares: column names (sorted), row count,
and a hash of the sorted values (floats canonicalized via repr).

Dtype fidelity (the round-8 lesson): the ENGINE side is read with
pyarrow/pandas — NOT through DuckDB — because that is what the driver
does. The asymmetry matters: a DECIMAL(38,s) parquet column surfaces as
Decimal objects under pyarrow (str keeps trailing zeros) but as float64
under DuckDB's .df() (repr drops them), so reading both sides through
DuckDB masked exactly the mismatch that turned 18 driver rows red in
round 8. With this reader split, a decimal-typed engine output fails
HERE first.
"""
import datetime, duckdb, glob, json, os, sys, hashlib, time
import pandas as pd

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
OUT = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
# optional trailing args = query-name subset (resume after a crash /
# re-check a fix without replaying 150 green queries)
ONLY = set(sys.argv[3:])
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

con = duckdb.connect()
# big-SF runs: the heavyweight relational oracles (IVF assignment via a
# dimension-index join) build >RAM intermediates — give DuckDB a real
# temp dir and a bounded memory ceiling instead of the cwd default
if os.environ.get("DUCKDB_TMP"):
    os.makedirs(os.environ["DUCKDB_TMP"], exist_ok=True)
    con.execute(f"SET temp_directory='{os.environ['DUCKDB_TMP']}'")
if os.environ.get("DUCKDB_MEM"):
    con.execute(f"SET memory_limit='{os.environ['DUCKDB_MEM']}'")
# fewer threads = fewer concurrent pipelines and radix partitions in
# flight = a tighter spill bound for the widest oracles (the learned
# IVF-PQ chain's 330M-row pre-aggregation join at sf1 overran a 60 GB
# temp disk at default parallelism)
if os.environ.get("DUCKDB_THREADS"):
    con.execute(f"SET threads={int(os.environ['DUCKDB_THREADS'])}")
for t in TABLES:
    con.execute(
        f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    def cell(v):
        if v is None or v != v:  # NaN/None
            return "<null>"
        if isinstance(v, float):
            return repr(v)
        # DATE columns: pyarrow yields datetime.date ("2024-01-01"),
        # DuckDB datetime64 ("2024-01-01 00:00:00") — and the r8 driver
        # artifact shows date-output queries hash-GREEN, so the driver
        # normalizes this (unlike decimals). Render dates the
        # timestamp way to match.
        if isinstance(v, datetime.date) and not isinstance(v, datetime.datetime):
            return f"{v} 00:00:00"
        return str(v)
    s = df.apply(lambda col: col.map(cell))
    s = s.sort_values(by=list(s.columns)).reset_index(drop=True)
    return s

def h(df: pd.DataFrame) -> str:
    return hashlib.md5(
        df.to_csv(index=False).encode("utf-8")).hexdigest()[:12]

oracle = json.load(open(f"{OUT}/oracle_sql.json"))
names = sorted(d for d in os.listdir(OUT)
               if os.path.isdir(os.path.join(OUT, d)))
if ONLY:
    unknown = ONLY - set(names)
    assert not unknown, f"unknown queries: {sorted(unknown)}"
    names = [n for n in names if n in ONLY]
fails = 0
for name in names:
    t0 = time.time()
    files = glob.glob(f"{OUT}/{name}/*.parquet")
    if not files:
        print(f"FAIL {name}: no parquet output"); fails += 1; continue
    # engine side via pyarrow (decimal→Decimal, like the driver), oracle
    # side via DuckDB .df() (decimal→float64) — deliberately asymmetric
    got = pd.read_parquet(f"{OUT}/{name}", engine="pyarrow")
    if name not in oracle:
        print(f"SKIP {name}: no oracle ({len(got)} rows)"); continue
    try:
        exp = con.execute(oracle[name]).df()
    except Exception as e:
        print(f"FAIL {name}: oracle SQL error: {e}"); fails += 1; continue
    gc, ec = canon(got), canon(exp)
    if list(gc.columns) != list(ec.columns):
        print(f"FAIL {name}: cols {list(gc.columns)} != {list(ec.columns)}")
        fails += 1; continue
    if len(gc) != len(ec):
        print(f"FAIL {name}: rows {len(gc)} != {len(ec)}"); fails += 1; continue
    if h(gc) != h(ec):
        diff = gc.compare(ec) if gc.shape == ec.shape else None
        print(f"FAIL {name}: hash mismatch; sample diff:\n"
              f"{diff.head(5) if diff is not None else '(shape ok, values differ)'}")
        fails += 1; continue
    print(f"PASS {name} ({len(gc)} rows, {time.time() - t0:.1f}s)", flush=True)
print(f"\n{len(names) - fails}/{len(names)} pass")
sys.exit(1 if fails else 0)
