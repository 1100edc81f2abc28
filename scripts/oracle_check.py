#!/usr/bin/env python3
"""Cross-check Spark query outputs against the DuckDB oracle.

Usage: python3 scripts/oracle_check.py [verify_out_dir] [sf_dir]
(after `sbt -batch "runMain graft.Verify <sf_dir> <verify_out_dir>"`)

Queries run CONCURRENTLY across worker PROCESSES, one DuckDB
connection per worker (per-connection thread budgets keep total CPU at
~the core count). Processes, not threads: N in-process connections
share one vm.max_map_count budget (65530 maps by default), and the
recursive funnel mirrors fragment DuckDB's allocator enough that the
8-thread pool hit the map ceiling — malloc then fails at KB sizes
while the host has >100 GB free ("bad allocation" OOMs on whichever
query allocates next). One process per worker gives each connection
its own map table. The SQL is executed byte-identically to what the
driver runs — parallelism is the runtime guard, never a semantic
change. ORACLE_WORKERS overrides the pool size.
"""
import duckdb, json, glob, os, sys, decimal
from concurrent.futures import ProcessPoolExecutor

out_dir = sys.argv[1] if len(sys.argv) > 1 else '/tmp/verify_out'
sf_dir = sys.argv[2] if len(sys.argv) > 2 else '/root/testdata/sf0.01'

oracle = json.load(open(f'{out_dir}/oracle_sql.json'))

N_WORKERS = int(os.environ.get('ORACLE_WORKERS', '8'))
THREADS_PER_CON = max(1, (os.cpu_count() or 8) // N_WORKERS)
# Fair-share memory budget per worker connection, with a spill dir so
# an over-budget query degrades to disk instead of dying.
_mem_gb = max(2, int(0.8 * (os.sysconf('SC_PAGE_SIZE') * os.sysconf('SC_PHYS_PAGES'))
                     / (1 << 30) / N_WORKERS))
_con = None

def get_con():
    global _con
    if _con is None:
        con = duckdb.connect()
        con.execute(f"PRAGMA threads={THREADS_PER_CON}")
        con.execute(f"PRAGMA memory_limit='{_mem_gb}GB'")
        con.execute(f"PRAGMA temp_directory='/tmp/oracle_spill_{os.getpid()}'")
        for f in glob.glob(f'{sf_dir}/*.parquet'):
            name = os.path.basename(f).replace('.parquet', '')
            con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{f}')")
        _con = con
    return _con

def norm(v):
    if isinstance(v, decimal.Decimal): return float(v)
    if isinstance(v, (bytes, bytearray)): return v.hex()
    if v != v: return None  # NaN -> None
    return v

# Types the driver's typed value-hash distinguishes but norm() erases:
# DuckDB window/agg sums of BIGINT silently widen to HUGEINT (int128),
# and DECIMAL != DOUBLE/BIGINT. Reject them at the oracle-SQL output so
# local green predicts driver green (the r2 q_windowframe escape).
BANNED_TYPES = ('HUGEINT', 'DECIMAL', 'UHUGEINT')

if not oracle:
    print("MISMATCH ('<all>', 'empty_oracle', 'oracle_sql.json has no entries')")
    sys.exit(1)

def check(item):
    name, sql = item
    con = get_con()
    try:
        sdf = con.execute(f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')").fetchdf()
    except Exception as e:
        # Verify deletes the output dir when a query throws — a missing
        # dir means THAT query failed, not that the harness broke
        return (name, 'missing_output', str(e)[:200])
    try:
        offenders = [(r[0], r[1]) for r in
                     con.execute(f"DESCRIBE {sql}").fetchall()
                     if any(str(r[1]).upper().startswith(b) for b in BANNED_TYPES)]
        if offenders:
            return (name, 'oracle_type', f'banned output types {offenders} - CAST to BIGINT/DOUBLE')
        odf = con.execute(sql).fetchdf()
    except Exception as e:
        return (name, 'oracle_sql_error', str(e)[:300])
    scols, ocols = sorted(sdf.columns), sorted(odf.columns)
    if scols != ocols:
        return (name, 'schema', f'{scols} vs {ocols}')
    srows = sorted([tuple(norm(v) for v in r) for r in sdf[scols].itertuples(index=False)], key=repr)
    orows = sorted([tuple(norm(v) for v in r) for r in odf[scols].itertuples(index=False)], key=repr)
    if srows != orows:
        diff = [(a, b) for a, b in zip(srows, orows) if a != b][:2]
        return (name, 'values', f'{len(srows)} vs {len(orows)} rows; first diffs {str(diff)[:300]}')
    return None

with ProcessPoolExecutor(max_workers=N_WORKERS) as pool:
    results = list(pool.map(check, sorted(oracle.items())))
bad0 = [r for r in results if r is not None]
# DuckDB's allocator can fragment inside a long-lived worker until a
# KB-sized malloc fails with >100 GB free (the documented map-ceiling
# class) — an INTERMITTENT runtime failure, not a result mismatch.
# Retry exactly those once, each in a FRESH process with the full
# memory budget; genuine SQL errors reproduce and still fail.
retry = [b for b in bad0 if b[1] == 'oracle_sql_error'
         and ('bad allocation' in b[2] or 'Out of Memory' in b[2])]
if retry:
    print(f"retrying {len(retry)} allocator-flaked: {[b[0] for b in retry]}",
          file=sys.stderr)
    retried = {}
    for b in retry:
        with ProcessPoolExecutor(max_workers=1) as p1:
            retried[b[0]] = list(p1.map(check, [(b[0], oracle[b[0]])]))[0]
    bad0 = [retried.get(b[0], b) if b in retry else b for b in bad0]
    bad0 = [b for b in bad0 if b is not None]
bad = sorted(bad0)
ok = [n for n in oracle if n not in {b[0] for b in bad}]

print(f"MATCH {len(ok)}/{len(oracle)}")
for b in bad: print("MISMATCH", b)
dirs = [os.path.basename(d) for d in glob.glob(f'{out_dir}/*') if os.path.isdir(d)]
no_oracle = sorted(set(dirs) - set(oracle))
print("no_oracle:", no_oracle)
# an output dir with no oracle entry = a query shipped unverified
# (dropped/typo'd oracleSql key) — that is a FAILURE, not a footnote
sys.exit(1 if (bad or no_oracle) else 0)
