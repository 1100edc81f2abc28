#!/usr/bin/env python3
"""Cross-check Spark query outputs against the DuckDB oracle.

Usage: python3 scripts/oracle_check.py [verify_out_dir] [sf_dir]
(after `sbt -batch "runMain graft.Verify <sf_dir> <verify_out_dir>"`)
"""
import duckdb, json, glob, os, sys, decimal

out_dir = sys.argv[1] if len(sys.argv) > 1 else '/tmp/verify_out'
sf_dir = sys.argv[2] if len(sys.argv) > 2 else '/root/testdata/sf0.01'

con = duckdb.connect()
for f in glob.glob(f'{sf_dir}/*.parquet'):
    name = os.path.basename(f).replace('.parquet', '')
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{f}')")
oracle = json.load(open(f'{out_dir}/oracle_sql.json'))
ok, bad = [], []

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

for name, sql in sorted(oracle.items()):
    try:
        sdf = con.execute(f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')").fetchdf()
    except Exception as e:
        # Verify deletes the output dir when a query throws — a missing
        # dir means THAT query failed, not that the harness broke
        bad.append((name, 'missing_output', str(e)[:200])); continue
    try:
        offenders = [(r[0], r[1]) for r in
                     con.execute(f"DESCRIBE {sql}").fetchall()
                     if any(str(r[1]).upper().startswith(b) for b in BANNED_TYPES)]
        if offenders:
            bad.append((name, 'oracle_type', f'banned output types {offenders} - CAST to BIGINT/DOUBLE')); continue
        odf = con.execute(sql).fetchdf()
    except Exception as e:
        bad.append((name, 'oracle_sql_error', str(e)[:300])); continue
    scols, ocols = sorted(sdf.columns), sorted(odf.columns)
    if scols != ocols:
        bad.append((name, 'schema', f'{scols} vs {ocols}')); continue
    srows = sorted([tuple(norm(v) for v in r) for r in sdf[scols].itertuples(index=False)], key=repr)
    orows = sorted([tuple(norm(v) for v in r) for r in odf[scols].itertuples(index=False)], key=repr)
    if srows != orows:
        diff = [(a, b) for a, b in zip(srows, orows) if a != b][:2]
        bad.append((name, 'values', f'{len(srows)} vs {len(orows)} rows; first diffs {str(diff)[:300]}')); continue
    ok.append(name)

print(f"MATCH {len(ok)}/{len(oracle)}")
for b in bad: print("MISMATCH", b)
dirs = [os.path.basename(d) for d in glob.glob(f'{out_dir}/*') if os.path.isdir(d)]
no_oracle = sorted(set(dirs) - set(oracle))
print("no_oracle:", no_oracle)
# an output dir with no oracle entry = a query shipped unverified
# (dropped/typo'd oracleSql key) — that is a FAILURE, not a footnote
sys.exit(1 if (bad or no_oracle) else 0)
