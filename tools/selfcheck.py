#!/usr/bin/env python3
"""Local imitation of the driver's correctness gate: run each oracle SQL in
DuckDB over the sf parquet tables, load the Spark result parquet, sort
columns by name, and compare. NOT part of the engine — dev tooling only."""
import duckdb, json, sys, glob, math

sfdir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
outdir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"

con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders","lineitem","events","documents","embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))
names = sorted(set(list(oracle.keys()) + [p.split('/')[-1] for p in glob.glob(f"{outdir}/q*")]))

def canon(v):
    if isinstance(v, float):
        if math.isnan(v): return "NaN"
        return repr(round(v, 9))
    return repr(v)

fails = 0
for name in names:
    spark_files = glob.glob(f"{outdir}/{name}/*.parquet")
    if not spark_files:
        print(f"FAIL {name}: no spark output"); fails += 1; continue
    sdf = con.execute(f"SELECT * FROM '{outdir}/{name}/*.parquet'").fetch_arrow_table()
    if name not in oracle:
        print(f"SKIP {name}: no oracle ({sdf.num_rows} rows)"); continue
    try:
        odf = con.execute(oracle[name]).fetch_arrow_table()
    except Exception as e:
        print(f"FAIL {name}: oracle error {e}"); fails += 1; continue
    scols, ocols = sorted(sdf.column_names), sorted(odf.column_names)
    if scols != ocols:
        print(f"FAIL {name}: cols spark={scols} oracle={ocols}"); fails += 1; continue
    if sdf.num_rows != odf.num_rows:
        print(f"FAIL {name}: rows spark={sdf.num_rows} oracle={odf.num_rows}"); fails += 1; continue
    sdata = [[canon(v) for v in sdf.column(c).to_pylist()] for c in scols]
    odata = [[canon(v) for v in odf.column(c).to_pylist()] for c in ocols]
    stypes = {c: str(sdf.schema.field(c).type) for c in scols}
    otypes = {c: str(odf.schema.field(c).type) for c in ocols}
    if sdata == odata:
        tnote = "" if stypes == otypes else f"  [type diff: { {c:(stypes[c],otypes[c]) for c in scols if stypes[c]!=otypes[c]} }]"
        print(f"OK   {name}: {sdf.num_rows} rows{tnote}")
    else:
        fails += 1
        for ci, c in enumerate(scols):
            diffs = [(i, sdata[ci][i], odata[ci][i]) for i in range(len(sdata[ci])) if sdata[ci][i] != odata[ci][i]][:3]
            if diffs:
                print(f"FAIL {name}: col {c} first diffs {diffs}")
print(f"\n{fails} failures / {len(names)} queries")
sys.exit(1 if fails else 0)
