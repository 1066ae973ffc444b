#!/usr/bin/env python3
"""Dev-side replica of the driver's DuckDB oracle compare.

Usage: python3 tools/compare.py /tmp/vout /root/testdata/sf0.01

Loads each <out>/<query>/ parquet (Spark result), runs the matching SQL from
<out>/oracle_sql.json in DuckDB over the sf tables, sorts columns by name and
rows by value, and reports exact-match status per query.
"""
import sys, os, json, math
import duckdb

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        vals = []
        for i in order:
            v = r[i]
            if isinstance(v, float) and math.isnan(v):
                v = "NaN"
            vals.append(repr(v))
        out.append("|".join(vals))
    return sorted(out), [cols[i] for i in order]

def main(outdir, sfdir):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sfdir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    n_ok = 0
    for name, sql in sorted(oracle.items()):
        spark_dir = f"{outdir}/{name}"
        if not os.path.isdir(spark_dir):
            print(f"{name:28s} MISSING spark output")
            continue
        try:
            # go through pandas like the driver does: DuckDB HUGEINT (e.g.
            # sum of integers) becomes float64 there, so an int64-vs-HUGEINT
            # schema divergence must FAIL here too (tx03 r1-r3 lesson)
            sdf = con.execute(
                f"SELECT * FROM read_parquet('{spark_dir}/*.parquet')").df()
            scols = list(sdf.columns)
            srows = list(sdf.itertuples(index=False, name=None))
            odf = con.execute(sql).df()
            ocols = list(odf.columns)
            orows = list(odf.itertuples(index=False, name=None))
        except Exception as e:
            print(f"{name:28s} ERROR {e}")
            continue
        sc, scn = canon(srows, scols)
        oc, ocn = canon(orows, ocols)
        schema_ok = scn == ocn
        rows_ok = len(sc) == len(oc)
        hash_ok = sc == oc
        if schema_ok and hash_ok:
            n_ok += 1
            print(f"{name:28s} OK    rows={len(sc)}")
        else:
            print(f"{name:28s} FAIL  schema_ok={schema_ok} rows {len(sc)}/{len(oc)} hash_ok={hash_ok}")
            if not schema_ok:
                print(f"   spark cols: {scn}\n   duck  cols: {ocn}")
            else:
                diff = [(a, b) for a, b in zip(sc, oc) if a != b][:3]
                for a, b in diff:
                    print(f"   spark: {a}\n   duck : {b}")
    print(f"== {n_ok}/{len(oracle)} OK ==")

if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
