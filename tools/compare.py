#!/usr/bin/env python3
"""Dev-only harness mirroring the driver's correctness gate (not part of
the engine): run each oracle SQL in DuckDB over the sf parquet tables and
compare against the Verify.scala parquet dumps (columns sorted by name,
values compared after the queries' own rounding conventions)."""
import json, math, sys
import duckdb

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return None
        return round(v, 9)
    return v

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_ok = 0
    for name, sql in sorted(oracle.items()):
        try:
            odf = con.execute(sql).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {e}")
            continue
        try:
            sdf = con.execute(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet'").fetchdf()
        except Exception as e:
            print(f"FAIL {name}: spark result unreadable: {e}")
            continue
        ocols, scols = sorted(odf.columns), sorted(sdf.columns)
        if ocols != scols:
            print(f"FAIL {name}: schema {scols} vs oracle {ocols}")
            continue
        if len(odf) != len(sdf):
            print(f"FAIL {name}: rows {len(sdf)} vs oracle {len(odf)}")
            continue
        orows = [tuple(norm(v) for v in r) for r in odf[ocols].itertuples(index=False)]
        srows = [tuple(norm(v) for v in r) for r in sdf[ocols].itertuples(index=False)]
        bad = [(i, a, b) for i, (a, b) in enumerate(zip(orows, srows)) if a != b]
        if bad:
            i, a, b = bad[0]
            print(f"FAIL {name}: {len(bad)}/{len(orows)} rows differ; first at {i}:\n  oracle {a}\n  spark  {b}")
            continue
        print(f"OK   {name} ({len(odf)} rows)")
        n_ok += 1
    print(f"== {n_ok}/{len(oracle)} queries match")
    return 0 if n_ok == len(oracle) else 1

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
