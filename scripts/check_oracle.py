#!/usr/bin/env python3
"""Dev-only pre-flight mirror of the driver's correctness gate.

NOT part of the engine (the engine is pure Scala/Spark). This script
replays what the driver does with a Verify output directory: register the
testdata parquet tables in DuckDB, run each oracle SQL, and value-compare
against the Spark parquet result (columns sorted by name, rows as
written). Usage:

    python3 scripts/check_oracle.py /root/testdata/sf0.001 /tmp/verify_out
"""
import json
import math
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    # Decimal, date, datetime, str, int -> canonical string
    return str(v)


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    failures = 0
    for name, sql in sorted(oracle.items()):
        try:
            want = con.execute(sql).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            failures += 1
            continue
        got = con.execute(
            f"SELECT * FROM '{out_dir}/{name}/*.parquet'").fetchdf()
        wcols, gcols = sorted(want.columns), sorted(got.columns)
        if wcols != gcols:
            print(f"FAIL {name}: columns differ: spark={gcols} oracle={wcols}")
            failures += 1
            continue
        if len(want) != len(got):
            print(f"FAIL {name}: rows differ: spark={len(got)} oracle={len(want)}")
            failures += 1
            continue
        w = want[wcols].values.tolist()
        g = got[gcols].values.tolist()
        bad = 0
        for i, (rw, rg) in enumerate(zip(w, g)):
            nw = [norm(x) for x in rw]
            ng = [norm(x) for x in rg]
            if nw != ng:
                if bad == 0:
                    print(f"FAIL {name}: first diff at row {i}:")
                    print(f"  oracle: {nw}")
                    print(f"  spark : {ng}")
                bad += 1
        if bad:
            print(f"FAIL {name}: {bad}/{len(w)} rows differ")
            failures += 1
        else:
            print(f"OK   {name} ({len(w)} rows)")
    print(f"\n{len(oracle) - failures}/{len(oracle)} queries match")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
