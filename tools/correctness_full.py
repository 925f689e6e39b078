"""Full-surface correctness table: run EVERY __spark_entry__.queries()
entry against its DuckDB oracle at sf0.01 (the driver gate scale) AND
sf0.1 (the bench scale), recording row counts, value hashes (sorted
columns + rows, %.17g floats — the driver's compare), and match
verdicts.  Output: CORRECTNESS_full_r{N}.json at the repo root.

This closes the gate-sampling evidence gap (the driver samples ~50 of
the queries per round): every query has a current-round hash record
in-repo.  Usage:

    python tools/correctness_full.py r05 [sf0.01 sf0.1]
"""

import hashlib
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def value_hash(df) -> str:
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return hashlib.md5(df.to_csv(
        index=False, float_format="%.17g").encode()).hexdigest()


def main() -> int:
    import duckdb

    import __spark_entry__ as mod
    from s2spark.session import get_spark

    tag = sys.argv[1] if len(sys.argv) > 1 else "r00"
    sfs = sys.argv[2:] or ["sf0.01", "sf0.1"]
    spark = get_spark("correctness-full")
    oracles = mod.oracle_sql()
    out = {"tag": tag, "scales": {}}
    nfail = 0
    for sf in sfs:
        sf_dir = f"/root/testdata/{sf}"
        con = duckdb.connect()
        for t in ("region nation customer supplier part orders "
                  "lineitem events documents embeddings").split():
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                        f"'{sf_dir}/{t}.parquet'")
        table = {}
        for name, fn in mod.queries().items():
            t0 = time.time()
            got = fn(spark, sf_dir).toPandas()
            spark_sec = round(time.time() - t0, 2)
            h = value_hash(got)
            rec = {"rows": len(got), "hash": h, "spark_sec": spark_sec}
            if name in oracles:
                t0 = time.time()
                want = con.execute(oracles[name]).fetchdf()
                rec["oracle_sec"] = round(time.time() - t0, 2)
                rec["match"] = bool(h == value_hash(want))
                nfail += (not rec["match"])
            else:
                rec["match"] = None  # rows-only by contract
            table[name] = rec
            print(f"{sf} {name:28s} rows={rec['rows']:8d} "
                  f"match={rec['match']} {spark_sec:7.1f}s", flush=True)
        out["scales"][sf] = table
        con.close()
    out["nfail"] = nfail
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), f"CORRECTNESS_full_{tag}.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
    print(f"WROTE {path} nfail={nfail}", flush=True)
    spark.stop()
    return 1 if nfail else 0


if __name__ == "__main__":
    raise SystemExit(main())
