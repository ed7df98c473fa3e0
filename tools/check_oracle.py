#!/usr/bin/env python3
"""Dev-only pre-check of the DuckDB oracle parity (mirrors the driver's
correctness gate). NOT part of the Scala library — the library is pure
Spark; this script only exists so oracle-SQL dialect bugs are caught
before the driver runs CORRECTNESS_r{N}.json.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir> [i/n]

The optional `i/n` shard (e.g. 0/4 .. 3/4) checks every n-th query
starting at i — the per-round sf0.1 batch sweep fans the heavyweight
all-pairs oracles across processes (DuckDB parallelizes WITHIN a query,
but the quadratic list_intersect oracles are long serial tails; four
shards keep all cores busy for hours less wall-clock). GRAFT_DUCKDB_THREADS
caps each shard's thread pool so shards don't thrash each other.
"""
import duckdb, json, sys, math, os

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def norm(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # exact-bits compare for doubles, like a hash would see
        return repr(v)
    return str(v)

def main(sf_dir, out_dir, shard=None):
    con = duckdb.connect()
    thr = os.environ.get("GRAFT_DUCKDB_THREADS")
    if thr:
        con.sql(f"SET threads={int(thr)}")
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    names = sorted(oracle)
    if shard:
        i, n = shard
        names = [x for k, x in enumerate(names) if k % n == i]
    n_bad = 0
    for name in names:
        try:
            spark_rel = con.sql(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet'")
            scols = sorted(spark_rel.columns)
            a = spark_rel.df()[scols]
            duck_rel = con.sql(oracle[name])
            dcols = sorted(duck_rel.columns)
            b = duck_rel.df()[dcols]
        except Exception as e:
            print(f"FAIL {name}: {type(e).__name__}: {e}")
            n_bad += 1
            continue
        if scols != dcols:
            print(f"FAIL {name}: columns spark={scols} duck={dcols}")
            n_bad += 1
            continue
        av = [tuple(norm(x) for x in row) for row in a.itertuples(index=False)]
        bv = [tuple(norm(x) for x in row) for row in b.itertuples(index=False)]
        if len(av) != len(bv):
            print(f"FAIL {name}: rows spark={len(av)} duck={len(bv)}")
            n_bad += 1
        elif av != bv:
            # row-order-sensitive compare first; fall back to sorted
            diffs = [i for i, (x, y) in enumerate(zip(av, bv)) if x != y]
            tag = "VALUES" if sorted(av) != sorted(bv) else "ORDER-ONLY"
            print(f"FAIL {name}: {tag} diff at rows {diffs[:5]} "
                  f"(of {len(diffs)})")
            for i in diffs[:3]:
                print(f"   spark={av[i]}\n   duck ={bv[i]}")
            n_bad += 1
        else:
            print(f"OK   {name}: {len(av)} rows")
    print(f"{'ALL OK' if n_bad == 0 else f'{n_bad} FAILURES'}")
    return n_bad

if __name__ == "__main__":
    shard = None
    if len(sys.argv) > 3:
        i, n = sys.argv[3].split("/")
        shard = (int(i), int(n))
    sys.exit(1 if main(sys.argv[1], sys.argv[2], shard) else 0)
