#!/usr/bin/env python3
"""Local mirror of the driver's correctness gate.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>

Loads <verifyOutDir>/oracle_sql.json, registers each testdata table as a
DuckDB view over <sfDir>/<name>.parquet, runs every oracle, and compares
with the Spark result parquet under <verifyOutDir>/<query>/ — values
compared exactly (row order AND a row-sorted fallback), dtypes reported.
"""
import json, sys, glob, os
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(v):
    import datetime, math
    if isinstance(v, (list, tuple)):
        return tuple(canon(x) for x in v)
    if hasattr(v, "tolist") and not isinstance(v, (str, bytes)):  # numpy scalar/array
        return canon(v.tolist())
    if isinstance(v, dict):
        return tuple(sorted((k, canon(x)) for k, x in v.items()))
    if isinstance(v, float) and math.isnan(v):
        return "NaN"
    return v


def rows_of(cur):
    cols = [d[0] for d in cur.description]
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    data = cur.fetchall()
    return [cols[i] for i in order], [tuple(canon(r[i]) for i in order) for r in data]


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_ok = n_bad = 0
    all_queries = sorted(d for d in os.listdir(out_dir)
                         if os.path.isdir(os.path.join(out_dir, d)))
    for name in all_queries:
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"MISSING-OUTPUT {name}")
            n_bad += 1
            continue
        if name not in oracle:
            cnt = con.execute(
                f"SELECT count(*) FROM read_parquet('{out_dir}/{name}/*.parquet')").fetchone()[0]
            print(f"ROWS-ONLY      {name}: {cnt} rows")
            continue
        try:
            scols, srows = rows_of(con.execute(
                f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')"))
            ocols, orows = rows_of(con.execute(oracle[name]))
        except Exception as e:
            print(f"ERROR          {name}: {e}")
            n_bad += 1
            continue
        if scols != ocols:
            print(f"SCHEMA-DIFF    {name}: spark={scols} oracle={ocols}")
            n_bad += 1
            continue
        if srows == orows:
            print(f"OK             {name}: {len(srows)} rows")
            n_ok += 1
        elif sorted(srows, key=repr) == sorted(orows, key=repr):
            print(f"OK-UNORDERED   {name}: {len(srows)} rows (row order differs!)")
            n_ok += 1
        else:
            n_bad += 1
            sset, oset = set(srows), set(orows)
            only_s = list(sset - oset)[:2]
            only_o = list(oset - sset)[:2]
            print(f"VALUE-DIFF     {name}: {len(srows)} spark vs {len(orows)} oracle rows")
            for r in only_s:
                print(f"   spark-only:  {r!r}"[:300])
            for r in only_o:
                print(f"   oracle-only: {r!r}"[:300])
            if not only_s and not only_o:
                for i, (a, b) in enumerate(zip(srows, orows)):
                    if a != b:
                        print(f"   first row diff at {i}:")
                        print(f"     spark:  {a!r}"[:300])
                        print(f"     oracle: {b!r}"[:300])
                        break
    print(f"\n{n_ok} ok, {n_bad} bad, "
          f"{len(all_queries) - len([q for q in all_queries if q in oracle])} rows-only")
    return 1 if n_bad else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
