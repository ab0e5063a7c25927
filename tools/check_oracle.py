#!/usr/bin/env python3
"""Local mirror of the driver's correctness gate.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>

Loads <verifyOutDir>/oracle_sql.json, registers each testdata table as a
DuckDB view over <sfDir>/<name>.parquet, runs every oracle, and compares
with the Spark result parquet under <verifyOutDir>/<query>/ — values
compared exactly (row order AND a row-sorted fallback). DuckDB result
types are compared as a HARD failure (TYPE-DIFF): the driver's gate
hashes typed values, so e.g. an uncast HUGEINT arithmetic result in the
oracle vs a BIGINT Spark column is a red row there even when the Python
values are equal ints — this mirror must catch exactly that class.
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


def kind_of(t):
    """Representation class a DuckDB type lands in when the driver
    materializes results (pandas/arrow): the classes whose stringified
    values diverge even when the Python ints are equal. HUGEINT is the
    canonical trap — pandas has no int128, so it becomes float64 and
    `3000.0` hashes differently from BIGINT's `3000`."""
    t = t.upper()
    if t in ("TINYINT", "SMALLINT", "INTEGER", "BIGINT",
             "UTINYINT", "USMALLINT", "UINTEGER", "UBIGINT"):
        return "int"
    if t in ("HUGEINT", "UHUGEINT", "FLOAT", "DOUBLE") or t.startswith("DECIMAL"):
        return "float"
    if t == "BOOLEAN":
        return "bool"
    if t.startswith(("DATE", "TIMESTAMP", "TIME", "INTERVAL")):
        return "datetime"
    return "other"  # VARCHAR, BLOB, LIST, STRUCT, MAP, …


def rows_of(rel):
    """rel is a DuckDB relation (con.sql(...)): exposes exact DuckDB
    column types, unlike the DB-API cursor whose description collapses
    HUGEINT/BIGINT/etc. into generic codes."""
    cols = list(rel.columns)
    types = [str(t) for t in rel.types]
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    data = rel.fetchall()
    return ([cols[i] for i in order], [types[i] for i in order],
            [tuple(canon(r[i]) for i in order) for r in data])


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
            scols, stypes, srows = rows_of(con.sql(
                f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')"))
            ocols, otypes, orows = rows_of(con.sql(oracle[name]))
        except Exception as e:
            print(f"ERROR          {name}: {e}")
            n_bad += 1
            continue
        if scols != ocols:
            print(f"SCHEMA-DIFF    {name}: spark={scols} oracle={ocols}")
            n_bad += 1
            continue
        skinds = [kind_of(t) for t in stypes]
        okinds = [kind_of(t) for t in otypes]
        if skinds != okinds:
            diffs = [f"{c}: spark={a}({ka}) oracle={b}({kb})"
                     for c, a, b, ka, kb
                     in zip(scols, stypes, otypes, skinds, okinds)
                     if ka != kb]
            print(f"TYPE-DIFF      {name}: {'; '.join(diffs)}")
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
