#!/usr/bin/env python3
"""Local replica of the driver's correctness gate (driver-side tooling,
not part of the Scala library): run graft.Verify's parquet dumps against
the DuckDB oracles in oracle_sql.json and compare rows/schema/values.

Usage: python3 tools/compare.py <sfDir> <verifyOutDir>
"""
import json, sys, math
import duckdb
import pyarrow.parquet as pq

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def canon(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    if isinstance(v, list):
        return "[" + ",".join(canon(x) for x in v) + "]"
    return str(v)

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    results = {}
    n_pass = 0
    for name, sql in sorted(oracles.items()):
        r = {"rows_match": False, "schema_match": False,
             "hash_match": False, "err": None}
        try:
            spark_tbl = pq.read_table(f"{out_dir}/{name}")
            o = con.execute(sql).fetch_arrow_table()
            s_cols = sorted(spark_tbl.column_names)
            o_cols = sorted(o.column_names)
            r["spark_rows"] = spark_tbl.num_rows
            r["oracle_rows"] = o.num_rows
            r["rows_match"] = spark_tbl.num_rows == o.num_rows
            r["schema_match"] = s_cols == o_cols
            if r["rows_match"] and r["schema_match"]:
                def rowset(tbl, cols):
                    pl = tbl.select(cols).to_pylist()
                    return sorted(tuple(canon(row[c]) for c in cols)
                                  for row in pl)
                sr = rowset(spark_tbl, s_cols)
                orr = rowset(o, o_cols)
                r["hash_match"] = sr == orr
                if not r["hash_match"]:
                    diffs = [(a, b) for a, b in zip(sr, orr) if a != b]
                    r["err"] = f"{len(diffs)} differing rows; first: {diffs[0] if diffs else '?'}"[:400]
        except Exception as e:
            r["err"] = str(e)[:400]
        results[name] = r
        ok = r["rows_match"] and r["schema_match"] and r["hash_match"]
        n_pass += ok
        print(f"{'PASS' if ok else 'FAIL'} {name} "
              f"rows={r.get('spark_rows')}/{r.get('oracle_rows')} "
              f"{'' if ok else r['err']}")
    print(f"\n{n_pass}/{len(oracles)} pass")
    json.dump(results, open(f"{out_dir}/compare.json", "w"), indent=1)

if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
