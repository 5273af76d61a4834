#!/usr/bin/env python3
"""Local replica of the driver's correctness gate (driver-side tooling,
not part of the Scala library): run graft.Verify's parquet dumps against
the DuckDB oracles in oracle_sql.json and compare rows/schema/values.

Usage: python3 tools/compare.py <sfDir> <verifyOutDir>
"""
import json, sys, math
import duckdb
import pyarrow as pa
import pyarrow.parquet as pq


def driver_unsafe(tbl, side):
    """Mimic the driver's pandas comparator limits: it cannot hash
    DECIMAL/HUGEINT columns consistently (r6 q110) and cannot sort a
    multi-row nested column at all (r6 q128). Flag both shapes as
    failures so this local gate is never greener than the driver's."""
    reasons = []
    for field in tbl.schema:
        t = field.type
        if pa.types.is_decimal(t):
            reasons.append(f"{side} decimal column '{field.name}'")
        if pa.types.is_nested(t) and tbl.num_rows > 1:
            reasons.append(
                f"{side} multi-row nested column '{field.name}'")
    return reasons

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
            unsafe = (driver_unsafe(spark_tbl, "spark")
                      + driver_unsafe(o, "oracle"))
            if unsafe:
                raise RuntimeError(
                    "driver-comparator-unsafe output: " + "; ".join(unsafe))
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
