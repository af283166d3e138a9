#!/usr/bin/env python3
"""Local pre-flight for the driver's DuckDB oracle gate.

Reads the parquet outputs Verify.scala wrote plus oracle_sql.json, runs each
oracle statement in DuckDB over the same sf tables, and compares values
(column-name-sorted, exact after string normalization) — mimicking the
driver's hash compare so mismatches surface before the round gate.
Driver-side tooling only; the shipped Scala library does not depend on this.
"""
import sys, os, json, glob
import duckdb
import pyarrow.parquet as pq

def norm(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        return repr(v)
    return str(v)

# DuckDB types whose driver-hash serialization differs from any Spark type:
# sum(BIGINT) silently widens to HUGEINT (int128) and DECIMAL never matches
# LongType/DoubleType — both hash-mismatch at the round gate even when the
# str()-normalized values above compare equal. Flag them as hard failures.
BANNED_DUCK_TYPES = ("HUGEINT", "DECIMAL")

def banned_cols(con, sql):
    rel = con.sql(sql)
    return [(c, str(t)) for c, t in zip(rel.columns, rel.types)
            if any(b in str(t).upper() for b in BANNED_DUCK_TYPES)]

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for p in glob.glob(os.path.join(sf_dir, "*.parquet")):
        name = os.path.basename(p)[:-len(".parquet")]
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    n_ok = n_bad = 0
    for name in sorted(os.listdir(out_dir)):
        d = os.path.join(out_dir, name)
        if not os.path.isdir(d):
            continue
        files = glob.glob(os.path.join(d, "*.parquet"))
        if not files:
            print(f"MISSING-OUTPUT {name}")
            n_bad += 1
            continue
        spark_tbl = pq.read_table(files[0])
        spark_cols = sorted(spark_tbl.column_names)
        spark_rows = [[norm(v) for v in row] for row in
                      zip(*[spark_tbl.column(c).to_pylist() for c in spark_cols])]
        if name not in oracle:
            print(f"ROWS-ONLY     {name}: {len(spark_rows)} rows")
            continue
        try:
            skew = banned_cols(con, oracle[name])
            res = con.execute(oracle[name])
            cols = [d[0] for d in res.description]
            data = res.fetchall()
        except Exception as e:
            print(f"ORACLE-ERROR  {name}: {e}")
            n_bad += 1
            continue
        if skew:
            print(f"TYPE-SKEW     {name}: duck cols {skew} would hash-mismatch "
                  f"(cast to BIGINT/DOUBLE in the oracle SQL)")
            n_bad += 1
            continue
        order = sorted(range(len(cols)), key=lambda i: cols[i])
        duck_cols = [cols[i] for i in order]
        duck_rows = [[norm(row[i]) for i in order] for row in data]
        if duck_cols != spark_cols:
            print(f"COL-MISMATCH  {name}: spark={spark_cols} duck={duck_cols}")
            n_bad += 1
            continue
        if duck_rows == spark_rows:
            print(f"OK            {name}: {len(spark_rows)} rows")
            n_ok += 1
        else:
            n_bad += 1
            if len(duck_rows) != len(spark_rows):
                print(f"ROWCOUNT      {name}: spark={len(spark_rows)} duck={len(duck_rows)}")
            else:
                for i, (a, b) in enumerate(zip(spark_rows, duck_rows)):
                    if a != b:
                        print(f"VAL-MISMATCH  {name}: row {i} cols {spark_cols}\n  spark={a}\n  duck ={b}")
                        break
    print(f"\n{n_ok} ok, {n_bad} bad")
    return 1 if n_bad else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
