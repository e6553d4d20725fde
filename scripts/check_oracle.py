"""Self-check: run every queries() entry vs its oracle_sql() on DuckDB,
mimicking the driver's correctness gate (row-count + schema + sorted
value comparison). Usage: python scripts/check_oracle.py [sf_dir] [names...]"""

import sys

sys.path.insert(0, "/root/repo")

import duckdb

import __spark_entry__ as E
from airbyte_spark.session import get_spark

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def norm(v):
    import datetime
    import math

    if isinstance(v, float):
        return round(v, 6) if math.isfinite(v) else str(v)
    if isinstance(v, datetime.datetime):
        return v.replace(tzinfo=None).isoformat()
    return v


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = get_spark("oracle-check", master="local[8]", shuffle_partitions=16)
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    qs, os_ = E.queries(), E.oracle_sql()
    fails = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            df = fn(spark, sf_dir)
            cols = sorted(df.columns)
            sort_key = lambda t: tuple((v is None, str(v)) for v in t)  # noqa: E731
            got = sorted(
                (tuple(norm(r[c]) for c in cols) for r in df.collect()), key=sort_key
            )
            if name not in os_:
                print(f"{name}: rows={len(got)} (no oracle — rows-only)")
                continue
            res = con.sql(os_[name])
            ocols = sorted(res.columns)
            idx = [res.columns.index(c) for c in ocols]
            want = sorted(
                (tuple(norm(row[i]) for i in idx) for row in res.fetchall()), key=sort_key
            )
            status = []
            if cols != ocols:
                status.append(f"SCHEMA got={cols} want={ocols}")
            if len(got) != len(want):
                status.append(f"ROWS got={len(got)} want={len(want)}")
            elif got != want:
                bad = sum(1 for a, b in zip(got, want) if a != b)
                status.append(f"VALUES {bad}/{len(got)} differ")
                for a, b in list(zip(got, want))[:2000]:
                    if a != b:
                        status.append(f"  got  {a}\n  want {b}")
                        break
            if status:
                fails += 1
                print(f"{name}: FAIL " + "; ".join(status[:3]))
            else:
                print(f"{name}: OK ({len(got)} rows)")
        except Exception as ex:  # noqa: BLE001
            fails += 1
            print(f"{name}: ERROR {type(ex).__name__}: {ex}")
    print("FAILS:", fails)
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()
