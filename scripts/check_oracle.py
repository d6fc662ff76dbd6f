"""Local stand-in for the driver's correctness gate: run every
``queries()`` entry on Spark and its ``oracle_sql()`` on DuckDB at the
given sf dir, compare row count + column names + order-insensitive
value hash. Usage: python scripts/check_oracle.py [sf_dir] [only...]

``--past-cap`` runs EXACTLY the registry entries past the driver
gate's 50-entry recording window — the queries whose only automated
correctness check is this script (each is documented in queries() as
subsumed by an in-window sibling, but subsumption is an argument, not
a hash). tests/test_past_cap_oracle.py wires this into pytest so the
full registry stays continuously green without judge intervention."""

from __future__ import annotations

import hashlib
import math
import sys
import time

sys.path.insert(0, ".")

import duckdb  # noqa: E402

import __spark_entry__ as entrymod  # noqa: E402
from parquet_producers_spark.session import get_spark  # noqa: E402

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def norm_cell(v):
    if v is None:
        return "∅"
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        # normalize -0.0 and represent with fixed precision
        if v == 0:
            v = 0.0
        return f"{v:.6g}"
    if isinstance(v, bytes):
        return v.hex()
    return str(v)


def value_hash(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted(
        "\x1f".join(norm_cell(r[i]) for i in order) for r in rows
    )
    h = hashlib.sha256()
    for ln in lines:
        h.update(ln.encode())
        h.update(b"\n")
    return h.hexdigest()


GATE_CAP = 50  # the driver's correctness gate records this many entries


def main():
    args = [a for a in sys.argv[1:] if a != "--past-cap"]
    past_cap = "--past-cap" in sys.argv[1:]
    sf = args[0] if args else "/root/testdata/sf0.01"
    only = set(args[1:])
    if past_cap:
        only = set(list(entrymod.queries())[GATE_CAP:]) | only
        print(f"past-cap set ({len(only)}): {sorted(only)}")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')"
        )
    spark = get_spark("oracle-check")
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        df = fn(spark, sf)
        cols = df.columns
        rows = [tuple(r) for r in df.collect()]
        t1 = time.time()
        if name not in oracles:
            print(f"{name:28s} rows-only: {len(rows)} rows "
                  f"({t1 - t0:.1f}s spark)")
            if len(rows) == 0 and name != "dedup_exact":
                print(f"   WARNING: empty result")
            continue
        ocols = None
        try:
            res = con.execute(oracles[name])
            ocols = [d[0] for d in res.description]
            orows = res.fetchall()
        except Exception as e:
            failures.append(name)
            print(f"{name:28s} ORACLE SQL ERROR: {str(e)[:160]}")
            continue
        t2 = time.time()
        ok_cols = sorted(cols) == sorted(ocols)
        ok_rows = len(rows) == len(orows)
        ok_hash = value_hash(rows, cols) == value_hash(orows, ocols)
        status = "OK" if (ok_cols and ok_rows and ok_hash) else "FAIL"
        print(f"{name:28s} {status}  spark={len(rows)}r/{t1-t0:.1f}s "
              f"duck={len(orows)}r/{t2-t1:.1f}s cols={ok_cols} hash={ok_hash}")
        if status == "FAIL":
            failures.append(name)
            if not ok_cols:
                print(f"   spark cols: {sorted(cols)}")
                print(f"   duck  cols: {sorted(ocols)}")
            sample_s = sorted(rows)[:3]
            sample_d = sorted(orows)[:3]
            print(f"   spark sample: {sample_s}")
            print(f"   duck  sample: {sample_d}")
    spark.stop()
    print("\nFAILURES:", failures if failures else "none")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
