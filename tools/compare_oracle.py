"""Local stand-in for the driver's correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` twin on
DuckDB over the same parquet tables, then compares row count, column
names, and an order-insensitive value hash (columns sorted by name,
rows sorted, floats kept exact). Usage:

    python tools/compare_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import math
import os
import sys
import time

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def canon(rows, colnames, quantize=False):
    """Driver-style canonical hash. ``quantize=True`` is the
    fragility probe: floats collapsed (-0.0 → 0.0) and formatted at 9
    significant digits — if the exact hashes differ but the quantized
    ones agree, the query's values are right and its hash merely rides
    engine float-repr/tie-rounding, the failure mode that cost
    ts_moving_avg_24h its r4 driver row."""
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    out = []
    for r in rows:
        vals = []
        for i in order:
            v = r[i]
            if isinstance(v, float):
                vals.append(f"{v + 0.0:.9g}" if quantize else f"{v!r}")
            elif isinstance(v, bool):
                vals.append(str(int(v)))
            else:
                vals.append(str(v))
        out.append("|".join(vals))
    out.sort()
    return hashlib.sha1("\n".join(out).encode()).hexdigest()


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as e

    qs = e.queries()
    oracles = e.oracle_sql()
    unknown = sorted(only - set(qs))
    if unknown:
        # a typo'd name must not read as a green gate: with no match,
        # the loop would run nothing, print nothing, and exit 0 —
        # validated BEFORE the Spark session so the failure is instant
        print(f"unknown query name(s): {unknown}", file=sys.stderr)
        sys.exit(2)

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "8g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    con.execute("SET TimeZone='UTC'")
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.monotonic()
        sdf = fn(spark, sf_dir)
        scols = sdf.columns
        srows = [tuple(r) for r in sdf.collect()]
        t_spark = time.monotonic() - t0
        if name not in oracles:
            print(f"{name:28s} rows={len(srows):7d}  (rows-only, {t_spark:.1f}s)")
            continue
        t0 = time.monotonic()
        res = con.execute(oracles[name])
        ocols = [d[0] for d in res.description]
        orows = res.fetchall()
        t_duck = time.monotonic() - t0
        ok_cols = sorted(scols) == sorted(ocols)
        ok_rows = len(srows) == len(orows)
        h_s = canon(srows, scols)
        h_o = canon(orows, ocols)
        ok_hash = h_s == h_o
        status = "OK " if (ok_cols and ok_rows and ok_hash) else "FAIL"
        if status == "FAIL":
            failures += 1
        # fragility probes (the ts_moving_avg_24h r4 failure class):
        # values agree under 9-sig-digit quantization but exact reprs
        # differ → engine float-repr/tie-rounding, not wrong math; and
        # any emitted -0.0 is a latent hash hazard even when green.
        notes = []
        if not ok_hash and ok_rows and ok_cols:
            if canon(srows, scols, quantize=True) == canon(
                    orows, ocols, quantize=True):
                notes.append("FRAGILE-FLOAT (quantized hashes agree — "
                             "repr/rounding divergence, fix the "
                             "query's float canon, not the operator)")
        if any(isinstance(v, float) and v == 0.0
               and math.copysign(1.0, v) < 0
               for r in srows for v in r):
            notes.append("WARN: emits -0.0 (add the `+ 0.0` collapse)")
        print(
            f"{name:28s} {status} rows={len(srows)}/{len(orows)} "
            f"cols={'=' if ok_cols else f'{sorted(scols)} vs {sorted(ocols)}'} "
            f"hash={'=' if ok_hash else 'MISMATCH'} "
            f"({t_spark:.1f}s/{t_duck:.1f}s)"
        )
        for n in notes:
            print(f"   {n}")
        if not ok_hash and ok_rows and ok_cols:
            # show a few differing canonical lines for debugging
            so = sorted(
                "|".join(str(r[i]) for i in sorted(range(len(scols)), key=lambda i: scols[i]))
                for r in srows
            )
            oo = sorted(
                "|".join(str(r[i]) for i in sorted(range(len(ocols)), key=lambda i: ocols[i]))
                for r in orows
            )
            diff = [(a, b) for a, b in zip(so, oo) if a != b][:3]
            for a, b in diff:
                print(f"   spark: {a[:160]}")
                print(f"   duck : {b[:160]}")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
