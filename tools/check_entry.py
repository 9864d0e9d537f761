"""Driver-mimic: run each __spark_entry__ query against its DuckDB
oracle at sf0.01 and compare row-count + schema + order-insensitive
values. Rows-only queries (no DuckDB oracle) are verified against the
COMMITTED pure-Python fixtures in tests/fixtures/pinned_expected.json
(regenerate with tools/pin_fixtures.py — no Spark involved), so every
query has driver-side ground truth. Usage:
python tools/check_entry.py [only_query ...]
"""

from __future__ import annotations

import os
import sys
import time

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SF_DIR", "/root/testdata/sf0.01")
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def norm_cell(v):
    import datetime
    import math

    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return round(v, 9)
    if isinstance(v, datetime.datetime):
        return v.isoformat()
    return v


def df_to_multiset(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(
        tuple(norm_cell(r[i]) for i in order) for r in rows
    )


def _fx_cell(v):
    # fixtures carry floats rounded at 6 decimals by construction;
    # compare at 5 to absorb last-ulp summation-order differences
    return round(v, 5) if isinstance(v, float) else v


def _fixture_multiset(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(_fx_cell(r[i]) for i in order) for r in rows)


def _load_fixtures():
    p = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     "tests", "fixtures", "pinned_expected.json")
    if not os.path.exists(p):
        return {}
    import json

    with open(p) as f:
        return json.load(f)


FIXTURES = _load_fixtures()


def main():
    import __spark_entry__ as entrymod
    from ela_lib_spark.session import get_spark

    only = set(sys.argv[1:])
    spark = get_spark("check_entry", master="local[8]", shuffle_partitions=8,
                      driver_memory="8g")
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(SF_DIR, f"{t}.parquet")
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.monotonic()
        try:
            sdf = fn(spark, SF_DIR)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:
            failures.append((name, f"SPARK ERROR: {e}"))
            print(f"FAIL {name}: spark error {e}")
            continue
        el = time.monotonic() - t0
        if name not in oracles:
            fx = FIXTURES.get(name)
            if fx is not None and SF_DIR == FIXTURES.get("sf_dir"):
                fcols = [c.lower() for c in fx["columns"]]
                if sorted(c.lower() for c in scols) != sorted(fcols):
                    failures.append((name, f"fixture schema: spark={scols} "
                                           f"fixture={fcols}"))
                    print(f"FAIL {name}: fixture schema mismatch")
                    continue
                ms = _fixture_multiset([c.lower() for c in scols], srows)
                mf = _fixture_multiset(fcols, fx["rows"])
                if ms != mf:
                    diff = [(a, b) for a, b in zip(ms, mf) if a != b][:3]
                    failures.append((name, f"fixture values differ, "
                                           f"first={diff}"))
                    print(f"FAIL {name}: fixture values differ e.g. {diff}")
                    continue
                print(f"OK   {name}: {len(srows)} rows match pinned fixture "
                      f"({el:.1f}s)")
                continue
            print(f"OK   {name}: rows-only, {len(srows)} rows ({el:.1f}s)")
            if len(srows) == 0 and name not in ("q_simhash_pairs",):
                failures.append((name, "rows-only query returned 0 rows"))
            continue
        try:
            ddf = con.sql(oracles[name])
            dcols = [c.lower() for c in ddf.columns]
            drows = ddf.fetchall()
        except Exception as e:
            failures.append((name, f"DUCKDB ERROR: {e}"))
            print(f"FAIL {name}: duckdb error {e}")
            continue
        if sorted(c.lower() for c in scols) != sorted(dcols):
            failures.append((name, f"schema: spark={scols} duckdb={dcols}"))
            print(f"FAIL {name}: schema spark={scols} duckdb={dcols}")
            continue
        if len(srows) != len(drows):
            failures.append((name, f"rowcount spark={len(srows)} duckdb={len(drows)}"))
            print(f"FAIL {name}: rowcount spark={len(srows)} duckdb={len(drows)}")
            continue
        ms = df_to_multiset([c.lower() for c in scols], srows)
        md = df_to_multiset(dcols, drows)
        if ms != md:
            diff = [(a, b) for a, b in zip(ms, md) if a != b][:3]
            failures.append((name, f"values differ, first={diff}"))
            print(f"FAIL {name}: values differ e.g. {diff}")
            continue
        print(f"OK   {name}: {len(srows)} rows match ({el:.1f}s)")

    print("\n==", "ALL OK" if not failures else f"{len(failures)} FAILURES")
    for n, m in failures:
        print(" -", n, ":", m[:300])
    spark.stop()
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
