"""Partition-invariance / determinism sweep over the query registry.

The driver runs ``queries()`` under ITS session config, not ours, so any
result that depends on partition count or partition order (collect_list
without array_sort, first/any_value ties, unstable row_number ties,
min_by on duplicate keys) can be green locally and red at the driver.
This tool runs every registry query twice with a deliberately different
``spark.sql.shuffle.partitions`` (32 vs 17 — coprime, so reducer
assignment and therefore arrival order is thoroughly perturbed) and
compares the order-insensitive normalized results; a mismatch is a
determinism bug even when both runs would individually hash-match some
oracle ordering.

Usage: python tools/determinism_check.py [sf_dir] [query ...]
"""
from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tools")

from spark_streaming_testbed_spark.session import get_session  # noqa: E402

import __spark_entry__ as entrymod  # noqa: E402

from check_oracle import normalize  # noqa: E402  (same canon rules)


def main() -> int:
    from _guards import validate_sf_dir
    sf_dir = validate_sf_dir(sys.argv[1] if len(sys.argv) > 1
                             else "/root/testdata/sf0.001")
    only = set(sys.argv[2:])

    spark = get_session("determinism-check")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()

    n_pass = n_fail = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        runs = []
        try:
            for parts in ("32", "17"):
                spark.conf.set("spark.sql.shuffle.partitions", parts)
                sdf = fn(spark, sf_dir)
                runs.append(
                    normalize([tuple(r) for r in sdf.collect()], sdf.columns)
                )
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: error: {e}")
            n_fail += 1
            continue
        finally:
            spark.conf.set("spark.sql.shuffle.partitions", "32")
        if runs[0] == runs[1]:
            print(f"PASS {name}: stable across 32/17 partitions "
                  f"({time.time()-t0:.1f}s)")
            n_pass += 1
        else:
            a, b = runs
            diffs = [(x, y) for x, y in zip(a[1], b[1]) if x != y][:3]
            print(f"FAIL {name}: partition-count-dependent result; "
                  f"first diffs: {diffs}")
            n_fail += 1

    print(f"\n{n_pass} stable, {n_fail} partition-dependent")
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
