"""Input-row-order invariance sweep (new evidence class, round 9).

At 100 TB, row order inside a parquet file is an accident of whichever
writer task produced it — nothing guarantees the order the small-SF
fixtures happen to carry. A query whose RESULT changes under a row
permutation therefore has a real scale bug: a window or keep-first
dedup anchored on physical order instead of an explicit key, a
``first()``/``limit`` without a total order, a stream replay chunked by
file position instead of event time.

This sweep permutes every table of the given sf dir with a fixed seed
(seed 777, one shuffle per table) into a temp copy, runs every registry
query on the pristine dir and the permuted dir, canonicalizes both with
the oracle checker's own rules (sorted columns, order-insensitive rows,
9 dp float fold), and reports any divergence.

Usage: python tools/order_invariance_check.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

import numpy as np
import pyarrow.parquet as pq

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
sys.path.insert(0, REPO)
sys.path.insert(0, HERE)

from check_oracle import normalize  # noqa: E402

import __spark_entry__ as entrymod  # noqa: E402
from spark_streaming_testbed_spark.session import get_session  # noqa: E402

PERMUTE_SEED = 777


def permute_tables(src: str, dst: str) -> None:
    rng = np.random.default_rng(PERMUTE_SEED)
    for f in sorted(os.listdir(src)):
        if not f.endswith(".parquet"):
            continue
        t = pq.read_table(os.path.join(src, f))
        t = t.take(rng.permutation(len(t)))
        pq.write_table(t, os.path.join(dst, f))


def main() -> int:
    from _guards import validate_sf_dir
    sf_dir = validate_sf_dir(sys.argv[1] if len(sys.argv) > 1
                             else "/root/testdata/sf0.01")
    only = set(sys.argv[2:])

    spark = get_session("order-invariance")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()

    n_pass = n_fail = 0
    with tempfile.TemporaryDirectory(prefix="order_inv_") as perm_dir:
        permute_tables(sf_dir, perm_dir)
        for name, fn in qs.items():
            if only and name not in only:
                continue
            t0 = time.time()
            try:
                a = fn(spark, sf_dir)
                a_cols, a_rows = a.columns, [tuple(r) for r in a.collect()]
                b = fn(spark, perm_dir)
                b_cols, b_rows = b.columns, [tuple(r) for r in b.collect()]
            except Exception as e:  # noqa: BLE001
                print(f"FAIL {name}: error: {e}", flush=True)
                n_fail += 1
                continue
            ca, na = normalize(a_rows, a_cols)
            cb, nb = normalize(b_rows, b_cols)
            bad = []
            if ca != cb:
                bad.append(f"cols {ca} != {cb}")
            if len(na) != len(nb):
                bad.append(f"rowcount {len(na)} != {len(nb)}")
            elif not bad and na != nb:
                diffs = [(x, y) for x, y in zip(na, nb) if x != y][:2]
                bad.append(f"values differ: {diffs}")
            if bad:
                print(f"FAIL {name}: {'; '.join(bad)}", flush=True)
                n_fail += 1
            else:
                print(
                    f"PASS {name}: {len(na)} rows ({time.time() - t0:.1f}s)",
                    flush=True,
                )
                n_pass += 1

    print(f"\n{n_pass} order-invariant, {n_fail} order-dependent")
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
