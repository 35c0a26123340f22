"""Degenerate-input oracle sweep (new evidence class, round 9).

The triple-SF sweep (ORACLE_TRIPLE_SF_r0*.json) proved that moving the
data volume hunts real bugs: sf0.1 exposed rounding edges the gate SFs
never hit. This sweep moves volume the OTHER way, past sf0.001, to the
two degenerate tiers every warehouse eventually feeds a query:

- ``empty``  — every table present with its full schema and ZERO rows
  (a partition with no matching files, a fresh day's landing zone).
  Exercises: global aggregates over nothing, ``collect()[0]`` driver
  scalars, seeded samples of size 0, windows with no frames, DuckDB
  1-row-NULL vs Spark 0-row divergences on ungrouped aggregates.
- ``one_row`` — every table truncated to its first row. Exercises:
  single-element windows, self-joins that vanish, variance/stddev of a
  single sample (NULL vs 0), LSH bands with one signature, percentile
  interpolation with one point.
- ``nulls``  — the malformed-feed tier: a deterministic 20 % of
  ``documents.text`` (doc_id % 5 == 0), ``events.value``
  (event_id % 5 == 0), and ``events.props`` (event_id % 5 == 1) set to
  NULL, everything else pristine. The realistic shape of a feed whose
  upstream extractor partially failed: every text/dedup/sketch/events
  operator must agree with its oracle on NULL propagation (split/
  explode of NULL, aggregates skipping NULLs, NULL group keys) instead
  of assuming the fixtures' accidental non-nullness.

For each tier the FULL driver contract runs: every ``queries()`` entry
on Spark and its ``oracle_sql()`` twin on DuckDB over the same tier
dir, compared with the oracle checker's own rules (sorted columns,
order-insensitive rows, 9 dp float fold, canonical dtypes). Queries
without an oracle run rows-only (must not raise).

Usage: python tools/degenerate_sweep.py [src_sf_dir] [tier] [query ...]
       tier in {empty, one_row, nulls, both (default: empty+one_row),
       all (all three)}
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

import duckdb
import pyarrow.parquet as pq

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
sys.path.insert(0, REPO)
sys.path.insert(0, HERE)

from check_oracle import normalize, type_mismatches  # noqa: E402

import __spark_entry__ as entrymod  # noqa: E402
from spark_streaming_testbed_spark.session import TABLES, get_session  # noqa: E402


def build_tier(src: str, dst: str, n_rows: int) -> None:
    """Write every table of ``src`` into ``dst`` truncated to n_rows."""
    for f in sorted(os.listdir(src)):
        if not f.endswith(".parquet"):
            continue
        t = pq.read_table(os.path.join(src, f))
        pq.write_table(t.slice(0, n_rows), os.path.join(dst, f))


#: (table, key column, nulled column, key % 5 residue) — the NULL mask
#: is keyed on stable ids, not row position, so the tier is
#: deterministic under any row order
NULL_MASKS = [
    ("documents", "doc_id", "text", 0),
    ("events", "event_id", "value", 0),
    ("events", "event_id", "props", 1),
]


def build_null_tier(src: str, dst: str) -> None:
    """Copy ``src`` with the NULL_MASKS columns nulled on their 20 %."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    masks: dict[str, list] = {}
    for table, key, col, residue in NULL_MASKS:
        masks.setdefault(table, []).append((key, col, residue))
    for f in sorted(os.listdir(src)):
        if not f.endswith(".parquet"):
            continue
        t = pq.read_table(os.path.join(src, f))
        for key, col, residue in masks.get(f[: -len(".parquet")], []):
            keys = t.column(key).to_numpy(zero_copy_only=False)
            hit = pa.array(np.asarray(keys) % 5 == residue)
            i = t.schema.get_field_index(col)
            nulled = pc.if_else(
                hit, pa.nulls(len(t), t.column(col).type), t.column(col)
            )
            t = t.set_column(i, t.schema.field(i), nulled)
        pq.write_table(t, os.path.join(dst, f))


def run_tier(spark, tier_name: str, tier_dir: str, only: set[str]) -> dict:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{tier_dir}/{t}.parquet'"
        )
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    n_pass = n_fail = n_rows_only = 0
    failures: dict[str, str] = {}
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, tier_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:  # noqa: BLE001
            msg = f"spark error: {type(e).__name__}: {str(e)[:300]}"
            print(f"FAIL [{tier_name}] {name}: {msg}", flush=True)
            failures[name] = msg
            n_fail += 1
            continue
        if name not in oracles:
            print(
                f"rows-only [{tier_name}] {name}: {len(srows)} rows "
                f"({time.time()-t0:.1f}s)", flush=True)
            n_rows_only += 1
            continue
        try:
            otable = con.execute(oracles[name]).arrow()
            ocols = otable.schema.names
            orows = [tuple(row[c] for c in ocols) for row in otable.to_pylist()]
        except Exception as e:  # noqa: BLE001
            msg = f"duckdb error: {type(e).__name__}: {str(e)[:300]}"
            print(f"FAIL [{tier_name}] {name}: {msg}", flush=True)
            failures[name] = msg
            n_fail += 1
            continue
        s_cols, s_norm = normalize(srows, scols)
        o_cols, o_norm = normalize(orows, ocols)
        status = type_mismatches(sdf, otable)
        if len(srows) != len(orows):
            status.append(f"rowcount {len(srows)} != {len(orows)}")
        if s_cols != o_cols:
            status.append(f"cols {s_cols} != {o_cols}")
        if not status and s_norm != o_norm:
            diffs = [(a, b) for a, b in zip(s_norm, o_norm) if a != b][:3]
            status.append(f"values differ, first diffs: {diffs}")
        if status:
            msg = "; ".join(status)[:400]
            print(f"FAIL [{tier_name}] {name}: {msg}", flush=True)
            failures[name] = msg
            n_fail += 1
        else:
            print(
                f"PASS [{tier_name}] {name}: {len(srows)} rows "
                f"({time.time()-t0:.1f}s)", flush=True)
            n_pass += 1
    con.close()
    return {
        "pass": n_pass, "fail": n_fail, "rows_only": n_rows_only,
        "failures": failures,
    }


def main() -> int:
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    tier_arg = sys.argv[2] if len(sys.argv) > 2 else "both"
    only = set(sys.argv[3:])
    tiers: dict[str, int | None] = {"empty": 0, "one_row": 1, "nulls": None}
    if tier_arg == "both":
        tiers = {"empty": 0, "one_row": 1}
    elif tier_arg != "all":
        tiers = {tier_arg: tiers[tier_arg]}

    spark = get_session("degenerate-sweep")
    spark.sparkContext.setLogLevel("ERROR")

    any_fail = False
    for tier_name, n in tiers.items():
        with tempfile.TemporaryDirectory(prefix=f"degen_{tier_name}_") as d:
            if n is None:
                build_null_tier(src, d)
            else:
                build_tier(src, d, n)
            res = run_tier(spark, tier_name, d, only)
            print(
                f"\n[{tier_name}] {res['pass']} pass, {res['fail']} fail, "
                f"{res['rows_only']} rows-only", flush=True)
            any_fail = any_fail or res["fail"] > 0
    return 1 if any_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
