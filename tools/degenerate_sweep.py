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
- ``skew``  — the hot-key tier (round 10): a rewrite of the source
  where ONE key owns ~50 % of the group/join keys —
  ``events.user_id`` (event_id % 2 == 0 → the minimum user id) and
  ``documents.source`` (doc_id % 2 == 0 → the lexicographically first
  source). This is the classic 100 TB scale-killer shape (the
  reference's ``groupByKey`` at SimpleStreamingApp.scala:81 is exactly
  this hazard): a query can stay hash-correct while one straggler
  partition does half the work. The tier therefore checks BOTH
  directions: the full Spark-vs-DuckDB contract for correctness, and
  per-query wall-time RATIOS vs a pristine run of the same source in
  the same JVM — a correct query reading > SKEW_RATIO_FLAG x pristine
  has a real skew bug (missing salt / two-phase agg / broadcast).

For each tier the FULL driver contract runs: every ``queries()`` entry
on Spark and its ``oracle_sql()`` twin on DuckDB over the same tier
dir, compared with the oracle checker's own rules (sorted columns,
order-insensitive rows, 9 dp float fold, canonical dtypes). Queries
without an oracle run rows-only (must not raise).

Usage: python tools/degenerate_sweep.py [src_sf_dir] [tier] [query ...]
       tier in {empty, one_row, nulls, skew,
       both (default: empty+one_row), all (empty+one_row+nulls)}
"""

from __future__ import annotations

import json
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

#: machine-readable summary of the last main() run; dumped to the path
#: in $DEGEN_SWEEP_OUT (if set) so the per-round artifact assembles
#: without re-parsing stdout
LAST_RESULT: dict = {}
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


#: a hash-correct query whose skew-tier wall exceeds this multiple of
#: its pristine wall (after the absolute floor) has a hot-key bug
SKEW_RATIO_FLAG = 5.0
#: sub-second arms are noise-floor — a 5x on 0.2 s is not a finding
SKEW_MIN_SECONDS = 1.0

#: queries whose hot-key cost is LINEAR in the hot key (a straggler by
#: semantic contract, not a quadratic blowup) — each needs a written
#: rationale, mirroring plan_sweep's allowlist discipline. Allowlisted
#: entries are still measured and printed, just not flagged.
SKEW_ALLOWLIST = {
    "ewma_smooth": (
        "per-key sequential recurrence folded left-to-right as the "
        "bit-exactness contract with the oracle's list_reduce; cost is "
        "linear in the hot key's length (measured 5.17x at a 50% hot "
        "key). The parallel chunked affine-map fold exists but "
        "reassociates float arithmetic — documented upgrade path in "
        "the operator docstring."
    ),
}


def build_skew_tier(src: str, dst: str, hot: str = "50") -> None:
    """Copy ``src`` with a fraction of the high-cardinality group/join
    keys collapsed onto one hot key (stable-id masks, order-independent).

    ``hot="50"`` keeps the round-10 tier byte-identical (even ids → the
    hot key); ``hot="90"`` is the sharper r11 stretch variant (ids not
    divisible by 10 → the hot key, i.e. one key owns ~90 % of the
    stream). Tables that are not rewritten are symlinked, not copied —
    at sf0.1 the lineitem copy would dominate the tier's build time."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    def hot_mask(ids: np.ndarray) -> pa.Array:
        if hot == "90":
            return pa.array(ids % 10 != 0)
        return pa.array(ids % 2 == 0)

    for f in sorted(os.listdir(src)):
        if not f.endswith(".parquet"):
            continue
        name = f[: -len(".parquet")]
        if name not in ("events", "documents"):
            # abspath: a relative src would make the link target resolve
            # relative to the tier's temp dir and dangle (ADVICE r11)
            os.symlink(os.path.abspath(os.path.join(src, f)),
                       os.path.join(dst, f))
            continue
        t = pq.read_table(os.path.join(src, f))
        if name == "events" and len(t) > 0:
            ids = np.asarray(t.column("event_id").to_numpy(zero_copy_only=False))
            hot_key = pc.min(t.column("user_id")).as_py()
            i = t.schema.get_field_index("user_id")
            col = pc.if_else(
                hot_mask(ids),
                pa.array([hot_key] * len(t), t.column("user_id").type),
                t.column("user_id"),
            )
            t = t.set_column(i, t.schema.field(i), col)
        elif name == "documents" and len(t) > 0:
            ids = np.asarray(t.column("doc_id").to_numpy(zero_copy_only=False))
            hot_key = pc.min(t.column("source")).as_py()
            i = t.schema.get_field_index("source")
            col = pc.if_else(
                hot_mask(ids),
                pa.array([hot_key] * len(t), t.column("source").type),
                t.column("source"),
            )
            t = t.set_column(i, t.schema.field(i), col)
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
    walls: dict[str, float] = {}
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, tier_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
            walls[name] = round(time.time() - t0, 3)
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
        "failures": failures, "walls": walls,
    }


def _warmup_pass(spark, src: str, only: set[str]) -> None:
    """Unmeasured Spark-only pass (no oracle compare): compiles every
    plan, spins up Python workers, and warms codegen/JIT before the
    measured pristine pass, so pristine and skew walls are EQUALLY warm
    (ADVICE r10 degenerate_sweep.py:248: with pristine measured cold,
    the skew pass inherits its warmth and ratios bias LOW — a real
    hot-key regression near the 5x threshold could escape). Failures
    are ignored here; the measured pass reports them."""
    for name, fn in entrymod.queries().items():
        if only and name not in only:
            continue
        try:
            fn(spark, src).collect()
        except Exception:  # noqa: BLE001
            pass


def _measure_variant_pair(
    spark, pristine_dir: str, skew_dir: str,
    user_fn, day_fn, label: str,
) -> dict:
    """Walls + result equality for a user-keyed stateful op vs its
    day-keyed escape-hatch twin on pristine AND hot-key input (VERDICT
    r10 item 2 / r11 item 6). The twins are not registry rows (registry
    is frozen; they share their batch oracles' semantics) so the skew
    tiers measure them here. The tier's registry warmup does NOT cover
    the day-keyed twins, so both variants get their own unmeasured
    warmup pass on the pristine dir first (ADVICE r11: a cold first
    pristine wall biases day_keyed_skew_ratio LOW); each timed pair
    then runs back-to-back so the walls share host state."""
    for fn in (user_fn, day_fn):
        try:
            fn(spark, pristine_dir).collect()
        except Exception:  # noqa: BLE001 - measured pass reports failures
            pass

    out: dict = {}
    for tier, d in (("pristine", pristine_dir), ("skew", skew_dir)):
        t0 = time.time()
        a = sorted(tuple(r) for r in user_fn(spark, d).collect())
        wall_user = round(time.time() - t0, 3)
        t0 = time.time()
        b = sorted(tuple(r) for r in day_fn(spark, d).collect())
        wall_day = round(time.time() - t0, 3)
        out[tier] = {
            "user_keyed_s": wall_user,
            "day_keyed_s": wall_day,
            "results_equal": a == b,
        }
    u = out["skew"]["user_keyed_s"] / max(out["pristine"]["user_keyed_s"], 1e-9)
    d_ = out["skew"]["day_keyed_s"] / max(out["pristine"]["day_keyed_s"], 1e-9)
    out["user_keyed_skew_ratio"] = round(u, 2)
    out["day_keyed_skew_ratio"] = round(d_, 2)
    print(f"\n[{label}-variant] user-keyed vs day-keyed under the hot key:")
    print(json.dumps(out, indent=1), flush=True)
    return out


def measure_funnel_variant(spark, pristine_dir: str, skew_dir: str) -> dict:
    from spark_streaming_testbed_spark.streaming.stateful import (
        streaming_funnel,
        streaming_funnel_daykeyed,
    )

    return _measure_variant_pair(
        spark, pristine_dir, skew_dir,
        streaming_funnel, streaming_funnel_daykeyed, "funnel",
    )


def measure_sessionize_variant(spark, pristine_dir: str, skew_dir: str) -> dict:
    from spark_streaming_testbed_spark.streaming.stateful import (
        streaming_sessionize,
        streaming_sessionize_daykeyed,
    )

    return _measure_variant_pair(
        spark, pristine_dir, skew_dir,
        streaming_sessionize, streaming_sessionize_daykeyed, "sessionize",
    )


def _confirm_flag_candidates(spark, src, skew_dir, pristine, skew) -> dict:
    """Re-measure every above-threshold candidate once on BOTH sources
    (Spark walls only, same JVM, back-to-back) and fold the minimum
    into the recorded walls. A single GC pause or compile stall can
    inflate one tier-sweep sample ~7x (observed: a 0.45 s aggregate
    reading 3.1 s once and 0.55-0.65 s on every controlled re-run, and
    a streaming replay that never touches the skewed tables reading
    5.3x) — min-of-2 kills that noise while a REAL hot-key blowup
    repeats and keeps its flag. Returns the re-measured walls for the
    artifact."""
    qs = entrymod.queries()
    confirmed: dict = {}
    for n in list(skew["walls"]):
        if n not in pristine["walls"]:
            continue
        r = skew["walls"][n] / max(pristine["walls"][n], 1e-9)
        if r < SKEW_RATIO_FLAG or skew["walls"][n] < SKEW_MIN_SECONDS:
            continue
        fn = qs[n]
        t0 = time.time()
        fn(spark, src).collect()
        wp = round(time.time() - t0, 3)
        t0 = time.time()
        fn(spark, skew_dir).collect()
        ws = round(time.time() - t0, 3)
        confirmed[n] = {
            "first": {"pristine_s": pristine["walls"][n],
                      "skew_s": skew["walls"][n], "ratio": round(r, 2)},
            "confirm": {"pristine_s": wp, "skew_s": ws},
        }
        pristine["walls"][n] = min(pristine["walls"][n], wp)
        skew["walls"][n] = min(skew["walls"][n], ws)
        print(f"[skew-confirm] {n}: first ratio {r:.2f} -> "
              f"min-walls ratio "
              f"{skew['walls'][n] / max(pristine['walls'][n], 1e-9):.2f}",
              flush=True)
    return confirmed


def run_skew(spark, src: str, only: set[str]) -> bool:
    """Skew tier: correctness on the hot-key rewrite PLUS wall-time
    ratios vs a pristine run of the same source in the same JVM. An
    unmeasured warmup pass runs first so BOTH measured passes see a
    warm JVM and the ratio is unbiased in either direction; any
    above-threshold candidate is re-measured once on both sources
    (min-of-2) before it may flag."""
    import json as _json

    print("[skew] unmeasured warmup pass (plan compile + JIT)...",
          flush=True)
    _warmup_pass(spark, src, only)
    pristine = run_tier(spark, "pristine", src, only)
    any_fail = pristine["fail"] > 0
    with tempfile.TemporaryDirectory(prefix="degen_skew_") as d:
        build_skew_tier(src, d)
        skew = run_tier(spark, "skew", d, only)
        fv = (
            measure_funnel_variant(spark, src, d)
            if not only or "streaming_funnel" in only else None
        )
        sv = (
            measure_sessionize_variant(spark, src, d)
            if not only or "streaming_sessionize" in only else None
        )
        confirmed = _confirm_flag_candidates(spark, src, d, pristine, skew)
    any_fail = any_fail or skew["fail"] > 0
    for variant in (fv, sv):
        if variant is not None:
            any_fail = any_fail or not all(
                variant[k]["results_equal"] for k in ("pristine", "skew"))
    ratios = {
        n: round(skew["walls"][n] / max(pristine["walls"][n], 1e-9), 2)
        for n in skew["walls"]
        if n in pristine["walls"]
    }
    over = {
        n: {"pristine_s": pristine["walls"][n], "skew_s": skew["walls"][n],
            "ratio": r}
        for n, r in ratios.items()
        if r >= SKEW_RATIO_FLAG and skew["walls"][n] >= SKEW_MIN_SECONDS
    }
    allowlisted = {
        n: {**v, "rationale": SKEW_ALLOWLIST[n]}
        for n, v in over.items() if n in SKEW_ALLOWLIST
    }
    flagged = {n: v for n, v in over.items() if n not in SKEW_ALLOWLIST}
    heaviest = sorted(
        skew["walls"], key=lambda n: skew["walls"][n], reverse=True
    )[:10]
    table = {
        n: {"pristine_s": pristine["walls"].get(n),
            "skew_s": skew["walls"][n], "ratio": ratios.get(n)}
        for n in heaviest
    }
    print("\n[skew] 10 heaviest queries under the hot key "
          "(wall ratio vs pristine, same JVM):")
    print(_json.dumps(table, indent=1))
    print(f"\n[skew] flagged (ratio >= {SKEW_RATIO_FLAG} and "
          f"skew wall >= {SKEW_MIN_SECONDS}s): "
          f"{_json.dumps(flagged, indent=1) if flagged else 'NONE'}")
    if allowlisted:
        print(f"\n[skew] allowlisted linear stragglers (measured, "
              f"not flagged): {_json.dumps(allowlisted, indent=1)}")
    print(
        f"\n[pristine] {pristine['pass']} pass, {pristine['fail']} fail, "
        f"{pristine['rows_only']} rows-only"
        f"\n[skew] {skew['pass']} pass, {skew['fail']} fail, "
        f"{skew['rows_only']} rows-only", flush=True)
    LAST_RESULT["skew"] = {
        "source": src,
        "pristine": {k: pristine[k] for k in ("pass", "fail", "rows_only")},
        "skewed": {k: skew[k] for k in ("pass", "fail", "rows_only")},
        "flag_rule": f"ratio >= {SKEW_RATIO_FLAG} and "
                     f"skew wall >= {SKEW_MIN_SECONDS} s",
        "flagged": flagged,
        "allowlisted": allowlisted,
        "heaviest_10_by_skew_wall": table,
        "top_ratios_all_queries": {
            n: r for n, r in sorted(
                ratios.items(), key=lambda kv: kv[1], reverse=True)[:8]
            if r >= 1.5
        },
        "funnel_variant": fv,
        "sessionize_variant": sv,
        "flag_confirm_reruns": confirmed,
        "failures": {**pristine["failures"], **skew["failures"]},
    }
    return any_fail or bool(flagged)


#: the skew90 set: the 10 skew-wall-heaviest registry queries from the
#: r10 50 %-tier (minus rs_tcp_roundtrip and blocking_recall_eval, whose
#: walls are socket/replay latency, not key-skew work; plus the two
#: r10 quadratic-fix queries and the two highest measured ratios) — the
#: queries where a 90 % hot key would first show a wall
SKEW90_QUERIES = {
    "streaming_funnel",
    "streaming_sessionize",
    "streaming_ewma",
    "streaming_stateful_totals",
    "streaming_heavy_hitters",
    "streaming_kmv_distinct",
    "streaming_latest_state",
    "streaming_group_sample",
    "streaming_stream_join",
    "attribution_report",
    "cep_pattern_match",
    "ann_lsh_topk",
    "hanoi_load_stats",
}


def run_skew90(spark, src: str, only: set[str]) -> bool:
    """The r11 stretch tier (VERDICT r10 item 8): a 90 % hot key at
    sf0.1, full contract + wall ratios, on the shuffle-heaviest subset
    only — a sharper signal on the per-key-serial ceiling than the 50 %
    tier, at a fraction of a full-registry sf0.1 run's cost. Also
    measures the day-keyed funnel AND sessionize escape hatches under
    the same key."""
    import json as _json

    only = only or set(SKEW90_QUERIES)
    print(f"[skew90] {len(only)} queries, 90% hot key, src={src}",
          flush=True)
    print("[skew90] unmeasured warmup pass (plan compile + JIT)...",
          flush=True)
    _warmup_pass(spark, src, only)
    pristine = run_tier(spark, "pristine90", src, only)
    any_fail = pristine["fail"] > 0
    with tempfile.TemporaryDirectory(prefix="degen_skew90_") as d:
        build_skew_tier(src, d, hot="90")
        skew = run_tier(spark, "skew90", d, only)
        fv = (
            measure_funnel_variant(spark, src, d)
            if "streaming_funnel" in only else None
        )
        sv = (
            measure_sessionize_variant(spark, src, d)
            if "streaming_sessionize" in only else None
        )
        confirmed = _confirm_flag_candidates(spark, src, d, pristine, skew)
    any_fail = any_fail or skew["fail"] > 0
    for variant in (fv, sv):
        if variant is not None:
            any_fail = any_fail or not all(
                variant[k]["results_equal"] for k in ("pristine", "skew"))
    ratios = {
        n: round(skew["walls"][n] / max(pristine["walls"][n], 1e-9), 2)
        for n in skew["walls"] if n in pristine["walls"]
    }
    over = {
        n: {"pristine_s": pristine["walls"][n], "skew_s": skew["walls"][n],
            "ratio": r}
        for n, r in ratios.items()
        if r >= SKEW_RATIO_FLAG and skew["walls"][n] >= SKEW_MIN_SECONDS
    }
    allowlisted = {
        n: {**v, "rationale": SKEW_ALLOWLIST[n]}
        for n, v in over.items() if n in SKEW_ALLOWLIST
    }
    flagged = {n: v for n, v in over.items() if n not in SKEW_ALLOWLIST}
    table = {
        n: {"pristine_s": pristine["walls"].get(n),
            "skew_s": skew["walls"][n], "ratio": ratios.get(n)}
        for n in sorted(skew["walls"],
                        key=lambda n: ratios.get(n, 0), reverse=True)
    }
    print("\n[skew90] per-query walls under the 90% hot key:")
    print(_json.dumps(table, indent=1))
    print(f"\n[skew90] flagged (ratio >= {SKEW_RATIO_FLAG} and "
          f"skew wall >= {SKEW_MIN_SECONDS}s): "
          f"{_json.dumps(flagged, indent=1) if flagged else 'NONE'}")
    if allowlisted:
        print(f"\n[skew90] allowlisted linear stragglers (measured, "
              f"not flagged): {_json.dumps(allowlisted, indent=1)}")
    print(
        f"\n[pristine90] {pristine['pass']} pass, {pristine['fail']} fail, "
        f"{pristine['rows_only']} rows-only"
        f"\n[skew90] {skew['pass']} pass, {skew['fail']} fail, "
        f"{skew['rows_only']} rows-only", flush=True)
    LAST_RESULT["skew90"] = {
        "source": src,
        "queries": sorted(only),
        "pristine": {k: pristine[k] for k in ("pass", "fail", "rows_only")},
        "skewed": {k: skew[k] for k in ("pass", "fail", "rows_only")},
        "flag_rule": f"ratio >= {SKEW_RATIO_FLAG} and "
                     f"skew wall >= {SKEW_MIN_SECONDS} s",
        "flagged": flagged,
        "allowlisted": allowlisted,
        "walls": table,
        "funnel_variant": fv,
        "sessionize_variant": sv,
        "flag_confirm_reruns": confirmed,
        "failures": {**pristine["failures"], **skew["failures"]},
    }
    return any_fail or bool(flagged)


def main() -> int:
    from _guards import validate_sf_dir
    src = validate_sf_dir(sys.argv[1] if len(sys.argv) > 1
                          else "/root/testdata/sf0.001")
    tier_arg = sys.argv[2] if len(sys.argv) > 2 else "both"
    only = set(sys.argv[3:])
    tiers: dict[str, int | None] = {"empty": 0, "one_row": 1, "nulls": None}
    if tier_arg == "both":
        tiers = {"empty": 0, "one_row": 1}
    elif tier_arg == "skew":
        spark = get_session("degenerate-sweep")
        spark.sparkContext.setLogLevel("ERROR")
        bad = run_skew(spark, src, only)
        _dump_last_result()
        return 1 if bad else 0
    elif tier_arg == "skew90":
        spark = get_session("degenerate-sweep")
        spark.sparkContext.setLogLevel("ERROR")
        bad = run_skew90(spark, src, only)
        _dump_last_result()
        return 1 if bad else 0
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
            LAST_RESULT[tier_name] = {
                k: res[k] for k in ("pass", "fail", "rows_only")
            }
            if res["failures"]:
                LAST_RESULT[tier_name]["failures"] = res["failures"]
    _dump_last_result()
    return 1 if any_fail else 0


def _dump_last_result() -> None:
    out = os.environ.get("DEGEN_SWEEP_OUT")
    if out and LAST_RESULT:
        from _guards import guard_artifact_overwrite
        n_pass = sum(t.get("pass", 0) for t in LAST_RESULT.values()
                     if isinstance(t, dict))
        n_fail = sum(t.get("fail", 0) for t in LAST_RESULT.values()
                     if isinstance(t, dict))
        guard_artifact_overwrite(out, total=n_pass + n_fail, errors=n_fail)
        with open(out, "w") as fh:
            json.dump(LAST_RESULT, fh, indent=1)
        print(f"wrote {out}", flush=True)


if __name__ == "__main__":
    raise SystemExit(main())
