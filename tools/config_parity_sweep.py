"""Config-parity sweep (round 11): the full query registry must produce
IDENTICAL results under Spark config variants that only change the
physical strategy or the error discipline, never the answer:

- ``aqe_off``  — ``spark.sql.adaptive.enabled=false`` (plus its
  coalescePartitions / skewJoin sub-flags): a result that changes when
  AQE stops re-planning was silently depending on a runtime plan choice
  (partition coalescing order, skew-join splitting) — the same class of
  latent bug the determinism gate catches for shuffle-partition counts.
- ``ansi_off`` — ``spark.sql.ansi.enabled=false`` (the session default
  is ON in Spark 4): a result that changes here was silently relying on
  ANSI evaluation (e.g. an expression that errors under ANSI but
  NULL-propagates without it was being dodged by plan luck, or a cast
  whose overflow behavior differs). The registry's contract is that
  every edge is explicitly guarded (try_divide, try_ casts, headroom
  guards), so results must be config-independent.

Unlike check_oracle this is Spark-vs-Spark: a baseline pass under the
standard session confs produces a normalized-rows digest per query, and
each variant pass re-runs the full registry and compares digests. A
query that RAISES under a variant is a failure too (the guard contract
says both engines and all legal configs fail loudly together or not at
all).

Usage: python tools/config_parity_sweep.py [sf_dir] [out.json] [query ...]
"""

from __future__ import annotations

import hashlib
import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from check_oracle import normalize  # noqa: E402

from spark_streaming_testbed_spark.session import get_session  # noqa: E402

import __spark_entry__ as entrymod  # noqa: E402

#: conf -> variant value. The session's ACTUAL pre-variant value is
#: captured at runtime immediately before each variant and restored in
#: the finally block (ADVICE r11: hardcoded restore-to values would
#: silently set a wrong baseline if the session defaults ever change),
#: so each variant provably differs from baseline in ONE dimension.
VARIANTS: dict[str, dict[str, str]] = {
    "aqe_off": {
        "spark.sql.adaptive.enabled": "false",
        "spark.sql.adaptive.coalescePartitions.enabled": "false",
        "spark.sql.adaptive.skewJoin.enabled": "false",
    },
    "ansi_off": {
        "spark.sql.ansi.enabled": "false",
    },
}


def digest_pass(spark, sf_dir: str, only: set[str], label: str) -> dict:
    """Run every registry query, return {name: digest-or-error}."""
    out: dict[str, str] = {}
    qs = entrymod.queries()
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            cols = sdf.columns
            rows = [tuple(r) for r in sdf.collect()]
            # schema participates: a variant that flips a dtype (e.g.
            # decimal widening under ANSI) is a finding even when the
            # printed values round the same
            dtypes = ";".join(
                f.dataType.simpleString() for f in sdf.schema.fields)
        except Exception as e:  # noqa: BLE001
            out[name] = f"ERROR: {type(e).__name__}: {str(e)[:200]}"
            print(f"ERR  [{label}] {name}: {out[name][:120]}", flush=True)
            continue
        _, norm = normalize(rows, cols)
        h = hashlib.sha256()
        h.update(repr(sorted(cols)).encode())
        h.update(dtypes.encode())
        for r in norm:
            h.update(repr(r).encode())
        out[name] = f"{len(rows)}:{h.hexdigest()[:16]}"
        print(f"ok   [{label}] {name}: {out[name]} "
              f"({time.time()-t0:.1f}s)", flush=True)
    return out


def main() -> int:
    from _guards import guard_artifact_overwrite, validate_sf_dir
    sf_dir = validate_sf_dir(sys.argv[1] if len(sys.argv) > 1
                             else "/root/testdata/sf0.01")
    out_path = sys.argv[2] if len(sys.argv) > 2 else None
    only = set(sys.argv[3:])

    spark = get_session("config-parity")
    spark.sparkContext.setLogLevel("ERROR")

    t_all = time.time()
    baseline = digest_pass(spark, sf_dir, only, "baseline")

    import subprocess

    head = subprocess.run(
        ["git", "-C", "/root/repo", "rev-parse", "--short", "HEAD"],
        capture_output=True, text=True).stdout.strip()
    report: dict = {
        "sf_dir": sf_dir,
        "n_queries": len(baseline),
        "head_commit": head,
        "variants": {},
    }
    exit_code = 0
    for vname, confs in VARIANTS.items():
        # Capture the session's real current values so restoration puts
        # back exactly what was there, not an assumed default.
        saved = {k: spark.conf.get(k, None) for k in confs}
        for k, vval in confs.items():
            spark.conf.set(k, vval)
        try:
            got = digest_pass(spark, sf_dir, only, vname)
        finally:
            for k, prev in saved.items():
                if prev is None:
                    spark.conf.unset(k)
                else:
                    spark.conf.set(k, prev)
        mismatches = {
            n: {"baseline": baseline[n], "variant": got.get(n, "MISSING")}
            for n in baseline
            if got.get(n) != baseline[n]
        }
        report["variants"][vname] = {
            "confs": dict(confs),
            "restored_to": saved,
            "match": len(baseline) - len(mismatches),
            "mismatch": len(mismatches),
            "mismatches": mismatches,
        }
        print(f"\n[{vname}] {len(baseline) - len(mismatches)}/"
              f"{len(baseline)} invariant, {len(mismatches)} mismatched",
              flush=True)
        if mismatches:
            exit_code = 1
            for n, d in list(mismatches.items())[:20]:
                print(f"  MISMATCH {n}: {d}", flush=True)
    report["wall_s"] = round(time.time() - t_all, 1)

    if out_path:
        n_err = sum(
            1 for v in baseline.values() if str(v).startswith("ERROR"))
        guard_artifact_overwrite(out_path, total=len(baseline), errors=n_err)
        with open(out_path, "w") as fh:
            json.dump(report, fh, indent=1)
        print(f"wrote {out_path}", flush=True)
    return exit_code


if __name__ == "__main__":
    raise SystemExit(main())
