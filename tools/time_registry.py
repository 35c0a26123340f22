"""Time every declared registry query at a scale factor via the noop sink.

Measurement methodology = guide §1.4: materialize through
``format("noop")`` so the computation is timed, not a sink; each query
gets N timed runs (default 2) and the MIN is reported (best estimate of
intrinsic cost on a shared host); every raw run is kept in the output.
Jobs are labelled (guide §1.5) so UI/event-log spelunking maps back.

Usage:
    python tools/time_registry.py OUT.json [sf_dir] [runs] [query ...]

With explicit query names, only those are timed (iteration loop for
before/after measurement of one optimization).
"""
from __future__ import annotations

import json
import os
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
sys.path.insert(0, REPO)


def main() -> None:
    out_path = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    runs = int(sys.argv[3]) if len(sys.argv) > 3 else 2
    only = sys.argv[4:]

    import __spark_entry__ as entry
    from spark_streaming_testbed_spark.session import get_session

    spark = get_session("time_registry")
    spark.sparkContext.setLogLevel("ERROR")

    queries = entry.queries()
    names = only or list(queries)
    result: dict[str, dict] = {}
    t_start = time.time()
    for i, name in enumerate(names):
        fn = queries[name]
        samples: list[float] = []
        err = None
        for r in range(runs):
            spark.sparkContext.setJobDescription(f"time_registry:{name}#{r}")
            t0 = time.perf_counter()
            try:
                fn(spark, sf_dir).write.format("noop").mode(
                    "overwrite").save()
            except Exception as exc:  # noqa: BLE001 — record, keep sweeping
                err = f"{type(exc).__name__}: {exc}"[:300]
                break
            samples.append(round(time.perf_counter() - t0, 3))
        spark.sparkContext.setJobDescription(None)
        result[name] = {"min": min(samples) if samples else None,
                        "runs": samples, "err": err}
        print(f"[{i + 1}/{len(names)}] {name}: "
              f"{result[name]['min']} {samples}" + (f" ERR {err}" if err else ""),
              flush=True)
    doc = {
        "sf_dir": sf_dir,
        "runs_per_query": runs,
        "wall_s": round(time.time() - t_start, 1),
        "queries": result,
    }
    with open(out_path, "w") as fh:
        json.dump(doc, fh, indent=1)
    ranked = sorted(
        ((v["min"], k) for k, v in result.items() if v["min"] is not None),
        reverse=True)
    print("\nslowest 25:")
    for sec, name in ranked[:25]:
        print(f"  {sec:8.3f}  {name}")
    errs = [k for k, v in result.items() if v["err"]]
    if errs:
        print("ERRORS:", errs)


if __name__ == "__main__":
    main()
