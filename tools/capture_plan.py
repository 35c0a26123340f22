"""Write ``.explain("formatted")`` output for named registry queries.

Usage: python tools/capture_plan.py OUT_DIR SUFFIX [sf_dir] query [query ...]

Writes OUT_DIR/<query>_<SUFFIX>.txt per query. Run it once from a clean
checkout (suffix ``before``) and once from the optimized tree (suffix
``after``) so the plan diff is reviewable without running Spark.
"""
from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.environ.get("CAPTURE_PLAN_REPO", REPO))


def main() -> None:
    out_dir, suffix = sys.argv[1], sys.argv[2]
    sf_dir = sys.argv[3]
    names = sys.argv[4:]
    os.makedirs(out_dir, exist_ok=True)

    import __spark_entry__ as entry
    from spark_streaming_testbed_spark.session import get_session

    spark = get_session("capture_plan")
    spark.sparkContext.setLogLevel("ERROR")
    queries = entry.queries()
    for name in names:
        df = queries[name](spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted")
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        print("wrote", path, f"({len(plan)} chars)")


if __name__ == "__main__":
    main()
