"""Opt-in kill-and-resume contract replays (round-12 evidence class).

``tests/test_checkpoint_recovery.py`` pins the recovery mechanics fast
on two ops; these tests regression-lock the FULL sweep harness
(``tools/checkpoint_sweep.py``) — deterministic mid-stream kill,
restart from checkpoint, digest equality against the uninterrupted run
— for every stateful streaming op, without waiting for the per-round
CHECKPOINT_SWEEP artifact. Marked ``degenerate`` (deselected by
default, see pytest.ini) because the full dozen replays take several
minutes: run with

    python -m pytest -m degenerate tests/test_checkpoint_replay.py -q
"""

from __future__ import annotations

import sys

import pytest

sys.path.insert(0, "/root/repo/tools")

SF_SMOKE = "/root/testdata/sf0.001"

pytestmark = pytest.mark.degenerate


def _sweep():
    import checkpoint_sweep as cs

    return cs


def _op_names():
    return sorted(_sweep().SPECS)


@pytest.mark.parametrize("name", _op_names())
def test_kill_and_resume_recovers_exactly(spark, name, tmp_path):
    """Each stateful op, killed at the mid-stream trigger boundary and
    restarted from its checkpoint, must produce the same final rows as
    an uninterrupted run — and the kill must actually land mid-stream
    (commits at kill strictly between 0 and the batch count)."""
    cs = _sweep()
    spec = cs.SPECS[name]
    prev_parts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    try:
        if spec["mode"] == "merge":
            res = cs.run_upsert(spark, SF_SMOKE)
        else:
            res = cs.run_generic(spark, name, spec, SF_SMOKE)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev_parts)
    assert res["equal"], res.get("first_diff")
    assert res["interrupted_mid_stream"], res
    assert res["rows"] > 0
