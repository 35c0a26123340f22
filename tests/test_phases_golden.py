"""Golden tests for the profile generator's bucket arithmetic.

Expected sequences are transcribed from the reference's unit specs
(testbed/test/.../RampPhaseSpec.scala and LoopPhaseSpec.scala) — they are
the correctness contract for T7 (SURVEY.md §2.6, §7.4).
"""

from __future__ import annotations

import pytest

from spark_streaming_testbed_spark.plans import (
    CyclePhase,
    DataAtTime,
    FixedPhase,
    LoopPhase,
    NoopPhase,
    RampPhase,
    TestPlan,
    parse_plan,
)


def dat(t, vals):
    return DataAtTime(t, tuple(vals))


# --- RampPhaseSpec goldens -------------------------------------------------

def test_ramp_constant_output_when_rates_equal():
    phase = RampPhase(value=12, start_rate=25, end_rate=25, duration=4)
    for second in range(4):
        expected = [dat(second * 1000 + t * 40 + 30, [12]) for t in range(25)]
        assert phase.values_for(second) == expected


def test_ramp_uses_start_rate_for_duration_1():
    phase = RampPhase(value=12, start_rate=20, end_rate=25, duration=1)
    expected = [dat(t * 50 + 40, [12]) for t in range(20)]
    assert phase.values_for(0) == expected


def test_ramp_duration_2_uses_both_endpoints():
    phase = RampPhase(value=12, start_rate=10, end_rate=20, duration=2)
    assert phase.values_for(0) == [dat(t * 100 + 90, [12]) for t in range(10)]
    assert phase.values_for(1) == [dat(1000 + t * 50 + 40, [12]) for t in range(20)]


def test_ramp_duration_3_hits_midpoint():
    phase = RampPhase(value=12, start_rate=10, end_rate=40, duration=3)
    assert phase.values_for(0) == [dat(t * 100 + 90, [12]) for t in range(10)]
    assert phase.values_for(1) == [dat(1000 + t * 40 + 30, [12]) for t in range(25)]
    expected2 = [
        dat(2000 + t * 25 + (20 if (t * 25) % 10 == 0 else 15), [12])
        for t in range(40)
    ]
    assert phase.values_for(2) == expected2


def test_ramp_expired_after_duration():
    phase = RampPhase(value=12, start_rate=5, end_rate=33, duration=6)
    assert phase.values_for(6) == []


def test_ramp_up_linear_counts():
    phase = RampPhase(value=20, start_rate=12, end_rate=72, duration=6)
    for second in range(6):
        assert len(phase.values_for(second)) == second * 12 + 12


def test_ramp_down_linear_counts():
    phase = RampPhase(value=20, start_rate=72, end_rate=12, duration=6)
    for second in range(6):
        assert len(phase.values_for(second)) == (5 - second) * 12 + 12


# --- LoopPhaseSpec goldens -------------------------------------------------

def test_loop_infinite_without_times():
    assert LoopPhase(times=None, phases=[]).duration is None


def test_loop_infinite_if_inner_unbounded():
    phase = LoopPhase(
        times=2,
        phases=[FixedPhase(value=5, rate=4, duration=None),
                FixedPhase(value=4, rate=5, duration=2)],
    )
    assert phase.duration is None


def test_loop_repeats_one_phase():
    phase = LoopPhase(times=3, phases=[FixedPhase(value=3, rate=10, duration=2)])
    for second in range(0, 7):
        expected = [dat(second * 1000 + t * 100 + 90, [3]) for t in range(10)]
        assert phase.values_for(second) == expected


def test_loop_repeats_two_phases():
    phase = LoopPhase(
        times=3,
        phases=[FixedPhase(value=3, rate=10, duration=2),
                FixedPhase(value=4, rate=5, duration=3)],
    )
    for second in range(0, 16):
        if second % 5 <= 1:
            expected = [dat(second * 1000 + t * 100 + 90, [3]) for t in range(10)]
        else:
            expected = [dat(second * 1000 + t * 200 + 190, [4]) for t in range(5)]
        assert phase.values_for(second) == expected


# --- additional contract edges --------------------------------------------

def test_fixed_emits_at_equal_duration_but_ramp_does_not():
    # FixedPhase expiry is `duration < second` (still emits at ==),
    # Ramp/Cycle are `duration <= second` (reference quirk, SURVEY §7.4.2).
    fixed = FixedPhase(value=1, rate=100, duration=3)
    assert len(fixed.values_for(3)) == 100
    assert fixed.values_for(4) == []
    cycle = CyclePhase(values=(1, 2), rate=100, duration=3)
    assert cycle.values_for(3) == []


def test_cycle_round_robins_across_buckets():
    phase = CyclePhase(values=(7, 8, 9), rate=10, duration=1)
    out = phase.values_for(0)
    flat = [v for d in out for v in d.values]
    assert flat == [7, 8, 9, 7, 8, 9, 7, 8, 9, 7]


def test_fixed_bucket_sum_equals_rate():
    for rate in (1, 7, 99, 100, 101, 12345, 50000):
        phase = FixedPhase(value=1, rate=rate, duration=1)
        total = sum(len(d.values) for d in phase.values_for(0))
        assert total == rate


def test_plan_sequences_phases_with_time_shift():
    plan = TestPlan(phases=[
        NoopPhase(duration=2),
        FixedPhase(value=9, rate=2, duration=2),
    ])
    assert plan.values_for(0) == []
    assert plan.values_for(1) == []
    # second 2 = first second of the fixed phase, shifted by 2000 ms
    out = plan.values_for(2)
    assert [d.time_ms for d in out] == [2000 + 490, 2000 + 990]
    assert plan.duration == 4
    assert plan.is_done_at(4) and not plan.is_done_at(3)


def test_parse_plan_json_round_trip():
    plan = parse_plan(
        """
        {"sequence": [
          {"type": "ramp", "value": 7, "startRate": 10, "endRate": 20, "duration": 2},
          {"type": "loop", "times": 2, "phases": [
            {"type": "fixed", "value": 8, "rate": 5, "duration": 1}]},
          {"type": "cycle", "values": [1, 2], "rate": 4, "duration": 1},
          {"type": "noop", "duration": 1}
        ]}
        """
    )
    assert plan.duration == 2 + 2 + 1 + 1
    rows = plan.rows()
    assert len(rows) == (10 + 20) + (5 + 5) + 4
    assert rows == sorted(rows, key=lambda r: r[0])


def test_rows_requires_bound_for_unbounded_plan():
    plan = TestPlan(phases=[FixedPhase(value=1, rate=10, duration=None)])
    with pytest.raises(ValueError):
        plan.rows()
    assert len(plan.rows(max_seconds=3)) == 30


# --- DataFrame materialization --------------------------------------------

def test_profile_dataframe_matches_pure_python(spark):
    from spark_streaming_testbed_spark.sources.profile_source import (
        DEFAULT_EPOCH_MS,
        profile_dataframe,
    )

    plan = parse_plan(
        """
        {"sequence": [
          {"type": "ramp", "value": 7, "startRate": 50, "endRate": 150, "duration": 5},
          {"type": "fixed", "value": 8, "rate": 120, "duration": 3}
        ]}
        """
    )
    df = profile_dataframe(spark, plan)
    got = sorted(
        (int(r["ts"].timestamp() * 1000) - DEFAULT_EPOCH_MS, r["value"])
        for r in df.collect()
    )
    assert got == plan.rows()
    assert df.columns == ["ts", "value", "stream_id"]


# ---------------------------------------------------------------------------
# S11 fidelity: the reference's verbatim HOCON plan syntax
# ---------------------------------------------------------------------------

#: verbatim from /root/reference/test-runs-001/README.md:82-93
HOCON_RUN001 = """
sequence = [
  { type = noop
    duration = 2
  }
  { type = fixed
    value = 7
    rate = 50000
    duration = 300
  }
]
"""

#: verbatim from /root/reference/test-runs-004/README.md:124-139
HOCON_RUN004 = """
sequence = [
  { type = noop
    duration = 2
  }
  { type = ramp
    startRate = 1000
    endRate = 50000
    value = 7
    duration = 30
  }
  { type = fixed
    value = 7
    rate = 50000
    duration = 300
  }
]
"""


def test_hocon_plan_matches_json_twin():
    import json as _json

    from spark_streaming_testbed_spark.plans import parse_plan

    json_twin = _json.dumps({"sequence": [
        {"type": "noop", "duration": 2},
        {"type": "ramp", "startRate": 1000, "endRate": 50000,
         "value": 7, "duration": 30},
        {"type": "fixed", "value": 7, "rate": 50000, "duration": 300},
    ]})
    hp, jp = parse_plan(HOCON_RUN004), parse_plan(json_twin)
    assert hp.duration == jp.duration == 332
    # identical phase trees → identical emissions
    for second in (0, 1, 2, 3, 17, 31, 32, 200, 331):
        assert hp.values_for(second) == jp.values_for(second)


def test_hocon_run001_plan_parses_verbatim():
    from spark_streaming_testbed_spark.plans import parse_plan

    plan = parse_plan(HOCON_RUN001)
    assert plan.duration == 302
    assert plan.values_for(0) == []  # noop
    rows = [v for d in plan.values_for(2) for v in d.values]
    assert len(rows) == 50_000 and set(rows) == {7}


def test_hocon_subset_features():
    """Comments, commas, quoted strings, key:value, nested loop/cycle."""
    from spark_streaming_testbed_spark.plans import parse_plan
    from spark_streaming_testbed_spark.plans.hocon import parse_hocon

    doc = """
    # a loop plan
    sequence = [
      { type: loop
        times = 2
        phases = [
          { "type" = cycle, values = [1, 2, 3], rate = 10, duration = 1 }
        ]
      }
    ]
    """
    cfg = parse_hocon(doc)
    assert cfg["sequence"][0]["times"] == 2
    assert cfg["sequence"][0]["phases"][0]["values"] == [1, 2, 3]
    plan = parse_plan(doc)
    assert plan.duration == 2
    vals = [v for d in plan.values_for(0) for v in d.values]
    assert vals == [1, 2, 3, 1, 2, 3, 1, 2, 3, 1]
