"""Property-based tests (hypothesis) for the profile generator — a layer
the reference never had (SURVEY §5: no property randomization upstream)."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from spark_streaming_testbed_spark.plans import (
    CyclePhase,
    FixedPhase,
    LoopPhase,
    RampPhase,
    TestPlan,
)


def bucket_total(rate: int) -> int:
    """The telescoped bucket sum: int(100 * (rate/100.0)). For rates whose
    /100 is not exactly representable (29, 251, …) this is rate-1 — a
    genuine reference quirk (Scala does the same double math) that the
    engine reproduces faithfully."""
    return int(100 * (rate / 100.0))


@given(rate=st.integers(0, 200_000), second=st.integers(0, 10))
@settings(max_examples=200, deadline=None)
def test_fixed_phase_emits_telescoped_bucket_total(rate, second):
    phase = FixedPhase(value=1, rate=rate, duration=None)
    out = phase.values_for(second)
    total = sum(len(d.values) for d in out)
    assert total == bucket_total(rate)
    assert rate - 1 <= total <= rate
    # timestamps strictly inside the second, aligned to 10 ms
    for d in out:
        assert second * 1000 <= d.time_ms < (second + 1) * 1000
        assert (d.time_ms - second * 1000) % 10 == 0


@given(
    start=st.integers(0, 5000),
    end=st.integers(0, 5000),
    duration=st.integers(1, 30),
)
@settings(max_examples=200, deadline=None)
def test_ramp_total_is_sum_of_interpolated_rates(start, end, duration):
    phase = RampPhase(value=2, start_rate=start, end_rate=end, duration=duration)
    total = sum(
        len(d.values) for s in range(duration) for d in phase.values_for(s)
    )
    expected = 0
    for s in range(duration):
        rate = start if duration == 1 else start + (end - start) / (duration - 1.0) * s
        expected += int(rate / 100.0 * 100)  # bucket sum == int(rate)
    # bucket arithmetic sums to int(rate_for_second) each second
    assert abs(total - expected) <= duration  # int() boundary slack


@given(
    values=st.lists(st.integers(1, 9), min_size=1, max_size=5),
    rate=st.integers(1, 1000),
)
@settings(max_examples=100, deadline=None)
def test_cycle_round_robin_is_fair(values, rate):
    phase = CyclePhase(values=tuple(values), rate=rate, duration=1)
    flat = [v for d in phase.values_for(0) for v in d.values]
    assert len(flat) == bucket_total(rate)
    # round-robin: counts differ by at most 1 across the value list
    counts = [flat.count(v) for v in dict.fromkeys(values)]
    if len(set(values)) == len(values):
        assert max(counts) - min(counts) <= 1


@given(times=st.integers(1, 4), dur=st.integers(1, 4), rate=st.integers(1, 100))
@settings(max_examples=100, deadline=None)
def test_loop_total_is_times_multiple(times, dur, rate):
    inner = FixedPhase(value=3, rate=rate, duration=dur)
    loop = LoopPhase(times=times, phases=[inner])
    plan = TestPlan(phases=[loop])
    rows = plan.rows()
    assert len(rows) == times * dur * bucket_total(rate)
    assert rows == sorted(rows, key=lambda r: r[0])
