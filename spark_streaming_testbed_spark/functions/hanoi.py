"""The CPU-bound per-record kernel (SURVEY.md §2.2 P8, §2.7 F1).

The reference burns CPU per record by solving Tower of Hanoi of height =
the record's value and timing the solve (simple-streaming-app
SimpleStreamingApp.scala:71-80, kernel Hanoi.scala:9-46) — cost grows
~2^n. Rebuilt here as an Arrow-batched pandas UDF: ``moves`` (= 2^n − 1,
deterministic — used by the oracle-checked contract query) and measured
wall-micros (observability only, never compared)."""

from __future__ import annotations

import time

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T


def hanoi_moves(n: int) -> int:
    """Count moves by actually walking the puzzle (CPU-bound on purpose —
    an O(1) formula would defeat the kernel's role as a load generator)."""
    moves = 0
    # iterative DFS over (count, src, via, dst) frames; cost Θ(2^n)
    stack = [(n, 0, 1, 2)]
    while stack:
        height, src, via, dst = stack.pop()
        if height == 1:
            moves += 1
            continue
        stack.append((height - 1, via, src, dst))
        stack.append((1, src, via, dst))
        stack.append((height - 1, src, dst, via))
    return moves


@F.pandas_udf(T.StructType([
    T.StructField("moves", T.LongType()),
    T.StructField("micros", T.LongType()),
]))
def hanoi_kernel(heights: pd.Series) -> pd.DataFrame:
    moves, micros = [], []
    for n in heights:
        t0 = time.perf_counter_ns()
        m = hanoi_moves(int(n))
        micros.append((time.perf_counter_ns() - t0) // 1000)
        moves.append(m)
    return pd.DataFrame({"moves": moves, "micros": micros})


#: C-speed additions burned per hanoi move. MEASURED, not asserted:
#: numpy sustains ~6.5e9 int64 adds/s here, so (2^7−1)·1600 ≈ 203k adds
#: ≈ 31 µs — matching the reference's measured per-record cost at n=7
#: (mean ≈ 0.031 ms, test-runs-001/vanilla-1.4.0-7-50000/execution.log
#: :1-5 cols 6-7 via BASELINE.md:28). Guarded by
#: tests/test_hanoi_calibration.py so drift shows up in CI, and scaled
#: with (2^n − 1) so the growth shape stays the reference's.
BURN_ADDS_PER_MOVE = 1600

#: the burn iterates a FIXED L1-resident base vector (128 KB) however
#: large the total add count is — a span that grew with 2^n would fall
#: out of cache around n=8 and bend the cost curve away from the pure
#: 2^n shape the reference's solver has.
_BURN_SPAN = 16_384


def _burn_adds(total_adds: int) -> None:
    import numpy as np

    rows = max(int(total_adds) // _BURN_SPAN, 1)
    np.broadcast_to(
        np.arange(_BURN_SPAN, dtype="int64"), (rows, _BURN_SPAN)
    ).sum()


def burn_us_per_record(n: int, reps: int = 20_000) -> float:
    """Measure the burn kernel's per-record wall cost at height ``n`` —
    the calibration probe the guard test uses."""
    total = ((1 << n) - 1) * BURN_ADDS_PER_MOVE * reps
    t0 = time.perf_counter_ns()
    _burn_adds(total)
    return (time.perf_counter_ns() - t0) / 1000.0 / reps


@F.pandas_udf(T.LongType())
def hanoi_burn_us(heights: pd.Series) -> pd.Series:
    """Calibrated vectorized CPU-burn kernel: Θ(2^n) C-speed work per
    record (SURVEY P8 allows any burn with the 2^n cost shape). The
    faithful per-record solver above pays ~100 µs of interpreter overhead
    per call — an unfair handicap vs. the reference's JVM-compiled kernel;
    this variant burns the same asymptotic work via numpy so the BENCH
    measures engine throughput, not Python dispatch. Per-record cost is
    calibrated to the reference's (``BURN_ADDS_PER_MOVE``). Returns
    wall-micros attributed per record (batch time / batch size per
    height group)."""
    import numpy as np

    out = np.zeros(len(heights), dtype="int64")
    hv = heights.to_numpy()
    for n in np.unique(hv):
        idx = np.nonzero(hv == n)[0]
        reps = len(idx)
        t0 = time.perf_counter_ns()
        _burn_adds(((1 << int(n)) - 1) * BURN_ADDS_PER_MOVE * reps)
        out[idx] = (time.perf_counter_ns() - t0) // 1000 // max(reps, 1)
    return pd.Series(out)
