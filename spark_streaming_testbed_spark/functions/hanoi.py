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


@F.pandas_udf(T.LongType())
def hanoi_burn_us(heights: pd.Series) -> pd.Series:
    """Calibrated vectorized CPU-burn kernel: Θ(2^n) C-speed work per
    record (SURVEY P8 allows any burn with the 2^n cost shape). The
    faithful per-record solver above pays ~100 µs of interpreter overhead
    per call — an unfair handicap vs. the reference's JVM-compiled kernel;
    this variant burns the same asymptotic work via numpy so the BENCH
    measures engine throughput, not Python dispatch. Returns wall-micros
    attributed per record (batch time / batch size per height group)."""
    import numpy as np

    out = np.zeros(len(heights), dtype="int64")
    hv = heights.to_numpy()
    for n in np.unique(hv):
        idx = np.nonzero(hv == n)[0]
        # CALIBRATION matches the reference's measured per-record cost
        # (≈0.031 ms at n=7, BASELINE.md): 2^7·256 ≈ 32.5k C-speed adds
        # ≈ tens of µs — same wall cost AND the same 2^n growth shape.
        reps, span = len(idx), ((1 << int(n)) - 1) * 256
        t0 = time.perf_counter_ns()
        total = np.broadcast_to(
            np.arange(span, dtype="int64"), (reps, span)
        ).sum()
        _ = total
        out[idx] = (time.perf_counter_ns() - t0) // 1000 // max(reps, 1)
    return pd.Series(out)
