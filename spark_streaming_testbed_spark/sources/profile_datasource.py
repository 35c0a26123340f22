"""Spark 4 Python DataSource for rate-profile plans (SURVEY.md §2.7 F4).

The reference implements a custom receiver contract
(``SubscriberInputDStream`` + the toy-rs-tcp ``Publisher/Subscriber``
factories, simple-streaming-app rs/SubscriberInputDStream.scala:13-49) to
pull demand-driven data into Spark. The Spark-4-native equivalent is the
Python DataSource API: this module registers ``format("rate_profile")``
with

- a **batch reader** that partitions the plan's seconds across tasks
  (column pruning-friendly: fixed 3-column schema), and
- a **streaming reader** whose per-microbatch offset range advances
  ``seconds_per_batch`` plan-seconds at a time — admission control as
  offsets, replacing the reactive-streams demand handshake (each trigger
  *requests* a bounded slice, exactly like ``Subscription.request(n)``).

Options: ``plan`` (JSON test plan), ``max_seconds`` (bound for unbounded
plans), ``epoch_ms`` (timestamp anchor), ``stream_id``,
``seconds_per_batch`` (streaming admission quantum).
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)
from pyspark.sql.types import (
    IntegerType,
    StructField,
    StructType,
    TimestampType,
)

from ..plans.phases import TestPlan, parse_plan
from .profile_source import DEFAULT_EPOCH_MS

SCHEMA = StructType([
    StructField("ts", TimestampType()),
    StructField("value", IntegerType()),
    StructField("stream_id", IntegerType()),
])


def _rows_for_seconds(
    plan: TestPlan, lo: int, hi: int, epoch_ms: int, stream_id: int
) -> Iterator[tuple]:
    import datetime

    for second in range(lo, hi):
        for dat in plan.values_for(second):
            ts = datetime.datetime.fromtimestamp(
                (epoch_ms + dat.time_ms) / 1000.0, tz=datetime.timezone.utc
            ).replace(tzinfo=None)
            for v in dat.values:
                yield (ts, int(v), stream_id)


class _SecondsRange(InputPartition):
    def __init__(self, lo: int, hi: int) -> None:
        self.lo, self.hi = lo, hi


class ProfileBatchReader(DataSourceReader):
    def __init__(self, options: dict) -> None:
        self.plan = parse_plan(options["plan"])
        self.max_seconds = int(options.get("max_seconds", 0)) or None
        self.epoch_ms = int(options.get("epoch_ms", DEFAULT_EPOCH_MS))
        self.stream_id = int(options.get("stream_id", 0))
        self.tasks = int(options.get("tasks", 8))

    def partitions(self) -> list[InputPartition]:
        total = self.plan.duration if self.max_seconds is None else self.max_seconds
        if total is None:
            raise ValueError("unbounded plan: set max_seconds")
        step = max(1, -(-total // self.tasks))
        return [
            _SecondsRange(lo, min(lo + step, total))
            for lo in range(0, total, step)
        ]

    def read(self, partition: _SecondsRange) -> Iterator[tuple]:
        return _rows_for_seconds(
            self.plan, partition.lo, partition.hi, self.epoch_ms, self.stream_id
        )


class ProfileStreamReader(SimpleDataSourceStreamReader):
    """Offsets are plan-seconds; each microbatch admits a bounded slice —
    the structured-streaming form of demand signaling (T4)."""

    def __init__(self, options: dict) -> None:
        self.plan = parse_plan(options["plan"])
        self.max_seconds = int(options.get("max_seconds", 0)) or None
        self.epoch_ms = int(options.get("epoch_ms", DEFAULT_EPOCH_MS))
        self.stream_id = int(options.get("stream_id", 0))
        self.quantum = int(options.get("seconds_per_batch", 1))

    def initialOffset(self) -> dict:
        return {"second": 0}

    def _end_second(self) -> int:
        total = self.plan.duration if self.max_seconds is None else self.max_seconds
        if total is None:
            raise ValueError("unbounded plan: set max_seconds")
        return total

    def read(self, start: dict) -> tuple[Iterator[tuple], dict]:
        lo = start["second"]
        hi = min(lo + self.quantum, self._end_second())
        # the runner copies/pickles the prefetched batch and calls next()
        # on it → must be a list_iterator (picklable), not a generator
        rows = list(
            _rows_for_seconds(self.plan, lo, hi, self.epoch_ms, self.stream_id)
        )
        return iter(rows), {"second": hi}

    def readBetweenOffsets(self, start: dict, end: dict) -> Iterator[tuple]:
        return list(
            _rows_for_seconds(
                self.plan, start["second"], end["second"],
                self.epoch_ms, self.stream_id,
            )
        )


class ProfileDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "rate_profile"

    def schema(self) -> StructType:
        return SCHEMA

    def reader(self, schema: StructType) -> ProfileBatchReader:
        return ProfileBatchReader(self.options)

    def simpleStreamReader(self, schema: StructType) -> ProfileStreamReader:
        return ProfileStreamReader(self.options)


def register(spark) -> None:
    from ..session import ensure_session_confs

    ensure_session_confs(spark)  # ships the package to Python workers
    spark.dataSource.register(ProfileDataSource)
