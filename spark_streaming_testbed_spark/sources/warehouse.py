"""Batch warehouse layout: time+key partitioned parquet with bounded
file sizes, plus small-file compaction (SURVEY.md §7.4 item 7, "partition
by time + key").

The reference dumps flat CSV per run (`log-processor` `dump`,
Main.scala:103-117); at 100 TB the storage layout IS the query plan:
directory partitioning gives partition pruning (see
`tests/test_scale_patterns.py::test_partition_pruning_reads_one_day`),
and bounded file sizes keep scan tasks uniform. Two failure modes are
handled here:

- **Small files**: one writer task per (shuffle partition × directory)
  emits a file; naive writes of a wide-partitioned table produce millions
  of tiny files that drown the driver in listing and the scheduler in
  tasks. `write_partitioned` repartitions BY the partition columns first,
  so each directory is written by as few tasks as possible, while
  `maxRecordsPerFile` re-splits any directory that would otherwise become
  one giant file.
- **Drift**: streaming/appending pipelines accumulate small files over
  time; `compact` rewrites a dataset into right-sized files without
  changing its schema, partitioning, or row set.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_cols: list[str],
    *,
    max_records_per_file: int = 1_000_000,
    mode: str = "overwrite",
) -> None:
    """Write ``df`` as parquet partitioned by ``partition_cols`` with at
    most ``max_records_per_file`` rows per file.

    One shuffle aligns rows to their target directory (hash on the
    partition columns), so each directory receives data from exactly one
    task — the minimum file count. ``maxRecordsPerFile`` then re-splits
    oversized directories JVM-side, which bounds the worst file without a
    second shuffle. Skew note: a hot partition value lands on one task;
    at cluster scale add a salt column to ``repartition`` if one day/key
    dominates (the `skew_salted_agg` pattern)."""
    (
        df.repartition(*[F.col(c) for c in partition_cols])
        .write.option("maxRecordsPerFile", max_records_per_file)
        .partitionBy(*partition_cols)
        .mode(mode)
        .parquet(path)
    )


def compact(
    spark: SparkSession,
    src: str,
    dst: str,
    partition_cols: list[str],
    *,
    max_records_per_file: int = 1_000_000,
) -> DataFrame:
    """Rewrite the partitioned dataset at ``src`` into ``dst`` with
    right-sized files (same rows, schema, and directory layout).

    Reads with partition discovery, then reuses :func:`write_partitioned`
    — so compaction is one scan + one shuffle, no driver-side file
    juggling, and it scales with the cluster. ``dst`` must differ from
    ``src``: Spark cannot safely overwrite a path it is reading (callers
    swap directories after the write commits). Returns the compacted
    DataFrame for verification."""
    if src == dst:
        raise ValueError("compact: dst must differ from src (no in-place rewrite)")
    df = spark.read.parquet(src)
    write_partitioned(
        df, dst, partition_cols, max_records_per_file=max_records_per_file
    )
    return spark.read.parquet(dst)
