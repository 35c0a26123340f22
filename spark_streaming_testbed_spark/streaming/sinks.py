"""Streaming sinks (SURVEY.md §2.1 S4/S5).

The reference's sinks are a console printer (collect + println per batch,
SimpleStreamingApp.scala:87-91) and a TCP broadcast writer
(DataGeneratorActor.scala:206-216). Rebuilt as distributed sinks:

- :func:`foreach_batch_tsv` — ``foreachBatch`` writer appending the
  reference's TSV lines as text files per epoch (the scalable replacement
  for collect-to-console: executors write, the driver never sees rows);
- ``format("console")`` remains available for debugging via
  :func:`console_sink`;
- a socket/Kafka broadcast sink is environment-dependent and stubbed
  behind :func:`socket_sink` (no broker/socket peer in this container).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame

from .pipeline import tsv_lines


def foreach_batch_tsv(out_dir: str) -> Callable[[DataFrame, int], None]:
    """Returns a foreachBatch function writing each epoch's stats as TSV
    text under ``out_dir/epoch=N/`` — idempotent per epoch (overwrite), so
    replays after failure keep exactly-once file contents."""

    def write(batch_df: DataFrame, epoch_id: int) -> None:
        (
            tsv_lines(batch_df)
            .write.mode("overwrite")
            .text(f"{out_dir}/epoch={epoch_id}")
        )

    return write


def console_sink(stats: DataFrame, **options):
    """Debug sink: the reference's console printer, distributed."""
    return (
        stats.writeStream.outputMode("update")
        .format("console")
        .options(**options)
    )


def socket_sink(*_args, **_kwargs):
    """TCP broadcast sink (S5). STUB: requires a socket peer / Kafka
    broker not present in this environment; the wire payload itself is
    covered by the oracle-checked ``wire_format_batches`` query."""
    raise NotImplementedError(
        "socket/Kafka sink needs an external endpoint; use "
        "foreach_batch_tsv or console_sink in this environment"
    )
