"""End-to-end log-processor parity: synthesize a full run directory
(run.log / application.log / receiver logs), load the lake, and run the
reference Main's whole flow — time shift, rollups, dedup, pivot, extent,
dump (log-processor Main.scala:10-32 / TestData.scala:178-260)."""

from __future__ import annotations

import pathlib
import tempfile

from spark_streaming_testbed_spark.sources import loglake


def _write_run_dir(tmp: str) -> str:
    d = pathlib.Path(tmp)
    (d / "run.log").write_text(
        "\n".join(
            [
                "2015-06-16 12:30:03,100+0000 INFO B: Added input-0-1 (size: 1 KB, free: 100.0 MB)",
                "2015-06-16 12:30:04,100+0000 INFO B: Added input-0-2 (size: 1 KB, free: 90.5 MB)",
                "batch result: 1434457808277\t1434457805000\t7\t0\t100",
                "batch result: 1434457808279\t1434457805000\t8\t0\t50",
                "batch result: 1434457813280\t1434457810000\t7\t0\t200",
                "time = 1434457808000, # records = 150, processing time = 3000, scheduling delay = 10",
                "time = 1434457813000, # records = 0, processing time = 0, scheduling delay = 0",
                "junk line that matches nothing",
            ]
        )
    )
    (d / "application.log").write_text(
        "\n".join(
            [
                "2015-06-16 12:30:03.000+0000 INFO DataGeneratorActor: At tick 1, 30 times 7",
                "2015-06-16 12:30:03.200+0000 WARN x: unable to deliver 5 values to client 0",
                "2015-06-16 12:30:03.900+0000 WARN x: unable to deliver 7 values to client 0",
                "2015-06-16 12:30:04.100+0000 INFO x: received request for 64 values from client 0",
            ]
        )
    )
    (d / "receiver_0.log").write_text(
        "2015-06-16 12:30:05,000+0000 INFO R: Received a new rate limit for 0 : 1200.\n"
        "2015-06-16 12:30:05,100+0000 DEBUG D: Dropping for stream 0 block with ratio of 0.25.\n"
    )
    return str(d)


def test_full_log_pipeline(spark):
    with tempfile.TemporaryDirectory() as tmp:
        base = _write_run_dir(tmp)
        tables = loglake.load_loglake(spark, base)

        assert tables["memory"].count() == 2
        assert tables["execution"].count() == 3
        assert tables["pid"].count() == 1  # zero-record row dropped
        assert tables["tick"].count() == 1
        assert tables["dropped"].count() == 2
        assert tables["requested"].count() == 1
        assert tables["feedback"].count() == 1
        assert tables["ratio"].count() == 1

        # time shift anchors on first batch time
        shifted = loglake.time_shift_tables(tables)
        ex = {r.batch_time_ms for r in shifted["execution"].collect()}
        assert ex == {0, 5000}

        # per-second rollup of dropped: both events in the same second
        rolled = loglake.per_second_rollup(tables["dropped"]).collect()
        assert [(r["count"]) for r in rolled] == [12]

        # dedup + pivot + stacked counts
        dedup = loglake.execution_dedup(tables["execution"]).collect()
        assert [r.batch_time_ms for r in dedup] == [1434457805000, 1434457810000]
        piv = loglake.execution_pivot(tables["execution"])
        assert set(piv.columns) == {"batch_time_ms", "7", "8"}
        stacked = {
            r.batch_time_ms: (r.acc_7, r.acc_8)
            for r in loglake.stacked_counts(piv, ["7", "8"]).collect()
        }
        assert stacked[1434457805000] == (100, 150)
        assert stacked[1434457810000] == (200, None)  # missing 8 → null

        # global extent spans memory..feedback
        ext = loglake.global_extent(tables).collect()[0]
        assert ext.min_ms < ext.max_ms

        # dump writes '?' for nulls
        loglake.dump(
            loglake.stacked_counts(piv, ["7", "8"]), f"{tmp}/out"
        )
        body = "\n".join(r.value for r in spark.read.text(f"{tmp}/out").collect())
        assert "?" in body


def test_gnuplot_script_generator_matches_reference_layout(spark):
    """S10 presentation sink: the generated multiplot script must carry
    the reference generator's structure (Main.scala:36-158) — layout
    row count streams+2, 333·streams+666 terminal height, ±5000 ms
    xrange pad, per-stream execution stacks with $N column indexing,
    per-client panels, 1.2× tick headroom — driven purely by data
    extents."""
    with tempfile.TemporaryDirectory() as tmp:
        base = _write_run_dir(tmp)
        tables = loglake.load_loglake(spark, base)
        script = loglake.generate_gnuplot_script(tables, "my run")

        assert 'set multiplot layout 3, 1 title "my run"' in script  # 1 stream + 2
        assert "size 1500,999" in script  # 333*1 + 666
        # extent: execution times 1434457808277..1434457813280 padded 5000,
        # but global extent unions ALL time_ms columns (memory/tick rows
        # are earlier) — just assert the pad arithmetic appears
        assert "set xrange [ " in script
        lo = int(script.split("set xrange [ ")[1].split(" :")[0])
        hi = int(script.split(" : ", 1)[1].split(" ]")[0])
        assert hi - lo >= 10000  # both pads applied
        # stream panel: two distinct execution values -> $3 and $4 stacks
        assert 'using 2:($3) with filledcurve' in script
        assert 'using 2:($4) with filledcurve' in script
        # ratio + feedback panels present for stream 0
        assert '"ratio_0.log" using 1:2 axes x1y2' in script
        assert '"feedback_0.log" using 1:($2 * 5)' in script
        # client panel with requests and the single tick value column $2
        assert '"droppedValuesPerSecond_0.log" using 1:2 with boxes' in script
        assert '"requestedValuesPerSecond_0.log"' in script
        assert '"tick.log" using 1:($2) with fillsteps' in script
        # tick max count is 30 -> yrange headroom 36
        assert "set yrange [ 0 : 36 ]" in script
        assert script.strip().endswith("unset multiplot")
