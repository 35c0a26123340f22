"""Sink tests: foreachBatch TSV writer + loglake CSV dump."""

from __future__ import annotations

import tempfile

import pytest

from spark_streaming_testbed_spark.plans import parse_plan
from spark_streaming_testbed_spark.sources.profile_source import profile_stream
from spark_streaming_testbed_spark.streaming.pipeline import windowed_stats
from spark_streaming_testbed_spark.streaming.sinks import (
    foreach_batch_tsv,
    socket_sink,
)


def test_foreach_batch_tsv_sink_writes_all_epochs(spark):
    plan = parse_plan(
        '{"sequence": [{"type": "fixed", "value": 3, "rate": 20, "duration": 4}]}'
    )
    with tempfile.TemporaryDirectory() as tmp:
        stream = profile_stream(spark, plan, tmp, seconds_per_file=2)
        stats = windowed_stats(stream, window="2 seconds")
        q = (
            stats.writeStream.outputMode("update")
            .foreachBatch(foreach_batch_tsv(f"{tmp}/out"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        lines = spark.read.text(f"{tmp}/out/epoch=*").collect()
        # 4 seconds at 20/s in 2s windows → 2 windows of value 3 overall;
        # update mode re-emits windows touched per epoch, so ≥ 2 lines
        assert len(lines) >= 2
        for r in lines:
            parts = r.value.split("\t")
            assert len(parts) == 6
            assert parts[1] == "3"  # the value key


def test_loglake_dump_uses_question_mark_for_nulls(spark):
    from spark_streaming_testbed_spark.sources.loglake import dump

    df = spark.createDataFrame(
        [(1000, 5, None), (2000, None, 7)],
        "batch_time_ms long, a int, b int",
    )
    with tempfile.TemporaryDirectory() as tmp:
        dump(df, f"{tmp}/out")
        body = "\n".join(
            r.value for r in spark.read.text(f"{tmp}/out").collect()
        )
        assert "?" in body
        assert "1000 5 ?" in body or "2000 ? 7" in body


def test_socket_sink_broadcasts_tsv_to_live_clients(spark):
    """End-to-end S5: a windowed-stats stream written through the real
    TCP broadcast sink; two loopback clients each receive every line."""
    import socket

    from spark_streaming_testbed_spark.streaming.sinks import (
        SocketBroadcastServer,
    )

    plan = parse_plan(
        '{"sequence": [{"type": "fixed", "value": 3, "rate": 20, "duration": 4}]}'
    )
    server = SocketBroadcastServer()
    clients = []
    try:
        for _ in range(2):
            c = socket.create_connection((server.host, server.port), timeout=5)
            c.settimeout(5)
            clients.append(c)
        import time

        deadline = time.time() + 5
        while not server._conns and time.time() < deadline:
            time.sleep(0.02)
        with tempfile.TemporaryDirectory() as tmp:
            stream = profile_stream(spark, plan, tmp, seconds_per_file=2)
            stats = windowed_stats(stream, window="2 seconds")
            q = (
                socket_sink(stats, server, mode="complete")
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination()
        payloads = []
        for c in clients:
            buf = b""
            # complete mode: the final broadcast holds all 2 windows
            while b"\n" not in buf or buf.count(b"\n") < 2:
                chunk = c.recv(65536)
                if not chunk:
                    break
                buf += chunk
            payloads.append(buf.decode())
    finally:
        for c in clients:
            c.close()
        server.close()
    for payload in payloads:
        lines = [ln for ln in payload.splitlines() if ln]
        # take the LAST complete-mode emission: 2 windows of value 3
        final = lines[-2:]
        assert len(final) == 2
        for ln in final:
            parts = ln.split("\t")
            assert len(parts) == 6
            assert parts[1] == "3"
            assert parts[2] == "40"  # 2s windows at 20 rows/s


def test_socket_broadcast_server_prunes_dead_clients():
    import socket

    from spark_streaming_testbed_spark.streaming.sinks import (
        SocketBroadcastServer,
    )

    server = SocketBroadcastServer()
    try:
        c = socket.create_connection((server.host, server.port), timeout=5)
        import time

        deadline = time.time() + 5
        while not server._conns and time.time() < deadline:
            time.sleep(0.02)
        c.close()
        # first broadcast may still "succeed" into the socket buffer;
        # by the second the peer reset surfaces and the conn is pruned
        server.broadcast(b"x" * 65536)
        server.broadcast(b"x" * 65536)
        assert server.broadcast(b"y\n") == 0
    finally:
        server.close()
