"""Reactive-streams-over-TCP demand wire (S2/T4): live two-way demand
signaling between a publisher and a Spark streaming query, plus the
reference's drop-the-excess paced semantics."""

from __future__ import annotations

import socket
import time

from spark_streaming_testbed_spark.plans import parse_plan
from spark_streaming_testbed_spark.sources.rs_tcp import (
    RsDemandServer,
    register,
    rs_tcp_roundtrip,
)

PLAN_100X4 = (
    '{"sequence": [{"type": "fixed", "value": 9, "rate": 100, "duration": 4}]}'
)


def test_paced_mode_drops_the_excess():
    """Reference semantics (DataGeneratorActor.scala:259-276): demand 150
    against 4 seconds of 100 values → deliver 100 then 50, drop the
    surplus 50 of second 1 AND zero the demand, then drop everything."""
    server = RsDemandServer(parse_plan(PLAN_100X4), mode="paced")
    try:
        c = socket.create_connection((server.host, server.port), timeout=5)
        c.sendall(b"150\n")
        buf = b""
        c.settimeout(5)
        try:
            while True:
                chunk = c.recv(65536)
                if not chunk:
                    break
                buf += chunk
        except TimeoutError:
            pass
        c.close()
        deadline = time.time() + 5
        while len(server.accounting) < 4 and time.time() < deadline:
            time.sleep(0.05)
    finally:
        server.close()
    values = [int(x) for x in buf.decode().split()]
    assert values == [9] * 150
    acct = server.accounting
    assert [a["delivered"] for a in acct] == [100, 50, 0, 0]
    assert [a["dropped"] for a in acct] == [0, 50, 100, 100]
    assert [a["requested"] for a in acct] == [150, 50, 0, 0]
    # conservation: offered = delivered + dropped, every second
    assert all(a["offered"] == a["delivered"] + a["dropped"] for a in acct)


def test_demand_mode_serves_exact_requests():
    server = RsDemandServer(parse_plan(PLAN_100X4), mode="demand")
    try:
        c = socket.create_connection((server.host, server.port), timeout=5)
        fh = c.makefile("r")
        got = []
        for n in (7, 123, 400):  # last request over-asks; gets remainder
            c.sendall(f"{n}\n".encode())
            for _ in range(n):
                line = fh.readline()
                if not line:
                    break
                got.append(int(line))
    finally:
        c.close()
        server.close()
    assert got == [9] * 400  # 7 + 123 + 270-remainder, nothing lost


def test_rs_tcp_spark_source_roundtrip(spark):
    """The full contract query: Spark requests demand per trigger over
    the wire and the delivered counts match the plan arithmetic."""
    rows = {r.value: r.cnt for r in rs_tcp_roundtrip(spark, "").collect()}
    assert rows == {7: 500, 8: 360}


def test_rs_tcp_source_respects_trigger_budget(spark):
    """Each micro-batch admits at most rows_per_trigger rows — demand
    slicing is real, not one big gulp."""
    import uuid

    from pyspark.sql import functions as F

    server = RsDemandServer(parse_plan(PLAN_100X4), mode="demand")
    try:
        register(spark)
        stream = (
            spark.readStream.format("rs_tcp")
            .option("port", server.port)
            .option("rows_per_trigger", 120)
            .load()
        )
        agg = stream.groupBy().agg(
            F.count(F.lit(1)).alias("n"), F.max("idx").alias("mx")
        )
        name = f"rsb_{uuid.uuid4().hex[:8]}"
        q = (
            agg.writeStream.outputMode("complete")
            .format("memory").queryName(name).start()
        )
        q.processAllAvailable()
        batches = [
            p.numInputRows
            for p in [q.lastProgress]
            if p is not None
        ]
        q.stop()
    finally:
        server.close()
    row = spark.table(name).collect()[0]
    assert row.n == 400 and row.mx == 399
    assert all(b <= 120 for b in batches)
