"""HTTP control plane: POST /postPlan accepts HOCON and JSON plans and
hands them to the generator callback (reference Play endpoint parity)."""

from __future__ import annotations

import urllib.request

from spark_streaming_testbed_spark.sources.control_plane import (
    ControlPlaneServer,
)

HOCON_PLAN = """
sequence = [
  { type = fixed
    value = 7
    rate = 50
    duration = 2
  }
]
"""


def _post(url: str, body: str) -> tuple[int, str]:
    req = urllib.request.Request(
        url, data=body.encode(), method="POST",
        headers={"Content-Type": "text/plain"},
    )
    with urllib.request.urlopen(req, timeout=5) as resp:
        return resp.status, resp.read().decode()


def test_post_plan_hocon_and_json_roundtrip():
    received = []
    server = ControlPlaneServer(on_plan=received.append)
    base = f"http://{server.host}:{server.port}"
    try:
        status, body = _post(f"{base}/postPlan", HOCON_PLAN)
        assert (status, body) == (200, "all clear")
        assert received[-1].duration == 2
        assert len(received[-1].values_for(0)) > 0

        status, body = _post(
            f"{base}/postPlan",
            '{"sequence": [{"type": "noop", "duration": 5}]}',
        )
        assert (status, body) == (200, "all clear")
        assert received[-1].duration == 5

        with urllib.request.urlopen(base + "/", timeout=5) as resp:
            import json

            summary = json.loads(resp.read())
        assert summary["plans_received"] == 2
        assert summary["current_plan_duration"] == 5
        # GET / reports the running plan itself as JSON (Play index parity)
        assert summary["current_plan"]["type"] == "TestPlan"
        assert summary["current_plan"]["phases"][0]["type"] == "NoopPhase"
        assert summary["current_plan"]["phases"][0]["duration"] == 5

        # and the full POST -> GET roundtrip for a data-bearing plan
        _post(f"{base}/postPlan", HOCON_PLAN)
        with urllib.request.urlopen(base + "/", timeout=5) as resp:
            summary = json.loads(resp.read())
        fixed = summary["current_plan"]["phases"][0]
        assert fixed["type"] == "FixedPhase"
        assert (fixed["value"], fixed["rate"], fixed["duration"]) == (7, 50, 2)
    finally:
        server.close()


def test_post_plan_edge_cases():
    server = ControlPlaneServer()
    base = f"http://{server.host}:{server.port}"
    try:
        # empty body: the reference logs "No plan received" and still 200s
        status, body = _post(f"{base}/postPlan", "")
        assert (status, body) == (200, "all clear")
        assert server.plans_received == 0
        # malformed plan: 400
        import urllib.error

        try:
            _post(f"{base}/postPlan", '{"sequence": [{"type": "bogus"}]}')
            raise AssertionError("expected HTTPError")
        except urllib.error.HTTPError as e:
            assert e.code == 400
        # bad route: 404 on both verbs (reference ApplicationSpec.scala:18-28
        # asserts "send 404 on a bad request"; index render covered above)
        try:
            _post(f"{base}/boum", "x")
            raise AssertionError("expected HTTPError")
        except urllib.error.HTTPError as e:
            assert e.code == 404
        try:
            urllib.request.urlopen(f"{base}/boum", timeout=5)
            raise AssertionError("expected HTTPError")
        except urllib.error.HTTPError as e:
            assert e.code == 404
        # browser index render (reference index.scala.html: a textarea
        # posting its raw contents to postPlan) via content negotiation
        req = urllib.request.Request(
            base + "/", headers={"Accept": "text/html"})
        with urllib.request.urlopen(req, timeout=5) as resp:
            assert resp.headers["Content-Type"].startswith("text/html")
            html = resp.read().decode()
        assert "Your test plan:" in html
        assert "postPlan" in html and "textarea" in html
    finally:
        server.close()


def test_control_plane_drives_live_generator(spark):
    """End-to-end: a plan POSTed over HTTP starts a demand-wire publisher
    whose values a Spark stream then consumes — the full reference flow
    (Play endpoint → generator actor → TCP stream)."""
    import uuid

    from pyspark.sql import functions as F

    from spark_streaming_testbed_spark.sources.rs_tcp import (
        RsDemandServer,
        register,
    )

    publishers = []
    server = ControlPlaneServer(
        on_plan=lambda plan: publishers.append(
            RsDemandServer(plan, mode="demand")
        )
    )
    try:
        _post(
            f"http://{server.host}:{server.port}/postPlan", HOCON_PLAN
        )
        pub = publishers[0]
        register(spark)
        stream = (
            spark.readStream.format("rs_tcp")
            .option("port", pub.port)
            .option("rows_per_trigger", 60)
            .load()
        )
        name = f"cp_{uuid.uuid4().hex[:8]}"
        q = (
            stream.groupBy("value").agg(F.count(F.lit(1)).alias("cnt"))
            .writeStream.outputMode("complete")
            .format("memory").queryName(name).start()
        )
        q.processAllAvailable()
        q.stop()
        rows = {r.value: r.cnt for r in spark.table(name).collect()}
        assert rows == {7: 100}  # 50/s × 2 s from the POSTed plan
    finally:
        for p in publishers:
            p.close()
        server.close()
