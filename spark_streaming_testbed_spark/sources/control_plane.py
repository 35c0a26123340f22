"""HTTP control plane: the testbed's plan-submission endpoint.

The reference testbed is a Play app whose ``POST /postPlan`` body is a
HOCON test plan; on receipt the data generator switches to the new plan
(testbed controllers/Application.scala:18-28, conf/routes). Rebuilt on
the stdlib HTTP server:

- ``POST /postPlan`` — body is a plan in HOCON *or* JSON; parsed with
  the same :func:`..plans.phases.parse_plan`, installed as the current
  plan, and answered with the reference's ``all clear``.
- ``GET /`` — liveness + current plan summary as JSON, or, when the
  client asks for ``text/html``, the browser form the Play index page
  renders (textarea + submit posting the raw body to ``postPlan``,
  testbed/app/views/index.scala.html).

The installed plan feeds whatever generator the caller wires in:
``on_plan`` receives each parsed :class:`TestPlan` (e.g. start a
``ProfileSocketServer`` or ``RsDemandServer``), mirroring the actor
message the Play controller sends.
"""

from __future__ import annotations

import json
import threading
from collections.abc import Callable
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

from ..plans.phases import TestPlan, parse_plan

#: The Play index page's behavior re-expressed (a textarea whose raw
#: contents POST to /postPlan as text/plain — reference
#: testbed/app/views/index.scala.html): submit a HOCON or JSON plan from
#: a browser. Served on GET / when the client prefers text/html.
INDEX_HTML = """<!DOCTYPE html>
<html>
<head><title>spark streaming test bed</title></head>
<body>
  <script>
    function sendPlan() {
      var xhr = new XMLHttpRequest();
      xhr.open("POST", "postPlan", true);
      xhr.setRequestHeader("Content-type", "text/plain");
      xhr.send(document.getElementById("plan").value);
    }
  </script>
  <h1>Your test plan:</h1>
  <div><textarea cols="60" rows="40" id="plan"></textarea></div>
  <div><button onclick="sendPlan()">Submit</button></div>
</body>
</html>
"""


def plan_spec(obj) -> dict:
    """Recursively serialize a parsed plan/phase dataclass to a JSON-safe
    dict with a ``type`` discriminator — what ``GET /`` reports as the
    running plan (the Play index page's analog,
    testbed/app/controllers/Application.scala:13-16, conf/routes:6)."""
    import dataclasses

    out: dict = {"type": type(obj).__name__}
    for f in dataclasses.fields(obj):
        v = getattr(obj, f.name)
        if isinstance(v, list):
            v = [
                plan_spec(x) if dataclasses.is_dataclass(x) else x
                for x in v
            ]
        elif dataclasses.is_dataclass(v):
            v = plan_spec(v)
        out[f.name] = v
    return out


class ControlPlaneServer:
    """Threaded HTTP endpoint accepting test plans (see module docstring)."""

    def __init__(
        self,
        on_plan: Callable[[TestPlan], None] | None = None,
        host: str = "127.0.0.1",
    ) -> None:
        self.current_plan: TestPlan | None = None
        self.plans_received = 0
        outer = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *args) -> None:  # quiet test runs
                pass

            def _reply(
                self, code: int, body: str,
                content_type: str = "text/plain; charset=utf-8",
            ) -> None:
                payload = body.encode()
                self.send_response(code)
                self.send_header("Content-Type", content_type)
                self.send_header("Content-Length", str(len(payload)))
                self.end_headers()
                self.wfile.write(payload)

            def do_GET(self) -> None:  # noqa: N802
                if self.path != "/":
                    self._reply(404, "not found")
                    return
                if "text/html" in self.headers.get("Accept", ""):
                    self._reply(200, INDEX_HTML,
                                content_type="text/html; charset=utf-8")
                    return
                plan = outer.current_plan
                summary = {
                    "plans_received": outer.plans_received,
                    "current_plan_duration": (
                        plan.duration if plan is not None else None
                    ),
                    "current_plan": (
                        plan_spec(plan) if plan is not None else None
                    ),
                }
                self._reply(200, json.dumps(summary))

            def do_POST(self) -> None:  # noqa: N802
                if self.path != "/postPlan":
                    self._reply(404, "not found")
                    return
                length = int(self.headers.get("Content-Length", 0))
                body = self.rfile.read(length).decode()
                if not body.strip():
                    # the reference logs "No plan received" and still 200s
                    self._reply(200, "all clear")
                    return
                try:
                    plan = parse_plan(body)
                except (ValueError, KeyError) as exc:
                    self._reply(400, f"bad plan: {exc}")
                    return
                outer.current_plan = plan
                outer.plans_received += 1
                if on_plan is not None:
                    on_plan(plan)
                self._reply(200, "all clear")

        self._httpd = ThreadingHTTPServer((host, 0), Handler)
        self.host, self.port = self._httpd.server_address
        self._thread = threading.Thread(
            target=self._httpd.serve_forever, daemon=True
        )
        self._thread.start()

    def close(self) -> None:
        self._httpd.shutdown()
        self._httpd.server_close()
        self._thread.join(timeout=2)
