"""Live metrics → PID bridge (SURVEY.md §2.6 T2, §4 "custom" tier).

``RateFeedbackListener`` subscribes to Structured Streaming progress
events, extracts the per-batch observables the reference's estimator
consumed (batch duration, input rows, trigger timestamp) and feeds the
:class:`~.controller.PIDRateController`. The resulting estimates form
the ``feedback`` table of the log-lake (the ``Received a new rate
limit`` stream the reference logs at ReceiverLogData.scala:24-29) —
apply them to the next run's per-trigger source limits
(``maxFilesPerTrigger`` / ``maxOffsetsPerTrigger`` / the
``rate_profile`` DataSource's ``seconds_per_batch``).
"""

from __future__ import annotations

import datetime

from pyspark.sql.streaming import StreamingQueryListener

from .controller import PIDRateController


class RateFeedbackListener(StreamingQueryListener):
    """Collects (time_ms, rows, duration_ms) per completed micro-batch
    and the PID's rate estimate after each.

    With ``control_file`` set, every estimate is atomically published to
    that path as ``{"rate": <rows/sec>}`` — the ``rate_profile``
    DataSource polls the same file each trigger, so the loop is closed
    on the *running* query (the reference's mid-run ``updateRateLimit``,
    SubscriberInputDStream.scala:43-48)."""

    def __init__(
        self,
        controller: PIDRateController | None = None,
        control_file: str | None = None,
    ) -> None:
        self.controller = controller or PIDRateController()
        self.control_file = control_file
        self.samples: list[dict] = []
        self.estimates: list[float] = []

    def _publish(self, rate: float) -> None:
        if not self.control_file:
            return
        import json
        import os

        tmp = f"{self.control_file}.tmp"
        with open(tmp, "w") as fh:
            json.dump({"rate": rate}, fh)
        os.replace(tmp, self.control_file)  # atomic vs reader polls

    def onQueryStarted(self, event) -> None:  # noqa: N802
        pass

    def onQueryProgress(self, event) -> None:  # noqa: N802
        p = event.progress
        rows = p.numInputRows
        duration = (p.durationMs or {}).get("triggerExecution", 0)
        ts = p.timestamp  # ISO-8601
        time_ms = datetime.datetime.fromisoformat(
            ts.replace("Z", "+00:00")
        ).timestamp() * 1000
        self.samples.append(
            {"time_ms": time_ms, "rows": rows, "duration_ms": duration}
        )
        if rows and duration:
            est = self.controller.update(
                time_ms=time_ms,
                num_elements=rows,
                processing_delay_ms=duration,
                scheduling_delay_ms=0.0,
            )
            if est is not None:
                self.estimates.append(est)
                self._publish(est)

    def onQueryTerminated(self, event) -> None:  # noqa: N802
        pass

    def onQueryIdle(self, event) -> None:  # noqa: N802
        pass
