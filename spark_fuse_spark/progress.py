"""Progress / event-log utilities (reference parity:
``/root/reference/src/spark_fuse/utils/progress.py`` — validated event
records, pluggable sinks incl. a buffered Delta table sink, Spark log
level control).  Differences: stdlib-only records (no pydantic/rich in
this container) and a parquet sink through the cdc TableStore seam so
the same code appends to Delta when delta-spark is present.
"""

from __future__ import annotations

import json
import sys
import time
from dataclasses import asdict, dataclass, field
from typing import Any, Mapping

from pyspark.sql import SparkSession

__all__ = [
    "LogEventRecord",
    "EventSink",
    "ConsoleEventSink",
    "TableEventSink",
    "ProgressBarSink",
    "HtmlCardSink",
    "render_status_card",
    "ProgressTracker",
    "enable_spark_logging",
]


@dataclass
class LogEventRecord:
    """One pipeline progress event (reference ``progress.py:33-64``)."""

    event: str
    status: str = "info"
    detail: "str | None" = None
    metrics: "Mapping[str, float] | None" = None
    ts: float = field(default_factory=time.time)

    def validate(self) -> "LogEventRecord":
        if not self.event:
            raise ValueError("event name must be non-empty")
        if self.status not in ("info", "start", "success", "warning", "error"):
            raise ValueError(f"invalid status {self.status!r}")
        return self


class EventSink:
    def write(self, record: LogEventRecord) -> None:
        raise NotImplementedError

    def flush(self) -> None:
        return None


class ConsoleEventSink(EventSink):
    def __init__(self, stream=None):
        self.stream = stream or sys.stderr

    def write(self, record: LogEventRecord) -> None:
        payload = {k: v for k, v in asdict(record).items() if v is not None}
        print(json.dumps(payload, default=str), file=self.stream)


class TableEventSink(EventSink):
    """Buffered sink appending event batches to a table every
    ``flush_every`` records (reference ``DeltaEventSink``,
    ``progress.py:66-83``)."""

    def __init__(self, spark: SparkSession, target: str, flush_every: int = 50):
        if flush_every <= 0:
            raise ValueError("flush_every must be positive")
        self.spark = spark
        self.target = target
        self.flush_every = flush_every
        self._buffer: list[LogEventRecord] = []

    def write(self, record: LogEventRecord) -> None:
        self._buffer.append(record.validate())
        if len(self._buffer) >= self.flush_every:
            self.flush()

    def flush(self) -> None:
        if not self._buffer:
            return
        from spark_fuse_spark.cdc.store import get_store

        rows = [
            (r.event, r.status, r.detail, json.dumps(dict(r.metrics or {})), float(r.ts))
            for r in self._buffer
        ]
        df = self.spark.createDataFrame(
            rows, "event string, status string, detail string, metrics_json string, ts double"
        )
        get_store().append(df.coalesce(1), self.target)
        self._buffer = []


class ProgressBarSink(EventSink):
    """Terminal progress bar over the event stream (reference
    ``progress.py:258-276`` drives a tqdm bar per step; same surface
    here).  Uses tqdm when importable; otherwise a dependency-free
    carriage-return bar with the same fields (description = STATUS:
    event, postfix = Δ since last step + total elapsed).

    ``total`` is the number of expected ``advance``-ing events; events
    with status ``info``/``warning`` refresh without advancing, matching
    the reference's advance-by-zero refresh behavior.
    """

    _ADVANCING = ("start", "success", "error")

    def __init__(self, total: int, stream=None, width: int = 30):
        if total <= 0:
            raise ValueError("total must be positive")
        self.total = total
        self.current = 0
        self.width = width
        self.stream = stream or sys.stderr
        self._t0 = time.perf_counter()
        self._last = self._t0
        self._bar = None
        if stream is None:  # only take over a real terminal with tqdm
            try:
                from tqdm.auto import tqdm  # noqa: PLC0415

                self._bar = tqdm(total=total, dynamic_ncols=True)
            except Exception:
                self._bar = None

    def _label(self, record: LogEventRecord) -> str:
        prefix = record.status.upper()
        return f"{prefix}: {record.event}" if prefix != "INFO" else record.event

    def write(self, record: LogEventRecord) -> None:
        now = time.perf_counter()
        advance = 1 if record.status in self._ADVANCING else 0
        self.current = min(self.total, self.current + advance)
        postfix = f"+{now - self._last:.2f}s, total {now - self._t0:.2f}s"
        if advance:
            self._last = now
        if self._bar is not None:
            self._bar.set_description_str(self._label(record))
            self._bar.set_postfix_str(postfix)
            self._bar.update(advance) if advance else self._bar.refresh()
            if self.current >= self.total:
                self._bar.close()
                self._bar = None
            return
        filled = int(self.width * self.current / self.total)
        bar = "#" * filled + "-" * (self.width - filled)
        end = "\n" if self.current >= self.total else ""
        print(
            f"\r[{bar}] {self.current}/{self.total} {self._label(record)} ({postfix})",
            end=end,
            file=self.stream,
            flush=True,
        )

    def flush(self) -> None:
        if self._bar is not None:
            self._bar.close()
            self._bar = None


_CARD_STYLES = {
    # status -> (accent color, icon)
    "info": ("#1565c0", "i"),
    "start": ("#6a1b9a", "▶"),
    "success": ("#2e7d32", "✓"),
    "warning": ("#e65100", "!"),
    "error": ("#c62828", "✗"),
}


def render_status_card(record: LogEventRecord, step: "int | None" = None,
                       total: "int | None" = None) -> str:
    """Self-contained HTML status card for one event (the reference
    renders per-event cards via Databricks ``displayHTML``,
    ``progress.py:132-258``; markup here is original)."""
    from html import escape

    color, icon = _CARD_STYLES.get(record.status, _CARD_STYLES["info"])
    metrics = ""
    if record.metrics:
        cells = "".join(
            f"<div><strong>{escape(str(k))}:</strong> {escape(str(v))}</div>"
            for k, v in record.metrics.items()
        )
        metrics = f'<div style="font-size:12px">{cells}</div>'
    steps = (
        f'<div style="font-size:12px"><strong>Step:</strong> {step} / {total}</div>'
        if step is not None and total is not None
        else ""
    )
    detail = (
        f'<div style="font-size:12px">{escape(record.detail)}</div>'
        if record.detail
        else ""
    )
    return (
        f'<div style="border-left:4px solid {color};padding:6px 10px;'
        f'font-family:sans-serif;margin:4px 0">'
        f'<div style="color:{color};font-weight:bold">{icon} {escape(record.event)}'
        f" [{escape(record.status)}]</div>{detail}{steps}{metrics}</div>"
    )


class HtmlCardSink(EventSink):
    """Render each event as an HTML card in whatever display surface
    exists: Databricks ``displayHTML`` → IPython ``display(HTML)`` →
    plain print (the reference's fallback chain,
    ``progress.py:132-151``).  A ``display`` callable can be injected
    for testing or custom routing."""

    def __init__(self, display=None, track_steps: "int | None" = None):
        self._display = display
        self.total = track_steps
        self.current = 0

    def _route(self, html: str) -> None:
        if self._display is not None:
            self._display(html)
            return
        try:  # Databricks notebook global
            displayHTML(html)  # type: ignore[name-defined]  # noqa: F821
            return
        except NameError:
            pass
        try:
            from IPython import get_ipython  # noqa: PLC0415
            from IPython.display import HTML, display  # noqa: PLC0415

            # only route through IPython inside a real interactive shell;
            # display() outside one prints a useless repr
            if get_ipython() is not None:
                display(HTML(html))
                return
        except Exception:
            pass
        print(html)

    def write(self, record: LogEventRecord) -> None:
        step = None
        if self.total is not None:
            if record.status in ProgressBarSink._ADVANCING:
                self.current = min(self.total, self.current + 1)
            step = self.current
        self._route(render_status_card(record, step=step, total=self.total))


class ProgressTracker:
    """Driver-side progress fan-out to any number of sinks."""

    def __init__(self, *sinks: EventSink):
        self.sinks = list(sinks) or [ConsoleEventSink()]

    def log(self, event: str, status: str = "info", detail: "str | None" = None,
            **metrics: float) -> None:
        record = LogEventRecord(
            event=event, status=status, detail=detail, metrics=metrics or None
        ).validate()
        for sink in self.sinks:
            sink.write(record)

    def close(self) -> None:
        for sink in self.sinks:
            sink.flush()

    def __enter__(self) -> "ProgressTracker":
        return self

    def __exit__(self, *exc: Any) -> None:
        self.close()


def enable_spark_logging(spark: SparkSession, level: str = "WARN") -> None:
    """Set the Spark log level (reference ``progress.py:26-30`` also pokes
    Log4j categories through the JVM gateway; ``setLogLevel`` covers the
    supported public surface)."""
    spark.sparkContext.setLogLevel(level)


def observe_rows(
    df: "DataFrame",
    name: str,
    *extra_metrics: "Column",
) -> "tuple[DataFrame, Observation]":
    """Attach a named :class:`~pyspark.sql.Observation` to a DataFrame:
    row count plus any extra aggregate expressions, collected as a side
    effect of whatever action the caller runs — NO extra job, NO second
    scan (this is the executor-accumulator mechanism underneath, the
    idiomatic Spark replacement for the reference's hand-rolled counter
    accumulators, ``utils/progress.py`` SURVEY §2.13 A8/E4).

    Returns ``(observed_df, observation)``; read ``observation.get``
    AFTER an action has materialized the observed frame::

        df, obs = observe_rows(result, "final", F.sum("revenue").alias("rev"))
        df.write.parquet(...)
        tracker.log("wrote final", **obs.get)

    Works on batch frames; for streams use the StreamingQueryListener
    path (observations surface per micro-batch in ``progress.observedMetrics``).
    """
    from pyspark.sql import Observation
    from pyspark.sql import functions as F

    obs = Observation(name)
    metrics = (F.count(F.lit(1)).alias("n_rows"), *extra_metrics)
    return df.observe(obs, *metrics), obs


def streaming_progress_listener(tracker: "ProgressTracker"):
    """Bridge Structured Streaming progress into the event-sink fan-out:
    a :class:`~pyspark.sql.streaming.StreamingQueryListener` that logs
    one record per micro-batch (rows/sec, batch rows, batch id) and one
    on termination, through whatever sinks the tracker carries (console,
    table, progress bar, HTML cards).

    Attach with ``spark.streams.addListener(listener)``; detach with
    ``removeListener``.  Observed metrics attached via
    :func:`observe_rows` surface per micro-batch in
    ``progress.observedMetrics`` and are folded into the record.
    """
    from pyspark.sql.streaming import StreamingQueryListener

    class _TrackerListener(StreamingQueryListener):
        def onQueryStarted(self, event) -> None:
            tracker.log(f"stream {event.name or event.id} started", status="info")

        def onQueryProgress(self, event) -> None:
            p = event.progress
            metrics: dict = {
                "batch_id": float(p.batchId),
                "input_rows": float(p.numInputRows),
            }
            if p.inputRowsPerSecond is not None:
                metrics["rows_per_sec"] = float(p.inputRowsPerSecond)
            for name, row in (p.observedMetrics or {}).items():
                for k, v in row.asDict().items():
                    if isinstance(v, (int, float)):
                        metrics[f"{name}.{k}"] = float(v)
            tracker.log(f"stream {p.name or p.id} progress", status="info", **metrics)

        def onQueryIdle(self, event) -> None:
            pass

        def onQueryTerminated(self, event) -> None:
            status = "error" if event.exception else "done"
            tracker.log(f"stream {event.id} terminated", status=status,
                        detail=event.exception)

    return _TrackerListener()
