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
