"""Arrow-batched record emission for Python Data Source readers.

Spark's Python Data Source API accepts either per-row tuples or
``pyarrow.RecordBatch`` objects from ``DataSourceReader.read``.  Tuples
cross the Python↔JVM boundary through the pickle serializer one row at
a time; RecordBatches move columnar Arrow buffers in bulk — the same
reason Pandas UDFs beat row UDFs by 10-100×.  This helper upgrades a
normalized-dict record stream to RecordBatches whenever the declared
Spark schema converts cleanly to Arrow, and degrades to the tuple path
otherwise — the fast path is an optimization, never a requirement.

The Arrow-vs-tuple decision is made on the FIRST buffered batch (a
reader must yield one kind consistently): if schema conversion or the
first batch's value coercion fails, the whole stream falls back to
tuples.  A coercion failure AFTER the first batch succeeded means the
source drifted types mid-stream — that raises with guidance, because
silently switching representations is not possible at that point.
"""

from __future__ import annotations

from typing import Any, Iterator, Mapping

from pyspark.sql.types import StructType


def arrow_batch_iterator(
    records: "Iterator[Mapping[str, Any]]",
    schema: StructType,
    batch_size: int = 512,
) -> Iterator[Any]:
    """Yield ``pyarrow.RecordBatch``es from dict records (tuple fallback).

    ``records`` yields per-row dicts keyed by (a superset of) the schema's
    field names; missing keys become nulls, extra keys are dropped — the
    same projection semantics as the tuple path ``record.get(name)``.
    """
    names = schema.fieldNames()
    arrow_schema = None
    try:
        import pyarrow as pa
        from pyspark.sql.pandas.types import to_arrow_schema

        arrow_schema = to_arrow_schema(schema)
    except Exception:
        pa = None  # pragma: no cover - pyarrow is baked into this env

    if arrow_schema is None:
        for record in records:
            yield tuple(record.get(n) for n in names)
        return

    buf: list[dict] = []
    first = True
    for record in records:
        buf.append({n: record.get(n) for n in names})
        if len(buf) >= batch_size:
            if first:
                # decide the stream's representation on the first batch
                try:
                    batch = pa.RecordBatch.from_pylist(buf, schema=arrow_schema)
                except Exception:
                    yield from _drain_as_tuples(buf, records, names)
                    return
                first = False
                yield batch
            else:
                yield _convert(pa, buf, arrow_schema)
            buf = []
    if buf:
        if first:
            try:
                yield pa.RecordBatch.from_pylist(buf, schema=arrow_schema)
            except Exception:
                yield from _drain_as_tuples(buf, records, names)
            return
        yield _convert(pa, buf, arrow_schema)


def _convert(pa, buf: list, arrow_schema):
    try:
        return pa.RecordBatch.from_pylist(buf, schema=arrow_schema)
    except Exception as exc:
        raise RuntimeError(
            "source records stopped converting to the declared Arrow schema "
            f"mid-stream ({exc!r}){_culprit(pa, buf, arrow_schema)}; the "
            "reader already committed to Arrow batches — disable the fast "
            "path (arrow_batches=False) or declare a schema matching every "
            "record"
        ) from exc


def _culprit(pa, buf: list, arrow_schema) -> str:
    """Best-effort ': field X rejected value V' suffix for _convert errors.

    Re-converts column-by-column to name the first field whose values no
    longer coerce, and quotes one offending value — the diagnosis the
    operator actually needs when a source drifts types mid-stream."""
    try:
        for field in arrow_schema:
            vals = [rec.get(field.name) for rec in buf]
            try:
                pa.array(vals, type=field.type)
            except Exception:
                bad = next(
                    (v for v in vals if v is not None and not _coerces(pa, v, field.type)),
                    None,
                )
                return (
                    f"; first failing field: {field.name!r} (declared "
                    f"{field.type}), sample offending value: {bad!r}"
                )
    except Exception:
        pass
    return ""


def _coerces(pa, value, arrow_type) -> bool:
    try:
        pa.array([value], type=arrow_type)
        return True
    except Exception:
        return False


def _drain_as_tuples(buf: list, records, names) -> Iterator[tuple]:
    for rec in buf:
        yield tuple(rec.get(n) for n in names)
    for rec in records:
        yield tuple(rec.get(n) for n in names)
