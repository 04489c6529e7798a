"""Python DataSource WRITER: a JSON-lines audit sink with two-phase
commit — the write-side twin of the paged reader (sources/paged.py).

The reference appends its extract to a SQL table through SQLAlchemy
[REF-UNVERIFIED: to_sql append]; the JDBC jar is absent in this sandbox
(sources/sinks.py documents the contract), so the custom-connector
story is completed with Spark 4's Python DataSource writer API instead:
each task serializes its partition to a staged ``part-<uuid>.jsonl``
file and returns the filename as its commit message; the driver's
``commit`` publishes exactly the acknowledged files into a manifest —
the same staged-file + manifest two-phase protocol real warehouse sinks
use for exactly-once batch writes (abort removes unacknowledged
stages, so failed/speculative tasks never publish).

Scale posture: one file per partition, no driver data movement — the
driver sees filenames only; the manifest is the atomic commit point
(readers list the manifest, never the directory).
"""

from __future__ import annotations

import json
import os
import uuid
from dataclasses import dataclass
from pathlib import Path

from pyspark.sql.datasource import (
    DataSource,
    DataSourceWriter,
    WriterCommitMessage,
)


@dataclass
class _FileCommit(WriterCommitMessage):
    filename: str
    n_rows: int


class JsonlAuditSink(DataSource):
    """``format("jsonl_audit")`` batch sink. Options: ``path`` (target
    directory, required)."""

    @classmethod
    def name(cls) -> str:
        return "jsonl_audit"

    def writer(self, schema, overwrite: bool):
        return _JsonlWriter(self.options["path"], [f.name for f in schema.fields])


class _JsonlWriter(DataSourceWriter):
    def __init__(self, path: str, cols: list[str]) -> None:
        self.path = path
        self.cols = cols

    def write(self, iterator) -> _FileCommit:
        os.makedirs(self.path, exist_ok=True)
        name = f"part-{uuid.uuid4().hex}.jsonl"
        n = 0
        # stage under a dot-prefix: invisible to publication until commit
        staged = Path(self.path) / f".{name}"
        with staged.open("w", encoding="utf-8") as f:
            for row in iterator:
                rec = {c: row[c] for c in self.cols}
                f.write(json.dumps(rec, default=str, sort_keys=True) + "\n")
                n += 1
        return _FileCommit(filename=name, n_rows=n)

    def commit(self, messages) -> None:
        published = []
        for m in messages:
            staged = Path(self.path) / f".{m.filename}"
            staged.rename(Path(self.path) / m.filename)
            published.append({"file": m.filename, "n_rows": m.n_rows})
        manifest = Path(self.path) / "_MANIFEST.json"
        manifest.write_text(
            json.dumps(
                {
                    "files": sorted(published, key=lambda e: e["file"]),
                    "total_rows": sum(e["n_rows"] for e in published),
                },
                indent=1,
            )
        )

    def abort(self, messages) -> None:
        for m in messages:
            if m is not None:
                staged = Path(self.path) / f".{m.filename}"
                staged.unlink(missing_ok=True)


def register_jsonl_sink(spark) -> None:
    """Idempotently register the sink format on a session."""
    try:
        spark.dataSource.register(JsonlAuditSink)
    except Exception:  # already registered on this session
        pass
