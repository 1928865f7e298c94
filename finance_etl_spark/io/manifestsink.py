"""Custom Python DataSource WRITER (Spark 4 DataSource API): a
JSON-lines sink with atomic manifest commit.

The reader side of the API is covered by io/ticksource.py; this is the
write path: every task serializes its partition to its own part file
and returns a WriterCommitMessage (path, row count); the driver-side
``commit()`` publishes ONE manifest listing exactly the committed
files — readers that go through the manifest never observe a torn
write (same log-defined-snapshot contract as plans/tableformat.py's
versioned snapshots, here expressed through Spark's own sink API).
``abort()`` removes the orphaned part files, so a failed job leaves
the target directory readable at its previous state.

Scale notes: writes are embarrassingly parallel (one file per task, no
coordination until the O(tasks) commit-message fold on the driver);
the manifest is the only serialization point, exactly like Delta's
commit protocol.
"""

from __future__ import annotations

import json
import os
import uuid
from dataclasses import dataclass

from pyspark.sql.datasource import (
    DataSource,
    DataSourceWriter,
    WriterCommitMessage,
)

MANIFEST = "_MANIFEST.json"


@dataclass
class PartFileCommit(WriterCommitMessage):
    path: str
    n_rows: int


class ManifestJsonlWriter(DataSourceWriter):
    def __init__(self, options):
        self.path = options["path"]

    def write(self, iterator):
        os.makedirs(self.path, exist_ok=True)
        part = os.path.join(
            self.path, f"part-{uuid.uuid4().hex}.jsonl"
        )
        n = 0
        with open(part, "w") as f:
            for row in iterator:
                f.write(json.dumps(row.asDict()) + "\n")
                n += 1
        return PartFileCommit(path=part, n_rows=n)

    def commit(self, messages):
        files = sorted(m.path for m in messages)
        with open(os.path.join(self.path, MANIFEST), "w") as f:
            json.dump(
                {"files": files, "n_rows": sum(m.n_rows for m in messages)},
                f,
            )

    def abort(self, messages):
        for m in messages:
            try:
                os.remove(m.path)
            except OSError:
                pass


class ManifestJsonlSink(DataSource):
    @classmethod
    def name(cls) -> str:
        return "manifest_jsonl"

    def writer(self, schema, overwrite):
        return ManifestJsonlWriter(self.options)


def read_manifest(path: str) -> dict:
    with open(os.path.join(path, MANIFEST)) as f:
        return json.load(f)
