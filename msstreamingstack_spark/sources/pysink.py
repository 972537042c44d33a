"""Python DataSource WRITER (Spark 4 pluggable sink API) — the write
side of the engine's pluggable-source story (`pydatasource.py` is the
read side).

``manifest_jsonl`` demonstrates the full batch commit protocol:

- each task writes its partition to a UNIQUELY-NAMED part file and
  returns the name in its WriterCommitMessage;
- ``commit`` (driver, runs once, only after EVERY task succeeded)
  atomically publishes ``_manifest.json`` listing exactly the
  committed files;
- ``abort`` removes the orphan part files of a failed write.

Readers resolve the directory THROUGH the manifest
(:func:`read_manifest_jsonl`), so half-written jobs and leftover
files from aborted/zombie attempts are invisible — the same
publish-on-commit discipline object-store table formats use. Task
RETRIES are also safe: a retried task writes a fresh uuid-named file
and only the attempt whose commit message reaches the driver is
published; the loser is an unlisted orphan.

At cluster scale the part files land on the shared store; the local
filesystem here stands in for it (driver + executors share it in
local mode, which is also true of the tests).
"""

from __future__ import annotations

import json
import os
import uuid
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.datasource import (
    DataSource,
    DataSourceWriter,
    WriterCommitMessage,
)

MANIFEST = "_manifest.json"


@dataclass
class _FileCommit(WriterCommitMessage):
    filename: str
    n_rows: int


class ManifestJsonlWriter(DataSourceWriter):
    def __init__(self, options, overwrite: bool):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("manifest_jsonl requires .save(path)")
        self.overwrite = overwrite

    def write(self, iterator) -> _FileCommit:
        """Executor-side: one uniquely-named part file per task
        attempt; nothing this method writes is visible until the
        driver commits."""
        os.makedirs(self.path, exist_ok=True)
        name = f"part-{uuid.uuid4().hex}.jsonl"
        n = 0
        with open(os.path.join(self.path, name), "w") as fh:
            for row in iterator:
                fh.write(json.dumps(row.asDict(), default=str) + "\n")
                n += 1
        return _FileCommit(filename=name, n_rows=n)

    def commit(self, messages) -> None:
        """Driver-side publish. Append MERGES the prior manifest (a
        second append to the same directory must not orphan earlier
        committed rows); overwrite REPLACES it and deletes the prior
        part files so the directory holds exactly one logical table."""
        files = sorted(m.filename for m in messages)
        rows = sum(m.n_rows for m in messages)
        prior_files: list[str] = []
        prior_rows = 0
        target = os.path.join(self.path, MANIFEST)
        if os.path.exists(target):
            with open(target) as fh:
                prior = json.load(fh)
            prior_files = list(prior.get("files", []))
            prior_rows = int(prior.get("n_rows", 0))
        if self.overwrite:
            manifest = {"files": files, "n_rows": rows}
        else:
            merged = sorted(set(prior_files) | set(files))
            manifest = {"files": merged, "n_rows": prior_rows + rows}
        tmp = os.path.join(self.path, f"{MANIFEST}.{uuid.uuid4().hex}.tmp")
        with open(tmp, "w") as fh:
            json.dump(manifest, fh)
        os.replace(tmp, target)  # atomic publish
        if self.overwrite:
            # prior data files are unreachable once the new manifest is
            # live; removal is best-effort cleanup, not correctness
            new = set(files)
            for f in prior_files:
                if f not in new:
                    try:
                        os.remove(os.path.join(self.path, f))
                    except OSError:
                        pass

    def abort(self, messages) -> None:
        for m in messages:
            if m is None:
                continue
            try:
                os.remove(os.path.join(self.path, m.filename))
            except OSError:
                pass


class ManifestJsonlDataSource(DataSource):
    """``spark.dataSource.register(ManifestJsonlDataSource)`` then
    ``df.write.format("manifest_jsonl").mode("append").save(path)``."""

    @classmethod
    def name(cls):
        return "manifest_jsonl"

    def writer(self, schema, overwrite: bool):
        return ManifestJsonlWriter(self.options, overwrite)


def read_manifest_jsonl(spark: SparkSession, path: str, schema) -> DataFrame:
    """Read back ONLY the manifest-listed files (unlisted orphans from
    failed attempts are invisible). Raises if no manifest exists —
    an uncommitted directory is not a table."""
    with open(os.path.join(path, MANIFEST)) as fh:
        manifest = json.load(fh)
    files = [os.path.join(path, f) for f in manifest["files"]]
    if not files:
        return spark.createDataFrame([], schema)
    return spark.read.schema(schema).json(files)
