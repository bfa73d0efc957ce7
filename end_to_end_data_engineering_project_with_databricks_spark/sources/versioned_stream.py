"""Streaming source over the versioned table — the Delta *streaming
source* twin (``spark.readStream.format("delta")``), built on the Spark 4
Python Data Source API.

Semantics (mirroring Delta's):

- **offset = committed version number.**  Each micro-batch consumes the
  data files ADDED by the versions in ``(start, end]``; every output row
  carries a ``_commit_version`` column.  Offsets live in the stream's
  checkpoint, so a restarted query resumes exactly after the last version
  it processed — the incremental-ETL contract the reference's scheduled
  job approximates by re-running a full anti-join
  (ETL_pipeline_countries.py:129-138).
- **Append-only by default.**  A version that REMOVES files (MERGE,
  DELETE, compaction rewrote or dropped data) raises, exactly like
  Delta's streaming source without flags; ``ignoreChanges=true`` opts
  into Delta's relaxed mode (emit the added files anyway — rewritten
  rows may re-appear downstream; pair with a keyed dedup sink).
- ``startingVersion`` picks up from a historical commit (default 1, the
  first commit — Delta's ``startingVersion=0`` analog).

Scale shape: one :class:`InputPartition` per (version, data file), so a
micro-batch fans out across executors file-parallel — the same unit of
work Delta's source schedules.  Rows are decoded with pyarrow and handed
to Spark via the Python Data Source row path; on a Databricks/delta-spark
deployment the one-line switch is ``readStream.format("delta")``
(sources/versioned.py module header documents the full mapping).

**This module is deliberately self-contained (stdlib + pyspark only).**
Spark 4 runs EVERY Python-data-source method — including the driver-side
``schema``/``partitions``/offset hooks — in dedicated Python worker
processes that do not share the driver's ``sys.path``, and the external
driver launches from an arbitrary cwd.  The manifest helpers below are
therefore small stdlib re-implementations of sources/versioned.py's
read path (kept in lockstep by tests/test_versioned_stream.py), and the
whole module registers for cloudpickle pickle-by-value (tail of file) so
workers never need an importable copy of the package.
"""

from __future__ import annotations

import json
import os
from collections.abc import Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamReader,
    InputPartition,
)
from pyspark.sql.types import LongType, StructField, StructType

#: name of the commit-version column appended to every streamed row
VERSION_COL = "_commit_version"


def _list_versions(root: str) -> list[int]:
    """Stdlib twin of sources/versioned.list_versions (same layout:
    ``<root>/_log/v%08d.json``)."""
    log = os.path.join(root, "_log")
    if not os.path.isdir(log):
        return []
    return sorted(
        int(f[1:-5]) for f in os.listdir(log) if f.startswith("v") and f.endswith(".json")
    )


def _read_manifest(root: str, version: int) -> dict:
    with open(os.path.join(root, "_log", f"v{version:08d}.json")) as fh:
        return json.load(fh)


class VersionedStreamDataSource(DataSource):
    """``format("versioned_stream")``; options:

    - ``root`` (required): versioned-table root directory;
    - ``startingVersion``: first version to stream (default 1);
    - ``ignoreChanges``: tolerate file-removing commits (default false).
    """

    @classmethod
    def name(cls) -> str:
        return "versioned_stream"

    def schema(self) -> StructType:
        root = self.options.get("root")
        if not root:
            raise ValueError("versioned_stream requires a 'root' option")
        versions = _list_versions(root)
        if not versions:
            raise FileNotFoundError(f"no committed versions at {root}")
        manifest = _read_manifest(root, versions[-1])
        st = StructType.fromJson(json.loads(manifest["schema"]))
        return StructType(st.fields + [StructField(VERSION_COL, LongType())])

    def streamReader(self, schema) -> "VersionedStreamReader":
        return VersionedStreamReader(self.options)


class VersionedStreamReader(DataSourceStreamReader):
    def __init__(self, options: dict) -> None:
        # option keys arrive lower-cased
        self.root = options.get("root")
        if not self.root:
            raise ValueError("versioned_stream requires a 'root' option")
        self.starting_version = int(options.get("startingversion", 1))
        self.ignore_changes = str(options.get("ignorechanges", "false")).lower() == "true"

    def initialOffset(self) -> dict:
        # offset = last consumed version; nothing consumed yet
        return {"version": self.starting_version - 1}

    def latestOffset(self) -> dict:
        versions = _list_versions(self.root)
        head = versions[-1] if versions else 0
        return {"version": max(head, self.starting_version - 1)}

    def partitions(self, start: dict, end: dict) -> list[InputPartition]:
        parts: list[InputPartition] = []
        for v in range(start["version"] + 1, end["version"] + 1):
            prev_files: set[str] = (
                set(_read_manifest(self.root, v - 1)["files"]) if v > 1 else set()
            )
            mf = _read_manifest(self.root, v)
            files = set(mf["files"])
            removed = prev_files - files
            if removed and not self.ignore_changes:
                raise ValueError(
                    f"version {v} of {self.root} removed {len(removed)} data "
                    "file(s) (MERGE/DELETE/compaction); the stream is "
                    "append-only — set ignoreChanges=true to stream the "
                    "rewritten files anyway (rows may repeat downstream)"
                )
            parts.extend(InputPartition((v, f)) for f in sorted(files - prev_files))
        # an empty batch (no new versions) must still return no partitions,
        # not fail — Spark handles [] as a zero-task micro-batch
        return parts

    def read(self, partition: InputPartition) -> Iterator[tuple]:
        # executor-side: decode one parquet file, append the version
        import pyarrow.parquet as pq

        v, path = partition.value
        table = pq.read_table(path)
        cols = [table.column(i).to_pylist() for i in range(table.num_columns)]
        for row in zip(*cols):
            yield (*row, v)

    def commit(self, end: dict) -> None:
        pass  # offsets are durable in the manifest log; nothing to clean up


__all__ = ["VersionedStreamDataSource", "VERSION_COL"]

# Spark serializes Python data sources with its vendored cloudpickle;
# register this module for pickle-by-value so the data-source worker
# processes need no importable copy of the package (same pattern as
# video_datasource.py — the external driver runs from an arbitrary cwd).
import sys  # noqa: E402

from pyspark import cloudpickle as _cloudpickle  # noqa: E402

try:
    _cloudpickle.register_pickle_by_value(sys.modules[__name__])
except Exception:  # pragma: no cover - best-effort on exotic import paths
    pass
