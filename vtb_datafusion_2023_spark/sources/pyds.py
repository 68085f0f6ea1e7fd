"""Custom Python DataSources (Spark 4 ``pyspark.sql.datasource``).

Two sources that make non-tabular inputs first-class tables:

- ``media``: scan a directory of image/audio files (PNG/BMP/PPM/GIF/WAV
  — every container ``operators.codecs`` decodes for real) into a typed
  DataFrame ``(path, container, width, height, feature array<double>)``.
  This is the legitimate use of the Python DataSource API: formats the
  JVM reader cannot parse, decoded by our pure-numpy codecs, one input
  partition per file so a 10M-file corpus fans out across the cluster.
- ``versioned``: read a manifest-committed table
  (``sources.manifest``) through ``spark.read.format(...)`` with
  ``version`` time travel — one partition per data file (parallelism =
  file count), Arrow-batch emission.  The native
  ``read_versioned`` path (JVM parquet scan) stays the fast default;
  this source exists so SQL-only consumers (``CREATE TEMPORARY VIEW ...
  USING versioned``) can reach versioned tables without Python.

Register once per session::

    from vtb_datafusion_2023_spark.sources.pyds import register_datasources
    register_datasources(spark)
    spark.read.format("media").load("/data/images")
    spark.read.format("versioned").option("version", "3").load("/tables/t")
"""

from __future__ import annotations

import glob
import os

# module-level so the executor-side MediaFileReader.read captures the
# decoder by value (cloudpickle pickle-by-value on the package) instead
# of importing the package on the worker, which only resolves when the
# session's cwd/PYTHONPATH exposes it (round-7 vanilla-session finding)
from ..operators.codecs import decode_media
from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)

_MEDIA_EXTS = (".png", ".bmp", ".ppm", ".pgm", ".gif", ".wav", ".jpg", ".jpeg", ".tif", ".tiff", ".aif", ".aiff", ".au", ".snd")


class MediaFilePartition(InputPartition):
    def __init__(self, paths: list[str]):
        self.paths = paths


class MediaDirReader(DataSourceReader):
    def __init__(self, options):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("media source requires .load(<directory>)")
        self.files_per_partition = int(options.get("filesPerPartition", "16"))

    def partitions(self):
        files = sorted(
            p
            for p in glob.glob(os.path.join(self.path, "**", "*"), recursive=True)
            if os.path.isfile(p) and p.lower().endswith(_MEDIA_EXTS)
        )
        n = self.files_per_partition
        return [MediaFilePartition(files[i : i + n]) for i in range(0, len(files), n)] or [
            MediaFilePartition([])
        ]

    def read(self, partition):
        for p in partition.paths:
            with open(p, "rb") as f:
                payload = f.read()
            try:
                feat = decode_media(payload)
                yield (
                    p,
                    _sniff(payload),
                    feat["width"],
                    feat["height"],
                    [float(x) for x in feat["feature"]],
                    None,
                )
            except Exception as e:  # noqa: BLE001 — corrupt files become
                # typed error rows (ValueError/zlib.error/struct.error from
                # truncated payloads), never task failures: one bad file in
                # a 10M-file corpus must not kill the job
                yield (p, _sniff(payload), None, None, None, f"{type(e).__name__}: {e}")


def _sniff(payload: bytes) -> str:
    if payload[:8] == b"\x89PNG\r\n\x1a\n":
        return "png"
    if payload[:2] == b"BM":
        return "bmp"
    if payload[:2] in (b"P5", b"P6"):
        return "ppm"
    if payload[:6] in (b"GIF87a", b"GIF89a"):
        return "gif"
    if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        return "wav"
    if payload[:3] == b"\xff\xd8\xff":
        return "jpeg"
    if payload[:4] in (b"II*\x00", b"MM\x00*"):
        return "tiff"
    if payload[:4] == b"FORM" and payload[8:12] == b"AIFF":
        return "aiff"
    if payload[:4] == b".snd":
        return "au"
    return "unknown"


class MediaDirStreamReader(SimpleDataSourceStreamReader):
    """Incremental (autoloader-style) media ingestion: each micro-batch
    decodes only files that appeared since the last committed offset.

    The offset is the lexicographically-greatest path already processed —
    correct for append-only landing zones with monotonically-named files
    (upload timestamps, ULIDs); a mtime-based offset would need a
    monotonic clock across writers.  Structured Streaming's checkpoint
    persists the offset, so restarts resume exactly."""

    def __init__(self, options):
        self.inner = MediaDirReader(options)

    def initialOffset(self):
        return {"last_path": ""}

    def read(self, start):
        last = start["last_path"]
        files = sorted(
            p
            for p in glob.glob(os.path.join(self.inner.path, "**", "*"), recursive=True)
            if os.path.isfile(p) and p.lower().endswith(_MEDIA_EXTS) and p > last
        )
        rows = list(self.inner.read(MediaFilePartition(files)))
        end = {"last_path": files[-1] if files else last}
        return iter(rows), end

    def readBetweenOffsets(self, start, end):
        files = sorted(
            p
            for p in glob.glob(os.path.join(self.inner.path, "**", "*"), recursive=True)
            if os.path.isfile(p)
            and p.lower().endswith(_MEDIA_EXTS)
            and start["last_path"] < p <= end["last_path"]
        )
        return self.inner.read(MediaFilePartition(files))


class MediaDirSource(DataSource):
    @classmethod
    def name(cls):
        return "media"

    def schema(self):
        return (
            "path string, container string, width int, height int, "
            "feature array<double>, error string"
        )

    def reader(self, schema):
        return MediaDirReader(self.options)

    def simpleStreamReader(self, schema):
        return MediaDirStreamReader(self.options)


class VersionedFilePartition(InputPartition):
    def __init__(self, path: str):
        self.path = path


class VersionedTableReader(DataSourceReader):
    def __init__(self, options):
        self.table_dir = options.get("path")
        if not self.table_dir:
            raise ValueError("versioned source requires .load(<table_dir>)")
        self.version = options.get("version")
        self._pushed: list = []

    def _keep(self, entry) -> bool:
        from pyspark.sql.datasource import (
            EqualTo,
            GreaterThan,
            GreaterThanOrEqual,
            LessThan,
            LessThanOrEqual,
        )

        if not isinstance(entry, dict):
            return True
        stats = entry.get("stats", {})
        for f in self._pushed:
            st = stats.get(f.attribute[0])
            if st is None:
                continue  # no zone map for this column: conservative keep
            lo, hi = st
            v = f.value
            try:
                if isinstance(f, EqualTo) and (v < lo or v > hi):
                    return False
                if isinstance(f, (GreaterThan, GreaterThanOrEqual)) and hi < v:
                    return False
                if isinstance(f, GreaterThan) and hi == v:
                    return False
                if isinstance(f, (LessThan, LessThanOrEqual)) and lo > v:
                    return False
                if isinstance(f, LessThan) and lo == v:
                    return False
            except TypeError:
                continue  # incomparable types: conservative keep
        return True

    def _files(self):
        from .manifest import _read_manifest, table_versions

        versions = table_versions(self.table_dir)
        if not versions:
            raise FileNotFoundError(f"no committed versions in {self.table_dir}")
        v = int(self.version) if self.version is not None else versions[-1]
        data = os.path.join(self.table_dir, "data")
        m = _read_manifest(self.table_dir, v)
        return [
            os.path.join(data, e["name"] if isinstance(e, dict) else e)
            for e in m["files"]
            if self._keep(e)
        ]

    def partitions(self):
        files = self._files()
        # an empty partition list is rejected by the runner: when pruning
        # eliminates every file, plan one no-op partition
        return [VersionedFilePartition(p) for p in files] or [VersionedFilePartition(None)]

    def read(self, partition):
        # Arrow-batch fast path: the Python DataSource API accepts
        # pyarrow RecordBatches directly — no per-row Python objects
        import pyarrow.parquet as pq

        if partition.path is None:
            return
        for batch in pq.ParquetFile(partition.path).iter_batches():
            yield batch


class VersionedTablePushdownReader(VersionedTableReader):
    """Opt-in (``.option("pushdown", "true")`` + the session conf
    ``spark.sql.python.filterPushdown.enabled=true``): accepts simple
    range/equality predicates on single columns for ZONE-MAP file pruning
    against the manifest's per-file min/max (tables committed with
    ``stats_cols=``).  Opt-in because merely implementing ``pushFilters``
    makes Spark REJECT the source while the session conf is off.

    Every filter is handed back to Spark for exact row-level evaluation —
    pruning here only skips files that cannot contain a match, so keeping
    the filters post-scan is correct (and required: zone maps are
    file-granular)."""

    def pushFilters(self, filters):
        from pyspark.sql.datasource import (
            EqualTo,
            GreaterThan,
            GreaterThanOrEqual,
            LessThan,
            LessThanOrEqual,
        )

        for f in filters:
            if isinstance(
                f, (EqualTo, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual)
            ) and len(f.attribute) == 1:
                self._pushed.append(f)
            yield f  # Spark still applies every filter exactly


class VersionedTableSource(DataSource):
    @classmethod
    def name(cls):
        return "versioned"

    def schema(self):
        import pyarrow.parquet as pq

        from pyspark.sql.pandas.types import from_arrow_schema

        reader = VersionedTableReader(self.options)
        files = reader._files()
        if not files:
            return "dummy string"
        return from_arrow_schema(pq.ParquetFile(files[0]).schema_arrow)

    def reader(self, schema):
        if str(self.options.get("pushdown", "")).lower() == "true":
            return VersionedTablePushdownReader(self.options)
        return VersionedTableReader(self.options)

    def simpleStreamReader(self, schema):
        return VersionedTableStreamReader(self.options)


def register_datasources(spark) -> list[str]:
    """Register both sources on the session; returns the format names."""
    spark.dataSource.register(MediaDirSource)
    spark.dataSource.register(VersionedTableSource)
    return [MediaDirSource.name(), VersionedTableSource.name()]


class VersionedTableStreamReader(SimpleDataSourceStreamReader):
    """Stream a versioned table's APPENDS: the offset is the last
    processed table version; each micro-batch emits rows from data files
    that newer versions added (append/merge commits list carried files by
    name, so set difference identifies exactly the new files).  Paired
    with ``stream_to_versioned_table`` this closes the loop: one job
    streams into a manifest table, another streams its change feed out —
    both exactly-once via their checkpoints."""

    def __init__(self, options):
        self.table_dir = options.get("path")
        if not self.table_dir:
            raise ValueError("versioned source requires .load(<table_dir>)")

    def _version_files(self, v: int) -> set[str]:
        from .manifest import _file_names, _read_manifest

        return set(_file_names(_read_manifest(self.table_dir, v)))

    def _check_append_only(self, start_v: int, end_v: int) -> None:
        """Append-diff validity guard: any non-append commit in
        ``(start_v, end_v]`` renames data files — ``overwrite``/compaction
        renames every file, and ``merge`` rewrites each touched bucket
        (carried, unchanged rows land in fresh file names) — so a
        file-name set difference would re-emit carried rows as "new".
        Exactly-once is only defined over append history — raise loudly
        instead of silently duplicating.
        """
        from .manifest import _read_manifest, table_versions

        if start_v <= 0:
            return  # initial batch: whole-snapshot emission is correct
        for v in table_versions(self.table_dir):
            if start_v < v <= end_v:
                mode = _read_manifest(self.table_dir, v).get("mode", "append")
                if mode != "append":
                    raise ValueError(
                        f"version {v} of {self.table_dir} is a "
                        f"{mode!r} commit: the change feed cannot "
                        "diff across file rewrites (restart the "
                        "stream from the rewritten version, or use "
                        "table_changes for keyed CDC instead)"
                    )

    def initialOffset(self):
        return {"version": 0}

    def read(self, start):
        import pyarrow.parquet as pq

        from .manifest import table_versions

        versions = table_versions(self.table_dir)
        latest = versions[-1] if versions else 0
        prev_v = start["version"]
        if latest <= prev_v:
            return iter([]), {"version": prev_v}
        self._check_append_only(prev_v, latest)
        old = self._version_files(prev_v) if prev_v in versions else set()
        new_files = sorted(self._version_files(latest) - old)
        data = os.path.join(self.table_dir, "data")
        batches = []
        for f in new_files:
            batches.extend(pq.ParquetFile(os.path.join(data, f)).iter_batches())
        return iter(batches), {"version": latest}

    def readBetweenOffsets(self, start, end):
        import pyarrow.parquet as pq

        self._check_append_only(start["version"], end["version"])
        old = self._version_files(start["version"]) if start["version"] > 0 else set()
        new_files = sorted(self._version_files(end["version"]) - old)
        data = os.path.join(self.table_dir, "data")
        for f in new_files:
            yield from pq.ParquetFile(os.path.join(data, f)).iter_batches()
