"""A Spark 4 Python DataSource for the reference's scan-file archive:
``spark.read.format("odns_scan").option("path", root).load()``.

This re-expresses the reference's file discovery + CSV ingest loop
(zipFileUtils.py:7-35, dataimporter.py:109-184) as a first-class
pluggable Spark source instead of driver-side glob code:

- **Discovery** walks the reference's ``<root>/<year>/<protocol>/
  <protocol>_scan_<date>.csv[.gz]`` archive layout; every file becomes
  one ``InputPartition`` (a .gz is non-splittable anyway, so file ==
  split is the natural grain — at 100 TB the archive is many files and
  file-parallelism saturates the cluster).
- **Filter pushdown** (Spark 4 ``pushFilters``): equality/IN/range
  predicates on ``protocol`` and ``scan_date`` prune FILES at planning
  time — the partition-pruning story for an archive source; all other
  predicates are returned to Spark to evaluate post-scan.
- **Typing** applies the reference's typer semantics per row (strict
  ``%f`` timestamps → NULL, permissive float ASN, ``''`` → NULL —
  fieldtypers.py:13-31) and emits the 20-column sink layout, identical
  to ``ingest.typed_projection`` (equivalence-tested).
- **Streaming**: a ``SimpleDataSourceStreamReader`` watches the same
  archive and emits newly-arrived files per microbatch — the
  reference's cron re-scan loop (dataimporter.py:240-258) as a
  Structured Streaming source with exactly-once file accounting in the
  offset.

Performance note: rows cross the Python worker boundary, so the
JVM-native ``ingest.scan_csv_gz`` path remains the throughput
configuration; this source is the *pluggability* surface (and the
pushdown prevents it ever reading a file the query doesn't need).
"""

from __future__ import annotations

import csv
import datetime as _dt
import glob
import gzip
import io
import os
from typing import Iterator

from pyspark.sql import types as T
from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    EqualTo,
    Filter,
    GreaterThan,
    GreaterThanOrEqual,
    In,
    InputPartition,
    LessThan,
    LessThanOrEqual,
    SimpleDataSourceStreamReader,
)

from odns_dataimporter_spark.odns.files import extract_file_date_from_name
from odns_dataimporter_spark.odns.schema import COLUMNS_BY_PROTOCOL, SINK_COLUMNS, TCP_COLUMNS

_TS_FMT = "%Y-%m-%d %H:%M:%S.%f"  # fieldtypers.py:15 — strict, NULL on mismatch


def _type_timestamp(v: str | None) -> _dt.datetime | None:
    if not v:
        return None
    try:
        return _dt.datetime.strptime(v, _TS_FMT)
    except ValueError:
        return None


def _type_double(v: str | None) -> float | None:
    if not v:
        return None
    try:
        return float(v)
    except ValueError:
        return None


def _scan_schema() -> T.StructType:
    fields = [T.StructField("protocol", T.StringType(), True)]
    for name, typ in TCP_COLUMNS:
        spark_t = {
            "string": T.StringType(),
            "timestamp": T.TimestampType(),
            "double": T.DoubleType(),
        }[typ]
        fields.append(T.StructField(name, spark_t, True))
    fields.append(T.StructField("scan_date", T.StringType(), True))
    return T.StructType(fields)


def _discover(root: str, protocol: str | None = None) -> list[tuple[str, str, str]]:
    """(path, protocol, scan_date) for every scan file in the archive,
    sorted by path for deterministic partition numbering."""
    out = []
    pattern = os.path.join(root, "*", protocol or "*", "*_scan_*.csv*")
    for path in sorted(glob.glob(pattern)):
        proto = os.path.basename(os.path.dirname(path))
        date = extract_file_date_from_name(path)
        if proto in COLUMNS_BY_PROTOCOL and date is not None:
            out.append((path, proto, date))
    return out


def _parse_file(path: str, proto: str, scan_date: str) -> Iterator[tuple]:
    """Stream one scan CSV applying the reference typers; yields rows
    in SINK_COLUMNS order. O(1) memory (line-streamed, never a
    whole-file read — the zipFileUtils.py:20-22 bug is not
    replicated)."""
    opener = gzip.open if path.endswith(".gz") else open
    with opener(path, "rb") as fh:
        text = io.TextIOWrapper(fh, encoding="utf-8", newline="")
        reader = csv.reader(text, delimiter=";")
        header = next(reader, None)
        if header is None:
            return
        idx = {name: i for i, name in enumerate(header)}
        cols = []
        for name in SINK_COLUMNS:
            if name == "protocol":
                cols.append(("__lit__", proto))
            elif name == "scan_date":
                cols.append(("__lit__", scan_date))
            elif name not in idx:
                cols.append(("__null__", None))
            elif name.startswith("timestamp_"):
                cols.append(("__ts__", idx[name]))
            elif name.startswith("asn_"):
                cols.append(("__dbl__", idx[name]))
            else:
                cols.append(("__str__", idx[name]))
        for rec in reader:
            row = []
            for kind, arg in cols:
                if kind == "__lit__":
                    row.append(arg)
                elif kind == "__null__":
                    row.append(None)
                else:
                    v = rec[arg] if arg < len(rec) else None
                    if kind == "__ts__":
                        row.append(_type_timestamp(v))
                    elif kind == "__dbl__":
                        row.append(_type_double(v))
                    else:
                        row.append(v if v != "" else None)
            yield tuple(row)


class OdnsScanPartition(InputPartition):
    def __init__(self, path: str, protocol: str, scan_date: str):
        self.path = path
        self.protocol = protocol
        self.scan_date = scan_date


class OdnsScanReader(DataSourceReader):
    def __init__(self, options):
        self.root = options.get("path")
        if not self.root:
            raise ValueError("odns_scan requires option 'path' (archive root)")
        self.protocol_opt = options.get("protocol")
        # predicate state accumulated by pushFilters; applied in partitions()
        self._proto_eq: set[str] | None = None
        self._date_eq: set[str] | None = None
        self._date_lo: tuple[str, bool] | None = None  # (bound, inclusive)
        self._date_hi: tuple[str, bool] | None = None

    def pushFilters(self, filters: list[Filter]) -> Iterator[Filter]:
        """Consume protocol/scan_date predicates for file pruning;
        everything else goes back to Spark. ISO dates compare
        correctly as strings, so range filters prune too."""
        for f in filters:
            attr = getattr(f, "attribute", None)
            col = attr[0] if attr and len(attr) == 1 else None
            if isinstance(f, EqualTo) and col == "protocol":
                self._proto_eq = (self._proto_eq or set()) | {f.value}
            elif isinstance(f, In) and col == "protocol":
                self._proto_eq = (self._proto_eq or set()) | set(f.values)
            elif isinstance(f, EqualTo) and col == "scan_date":
                self._date_eq = (self._date_eq or set()) | {f.value}
            elif isinstance(f, In) and col == "scan_date":
                self._date_eq = (self._date_eq or set()) | set(f.values)
            elif isinstance(f, (GreaterThan, GreaterThanOrEqual)) and col == "scan_date":
                self._date_lo = (f.value, isinstance(f, GreaterThanOrEqual))
            elif isinstance(f, (LessThan, LessThanOrEqual)) and col == "scan_date":
                self._date_hi = (f.value, isinstance(f, LessThanOrEqual))
            else:
                yield f  # unsupported: Spark evaluates it after the scan

    def _keep(self, proto: str, date: str) -> bool:
        if self.protocol_opt and proto != self.protocol_opt:
            return False
        if self._proto_eq is not None and proto not in self._proto_eq:
            return False
        if self._date_eq is not None and date not in self._date_eq:
            return False
        if self._date_lo is not None:
            lo, inc = self._date_lo
            if date < lo or (date == lo and not inc):
                return False
        if self._date_hi is not None:
            hi, inc = self._date_hi
            if date > hi or (date == hi and not inc):
                return False
        return True

    def partitions(self) -> list[OdnsScanPartition]:
        return [
            OdnsScanPartition(p, proto, d)
            for p, proto, d in _discover(self.root, self.protocol_opt)
            if self._keep(proto, d)
        ]

    def read(self, partition: OdnsScanPartition) -> Iterator[tuple]:
        yield from _parse_file(partition.path, partition.protocol, partition.scan_date)


class OdnsScanStreamReader(SimpleDataSourceStreamReader):
    """Archive-watching stream: each microbatch emits the files that
    appeared since the last offset. The offset is the sorted list of
    ingested file basenames — replayable (`readBetweenOffsets` re-parses
    exactly the delta), so the source is exactly-once under retries.
    At production scale the offset would hold a (year, mtime) high-water
    mark instead of a name list; the name list keeps replay exact for
    archives where mtimes are unreliable (the reference picks files by
    mtime, zipFileUtils.py:7-17 — same discovery, different bookmark)."""

    def __init__(self, options):
        self.root = options.get("path")
        if not self.root:
            raise ValueError("odns_scan requires option 'path' (archive root)")
        self.protocol_opt = options.get("protocol")

    def initialOffset(self) -> dict:
        return {"seen": []}

    def _current(self) -> list[tuple[str, str, str]]:
        return _discover(self.root, self.protocol_opt)

    def read(self, start: dict) -> tuple[Iterator[tuple], dict]:
        seen = set(start.get("seen", []))
        files = self._current()
        new = [(p, pr, d) for p, pr, d in files if os.path.basename(p) not in seen]
        end = {"seen": sorted(seen | {os.path.basename(p) for p, _, _ in files})}
        # Materialize: Spark's prefetching wrapper pickles the returned
        # batch alongside the offset, and generators don't pickle.
        rows = [row for p, pr, d in new for row in _parse_file(p, pr, d)]
        return iter(rows), end

    def readBetweenOffsets(self, start: dict, end: dict) -> Iterator[tuple]:
        delta = set(end.get("seen", [])) - set(start.get("seen", []))
        for p, pr, d in self._current():
            if os.path.basename(p) in delta:
                yield from _parse_file(p, pr, d)

    def commit(self, end: dict) -> None:
        pass  # offsets are self-contained; nothing external to release


class OdnsScanDataSource(DataSource):
    """``format("odns_scan")`` — batch + streaming reads of the
    reference archive layout with file-level filter pushdown."""

    @classmethod
    def name(cls) -> str:
        return "odns_scan"

    def schema(self) -> T.StructType:
        return _scan_schema()

    def reader(self, schema: T.StructType) -> OdnsScanReader:
        return OdnsScanReader(self.options)

    def simpleStreamReader(self, schema: T.StructType) -> OdnsScanStreamReader:
        return OdnsScanStreamReader(self.options)

    def writer(self, schema: T.StructType, overwrite: bool):
        return OdnsScanWriter(self.options, overwrite)


def register(spark) -> None:
    """Idempotently register the source on a session."""
    spark.dataSource.register(OdnsScanDataSource)


# ---------------------------------------------------------------------------
# Writer: DataFrame -> archive layout (the reverse of the reader), with a
# two-phase commit so a failed job never leaves half-written scan files.
# ---------------------------------------------------------------------------

from dataclasses import dataclass  # noqa: E402

from pyspark.sql.datasource import DataSourceWriter, WriterCommitMessage  # noqa: E402


@dataclass
class _StagedFiles(WriterCommitMessage):
    """(staged_path, protocol, scan_date) per file written by one task."""

    files: list  # list[tuple[str, str, str]]


def _fmt_cell(name: str, v) -> str:
    if v is None:
        return ""  # ''<->NULL round-trips (nullValue convention)
    if name.startswith("timestamp_"):
        return v.strftime(_TS_FMT)
    return str(v)


class OdnsScanWriter(DataSourceWriter):
    """Writes rows back into ``<root>/<year>/<proto>/<proto>_scan_<date>
    .part-*.csv.gz``. Each task stages its files under ``_staging/`` and
    reports them in its commit message; the driver's ``commit()`` moves
    everything into place atomically-per-file (rename within one
    filesystem), and ``abort()`` removes the staging products — the
    standard job-commit protocol, so concurrent readers never observe a
    torn file and a failed job leaves the archive untouched."""

    def __init__(self, options, overwrite: bool):
        self.root = options.get("path")
        if not self.root:
            raise ValueError("odns_scan requires option 'path' (archive root)")
        if overwrite:
            raise ValueError(
                "odns_scan writer is append-only (the reference archive is "
                "immutable scan history; use the snapshot sink for replace)"
            )

    def write(self, iterator) -> _StagedFiles:
        import uuid

        stage_root = os.path.join(self.root, "_staging", uuid.uuid4().hex)
        writers: dict[tuple[str, str], tuple] = {}
        data_cols = [c for c in SINK_COLUMNS if c not in ("protocol", "scan_date")]
        try:
            for row in iterator:
                d = row.asDict()
                proto, date = d["protocol"], d["scan_date"]
                key = (proto, date)
                if key not in writers:
                    os.makedirs(stage_root, exist_ok=True)
                    path = os.path.join(stage_root, f"{proto}_scan_{date}.csv.gz")
                    fh = gzip.open(path, "wt", encoding="utf-8", newline="")
                    cw = csv.writer(fh, delimiter=";")
                    cw.writerow(data_cols)
                    writers[key] = (path, fh, cw)
                path, fh, cw = writers[key]
                cw.writerow([_fmt_cell(c, d.get(c)) for c in data_cols])
            staged = []
            for (proto, date), (path, fh, _) in writers.items():
                fh.close()
                staged.append((path, proto, date))
            return _StagedFiles(files=staged)
        except Exception:
            for _, fh, _cw in writers.values():
                try:
                    fh.close()
                except Exception:
                    pass
            raise

    def commit(self, messages) -> None:
        import shutil
        import uuid

        for msg in messages:
            if msg is None:
                continue
            for staged, proto, date in msg.files:
                year = date[:4]
                final_dir = os.path.join(self.root, year, proto)
                os.makedirs(final_dir, exist_ok=True)
                final = os.path.join(
                    final_dir, f"{proto}_scan_{date}.part-{uuid.uuid4().hex[:8]}.csv.gz"
                )
                shutil.move(staged, final)
        self._clean_staging()

    def abort(self, messages) -> None:
        self._clean_staging()

    def _clean_staging(self) -> None:
        import shutil

        staging = os.path.join(self.root, "_staging")
        if os.path.isdir(staging):
            shutil.rmtree(staging, ignore_errors=True)
