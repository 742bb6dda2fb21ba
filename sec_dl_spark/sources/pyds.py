"""Custom Python DataSource (Spark 4 `pyspark.sql.datasource` API) for the
EDGAR master.idx delimited format (SURVEY.md §2.1 S3's file layout:
9-line preamble, `----` separator, then `CIK|Company|Form|Date|Filename`
rows — /root/reference/sec_dl/utils/load_filings_idx.py:33-48 parses the
same layout with pandas read_csv skiprows).

The DataFrame-native parser (sources/edgar_idx.py:parse_master_idx) is the
hot path — one JVM regex filter over spark.read.text. THIS module covers
the engine-extension surface that parser can't demonstrate: a registered
``spark.read.format("edgar_idx")`` source with

- per-FILE input partitions (each .idx file parses in its own task — the
  natural parallelism unit for a 120-quarter backfill),
- row-level filter pushdown into the Python reader (``pushFilters``
  accepts equality on form_type/cik and prunes rows before they cross the
  Python→JVM boundary — the Arrow transfer shrinks, not just the plan),
- malformed-row tolerance matching the reference's errors='ignore'
  (short/garbled lines are skipped, not fatal).

Use it where the SOURCE logic itself must be Python (bespoke formats,
SDK-wrapped feeds); keep spark.read.text + expressions where they suffice.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceWriter,
    EqualTo,
    InputPartition,
    SimpleDataSourceStreamReader,
    WriterCommitMessage,
)

IDX_SCHEMA = "cik bigint, company string, form_type string, date_filed string, filename string"

# attribute paths pushFilters accepts as row-level prunes
_PUSHABLE = {("form_type",), ("cik",)}


class EdgarIdxDataSource(DataSource):
    """``spark.dataSource.register(EdgarIdxDataSource)`` then
    ``spark.read.format("edgar_idx").load(path_glob)``."""

    @classmethod
    def name(cls) -> str:
        return "edgar_idx"

    def schema(self) -> str:
        return IDX_SCHEMA

    def reader(self, schema):
        return EdgarIdxReader(self.options)

    def simpleStreamReader(self, schema):
        return EdgarIdxStreamReader(self.options)

    def writer(self, schema, overwrite: bool):
        return EdgarIdxWriter(self.options, overwrite)


class EdgarIdxReader(DataSourceReader):
    def __init__(self, options):
        import glob as _glob

        path = options.get("path")
        if not path:
            raise ValueError("edgar_idx requires a path")
        self.files = sorted(_glob.glob(path))
        self.pushed: list = []  # (attribute_path, value) equality prunes

    def pushFilters(self, filters):
        """Accept equality filters on form_type/cik; everything yielded
        back stays in the Spark plan. Spark re-applies even accepted
        filters only if we yield them — we don't, so the prune must be
        exact (it is: plain equality on a parsed field)."""
        for f in filters:
            if isinstance(f, EqualTo) and tuple(f.attribute) in _PUSHABLE:
                self.pushed.append((tuple(f.attribute), f.value))
            else:
                yield f

    def partitions(self):
        return [InputPartition(f) for f in self.files]

    def read(self, partition):
        pushed = self.pushed
        with open(partition.value, encoding="utf-8", errors="replace") as fh:
            for line in fh:
                parts = line.rstrip("\n").split("|", 4)
                if len(parts) != 5:
                    continue  # preamble / separator / truncated rows
                cik_s, company, form, date_filed, filename = parts
                if not cik_s.isdigit():
                    continue
                row = {
                    "cik": int(cik_s),
                    "company": company,
                    "form_type": form,
                    "date_filed": date_filed,
                    "filename": filename,
                }
                if any(row[attr[0]] != v for attr, v in pushed):
                    continue
                yield (
                    row["cik"],
                    row["company"],
                    row["form_type"],
                    row["date_filed"],
                    row["filename"],
                )


def _parse_idx_file(path):
    rows = []
    with open(path, encoding="utf-8", errors="replace") as fh:
        for line in fh:
            parts = line.rstrip("\n").split("|", 4)
            if len(parts) != 5 or not parts[0].isdigit():
                continue
            rows.append((int(parts[0]), parts[1], parts[2], parts[3], parts[4]))
    return rows


class EdgarIdxStreamReader(SimpleDataSourceStreamReader):
    """File-tailing STREAMING form of the source: the offset is the sorted
    list of files already admitted, each micro-batch reads only the new
    ones, and ``readBetweenOffsets`` re-reads exactly a replayed batch's
    file delta — so checkpoint recovery re-delivers the same rows (the
    exactly-once-per-file contract a quarterly idx drop-folder needs).
    Simple reader = offsets live on the driver, rows shipped to one task;
    right for metadata-rate feeds like idx files, wrong for bulk data."""

    def __init__(self, options):
        import glob as _glob

        self._glob = _glob
        path = options.get("path")
        if not path:
            raise ValueError("edgar_idx requires a path")
        self.path = path

    def initialOffset(self):
        return {"files": []}

    def read(self, start):
        seen = set(start["files"])
        new = [f for f in sorted(self._glob.glob(self.path)) if f not in seen]
        rows = [r for f in new for r in _parse_idx_file(f)]
        return iter(rows), {"files": sorted(start["files"] + new)}

    def readBetweenOffsets(self, start, end):
        delta = sorted(set(end["files"]) - set(start["files"]))
        return iter(r for f in delta for r in _parse_idx_file(f))


@dataclass
class _IdxCommit(WriterCommitMessage):
    staged: str
    n_rows: int


class EdgarIdxWriter(DataSourceWriter):
    """Two-phase-commit writer for the idx format — the write half of the
    custom-source story. Each task streams its rows to a STAGED file
    (``_staging/<uuid>.idx``) and returns a commit message; only the
    driver-side ``commit`` renames staged files into place and publishes
    a ``_committed`` manifest listing exactly the surviving files, while
    ``abort`` removes the partials. A reader that honors the manifest
    never sees a torn write — the same claim-then-publish discipline
    streaming/atomic.py applies to its version log, expressed through
    the DataSource writer protocol (task retries leave orphaned staged
    files, never half-visible data; ``commit`` ignores everything the
    final task set didn't report)."""

    def __init__(self, options, overwrite: bool):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("edgar_idx write requires a path")
        self.overwrite = overwrite

    def write(self, iterator):
        import os
        import uuid

        staging = os.path.join(self.path, "_staging")
        os.makedirs(staging, exist_ok=True)
        staged = os.path.join(staging, f"{uuid.uuid4().hex}.idx")
        n = 0
        with open(staged, "w", encoding="utf-8") as fh:
            fh.write("CIK|Company Name|Form Type|Date Filed|Filename\n")
            fh.write("-" * 60 + "\n")
            for row in iterator:
                fh.write(
                    f"{row[0]}|{row[1]}|{row[2]}|{row[3]}|{row[4]}\n"
                )
                n += 1
        return _IdxCommit(staged=staged, n_rows=n)

    def commit(self, messages):
        import glob as _glob
        import os
        import shutil

        os.makedirs(self.path, exist_ok=True)
        if self.overwrite:
            # overwrite semantics resolve at COMMIT time: old part files
            # vanish in the same step that publishes the new ones, so a
            # failed job (no commit) leaves the previous data intact
            for old in _glob.glob(os.path.join(self.path, "part-*.idx")):
                os.remove(old)
        final = []
        for i, m in enumerate(messages):
            dst = os.path.join(self.path, f"part-{i:05d}.idx")
            shutil.move(m.staged, dst)
            final.append((os.path.basename(dst), m.n_rows))
        with open(os.path.join(self.path, "_committed"), "w") as fh:
            for name, n in final:
                fh.write(f"{name}\t{n}\n")
        shutil.rmtree(os.path.join(self.path, "_staging"), ignore_errors=True)

    def abort(self, messages):
        import os
        import shutil

        for m in messages:
            if m is not None and os.path.exists(m.staged):
                os.remove(m.staged)
        shutil.rmtree(os.path.join(self.path, "_staging"), ignore_errors=True)
