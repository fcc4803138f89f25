"""Custom Python DataSource (Spark 4 ``pyspark.sql.datasource`` API) —
the modern pure-Python connector surface (SURVEY §2.1 extension).

``SyntheticObsDataSource`` is a deterministic GHCN-flavored observation
generator: obs_id → (station, temp) by fixed arithmetic, split across N
``InputPartition``s so the scan parallelizes like any file source. It
stands in for the real-world case (REST pagination, bespoke binary
feeds, instrument protocols) where no built-in reader exists: the
partition-planning / per-partition-iterator contract is identical.

Because generation is pure arithmetic on the row index, the connector is
fully ORACLED — DuckDB reconstructs the same rows from generate_series,
so the driver's differential gate covers the whole read path (partition
planning, Arrow conversion, schema) end to end.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceWriter,
    InputPartition,
    SimpleDataSourceStreamReader,
    WriterCommitMessage,
)


class _ObsPartition(InputPartition):
    def __init__(self, start: int, end: int):
        self.start = start
        self.end = end


class _ObsReader(DataSourceReader):
    def __init__(self, options):
        self.n = int(options.get("rows", 1000))
        self.parts = int(options.get("parts", 8))

    def partitions(self):
        step = max(1, self.n // self.parts)
        bounds = list(range(0, self.n, step))
        return [
            _ObsPartition(lo, min(lo + step, self.n))
            for lo in bounds
            if lo < self.n
        ]

    def read(self, part: _ObsPartition):
        for i in range(part.start, part.end):
            yield (
                i,
                f"station_{i % 7}",
                float((i * 37) % 1000) / 10.0,
            )


class SyntheticObsDataSource(DataSource):
    """spark.read.format("synthetic_obs").option("rows", N).load()"""

    @classmethod
    def name(cls) -> str:
        return "synthetic_obs"

    def schema(self) -> str:
        return "obs_id bigint, station string, temp_c double"

    def reader(self, schema):
        return _ObsReader(self.options)


def register_sources(spark: SparkSession) -> None:
    """Idempotently register custom data sources on a session."""
    for src in (
        SyntheticObsDataSource,
        SyntheticObsStreamDataSource,
        JsonlSinkDataSource,
    ):
        try:
            spark.dataSource.register(src)
        except Exception:
            # already registered on this session — re-registration raises
            pass


# ---------------------------------------------------------------------------
# writer side: a pure-Python sink (same Spark 4 datasource API)
# ---------------------------------------------------------------------------


class _JsonlCommit(WriterCommitMessage):
    def __init__(self, path: str, rows: int):
        self.path = path
        self.rows = rows


class _JsonlWriter(DataSourceWriter):
    """Per-partition writer: each task streams its rows to one .jsonl
    part file named by partition id (deterministic), then reports a
    commit message — the standard two-phase file-sink shape."""

    def __init__(self, options, overwrite: bool):
        self.path = options.get("path")
        self.overwrite = overwrite

    def write(self, iterator):
        import json
        import os

        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        os.makedirs(self.path, exist_ok=True)
        out = os.path.join(self.path, f"part-{pid:05d}.jsonl")
        n = 0
        with open(out, "w") as f:
            for row in iterator:
                f.write(json.dumps(row.asDict()) + "\n")
                n += 1
        return _JsonlCommit(out, n)

    def commit(self, messages):
        import os

        total = sum(m.rows for m in messages if m)
        with open(os.path.join(self.path, "_SUCCESS"), "w") as f:
            f.write(str(total))

    def abort(self, messages):
        import os
        import shutil

        if self.path and os.path.isdir(self.path):
            shutil.rmtree(self.path, ignore_errors=True)


class JsonlSinkDataSource(DataSource):
    """df.write.format("jsonl_sink").option("path", dir).save()"""

    @classmethod
    def name(cls) -> str:
        return "jsonl_sink"

    def writer(self, schema, overwrite: bool):
        return _JsonlWriter(self.options, overwrite)


# ---------------------------------------------------------------------------
# streaming side: a pure-Python micro-batch source
# ---------------------------------------------------------------------------


class _ObsStreamReader(SimpleDataSourceStreamReader):
    """Offset-tracked micro-batch reader: each trigger advances ``pos``
    by ``batch`` rows until ``limit``. ``readBetweenOffsets`` replays a
    committed range deterministically — that replayability is what gives
    the source exactly-once semantics under failure/restart, the same
    contract Kafka offsets provide."""

    def __init__(self, options):
        self.batch = int(options.get("batch", 100))
        self.limit = int(options.get("limit", 300))

    def initialOffset(self):
        return {"pos": 0}

    @staticmethod
    def _rows(lo: int, hi: int):
        return [
            (i, f"station_{i % 7}", float((i * 37) % 1000) / 10.0)
            for i in range(lo, hi)
        ]

    def read(self, start):
        pos = start["pos"]
        end = min(pos + self.batch, self.limit)
        return iter(self._rows(pos, end)), {"pos": end}

    def readBetweenOffsets(self, start, end):
        return iter(self._rows(start["pos"], end["pos"]))


class SyntheticObsStreamDataSource(DataSource):
    """spark.readStream.format("synthetic_obs_stream")
    .option("batch", B).option("limit", N).load()"""

    @classmethod
    def name(cls) -> str:
        return "synthetic_obs_stream"

    def schema(self) -> str:
        return "obs_id bigint, station string, temp_c double"

    def simpleStreamReader(self, schema):
        return _ObsStreamReader(self.options)
