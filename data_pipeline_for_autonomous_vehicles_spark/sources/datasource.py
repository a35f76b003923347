"""Spark 4 Python DataSource for the OpenSky-style poll-replay source.

Reference: src/ingestion/opensky_source.py:146-177 — a driver-side REST
poll loop (poll every N s, cap vehicles per poll, stop after max_polls)
feeding Kafka. The idiomatic Spark 4 form is a first-class
`pyspark.sql.datasource.DataSource` registered under a format name, so the
same source works as

    spark.read.format("opensky_replay").options(...)          # batch
    spark.readStream.format("opensky_replay").options(...)    # one micro-batch per poll

with the poll index as the streaming offset — exactly-once resumable from
the checkpoint, which the reference's fire-and-forget poll loop is not.

The container has no network, so the "REST call" is a deterministic
seeded state-vector generator (same per-(seed, poll, slot) record every
run, any partitioning) — the recorded-fixture strategy SURVEY §7.3 calls
for. A live deployment swaps `_poll_rows` for the real GET /states/all;
nothing else changes.

Scale: each poll is one InputPartition, so executors read polls in
parallel in batch mode; in streaming, offset bookkeeping is O(1) per
micro-batch regardless of history length.
"""

from __future__ import annotations

import random
from collections.abc import Iterator, Sequence

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    InputPartition,
)
from pyspark.sql.types import StructType

# schema mirrors sources.opensky.STATE_SCHEMA plus the poll index
SCHEMA_DDL = (
    "poll_id INT, icao24 STRING, callsign STRING, origin_country STRING, "
    "time_position BIGINT, longitude DOUBLE, latitude DOUBLE, "
    "velocity_ms DOUBLE, baro_altitude_m DOUBLE"
)

_COUNTRIES = ("Germany", "France", "United States", "Japan", "Brazil")
_EPOCH0 = 1_700_000_000  # fixed base so runs are reproducible


def _poll_rows(seed: int, poll: int, per_poll: int) -> list[tuple]:
    """Deterministic stand-in for one GET /states/all response: the record
    for (seed, poll, slot) is a pure function of its arguments, so any
    executor produces identical rows (opensky_source.py:69-99 field set)."""
    out = []
    for i in range(per_poll):
        rng = random.Random(f"{seed}:{poll}:{i}")
        icao = f"{rng.randrange(0x100000, 0xFFFFFF):06x}"
        out.append(
            (
                poll,
                icao,
                f"FLT{rng.randrange(100, 999)} ",
                _COUNTRIES[rng.randrange(len(_COUNTRIES))],
                _EPOCH0 + poll * 10 + rng.randrange(10),
                rng.uniform(-10.0, 10.0),
                rng.uniform(45.0, 55.0),
                rng.uniform(50.0, 280.0),
                rng.uniform(500.0, 12_000.0),
            )
        )
    return out


class _PollPartition(InputPartition):
    def __init__(self, poll: int, seed: int, per_poll: int):
        self.poll = poll
        self.seed = seed
        self.per_poll = per_poll


class OpenSkyReplayReader(DataSourceReader):
    def __init__(self, options: dict):
        self.n_polls = int(options.get("n_polls", 3))
        self.seed = int(options.get("seed", 42))
        self.per_poll = int(options.get("per_poll", 25))

    def partitions(self) -> Sequence[InputPartition]:
        return [
            _PollPartition(p, self.seed, self.per_poll) for p in range(self.n_polls)
        ]

    def read(self, partition: _PollPartition) -> Iterator[tuple]:
        yield from _poll_rows(partition.seed, partition.poll, partition.per_poll)


class OpenSkyReplayStreamReader(DataSourceStreamReader):
    """Offset = poll index. `latestOffset` reports how many polls exist *at
    call time*: in replay mode all `n_polls` are already available (so
    Trigger.AvailableNow drains everything in one pass and stops — the
    reference's max_polls bound, opensky_source.py:160-163); a live
    deployment would instead return the number of completed REST polls,
    giving one micro-batch per poll under a processingTime trigger.
    Unprocessed-offset state lives in the checkpoint → exactly-once resume."""

    def __init__(self, options: dict):
        self.n_polls = int(options.get("n_polls", 3))
        self.seed = int(options.get("seed", 42))
        self.per_poll = int(options.get("per_poll", 25))

    def initialOffset(self) -> dict:
        return {"poll": 0}

    def latestOffset(self) -> dict:
        return {"poll": self.n_polls}

    def partitions(self, start: dict, end: dict) -> Sequence[InputPartition]:
        return [
            _PollPartition(p, self.seed, self.per_poll)
            for p in range(start["poll"], end["poll"])
        ]

    def read(self, partition: _PollPartition) -> Iterator[tuple]:
        yield from _poll_rows(partition.seed, partition.poll, partition.per_poll)

    def commit(self, end: dict) -> None:
        pass

    def stop(self) -> None:
        pass


class OpenSkyReplayDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "opensky_replay"

    def schema(self) -> str:
        return SCHEMA_DDL

    def reader(self, schema: StructType) -> OpenSkyReplayReader:
        return OpenSkyReplayReader(self.options)

    def streamReader(self, schema: StructType) -> OpenSkyReplayStreamReader:
        return OpenSkyReplayStreamReader(self.options)


def register(spark) -> None:
    spark.dataSource.register(OpenSkyReplayDataSource)
