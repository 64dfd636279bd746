"""S1 (the RPC block poller) as a first-class Spark *Python DataSource*.

The reference's ingest tier is N async workers polling Solana ``getBlock``
over HTTP, sharding slots round-robin (``slot += NUM_WORKERS``,
``SERVER/subscriber.py:30-117``) and handing each raw JSON block downstream.
Earlier layers of this repo model that as a file landing zone; this module is
the *native* Spark 4 re-expression: a custom ``DataSource`` named
``solana_blocks`` with

- a **batch reader** whose input partitions ARE the worker shards — partition
  ``w`` of ``n_workers`` serves exactly the slots ``slot % n_workers == w``,
  the reference's sharding rule verbatim;
- a **micro-batch stream reader** whose offset is the next unread slot
  (``{"slot": N}``), advancing ``blocks_per_batch`` slots per trigger — the
  2.4 s-cadence polling loop restated as Spark's own offset contract
  (``initialOffset``/``latestOffset``/``partitions``/``commit``).

No live RPC exists in this environment, so the "fetch" step is the
deterministic block generator (``sources/solana.py``) — same nested getBlock
shape, same watchlist hit structure. A production deployment would replace
``_fetch_slot`` with the HTTP call; every other line (sharding, offsets,
schema, downstream parse) is the real operator, and the tests prove the
datasource path is row-identical to the file-landing-zone path.

Scale notes: partitions are independent (no driver-side enumeration of rows;
each executor generates/fetches only its own slots), so ``n_workers`` can be
raised to any cluster width. Offsets are O(1) integers; no state beyond the
checkpoint. The payload column is one ~MB JSON document per row — the same
row shape Spark's JSON source shreds in parallel downstream.
"""

from __future__ import annotations

import json
from typing import Iterator, Sequence

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    InputPartition,
)

SCHEMA = "slot BIGINT, block_time BIGINT, payload STRING"


def _gen_blocks(n_blocks: int, seed: int, tx_scale: int):
    # Local import: executors unpickle this module without pulling the
    # package's __init__ chain.
    from .solana import generate_blocks

    return generate_blocks(n_blocks=n_blocks, seed=seed, tx_scale=tx_scale)


def _rows_for_worker(
    worker: int, n_workers: int, first_slot: int, end_slot: int,
    n_blocks: int, seed: int, tx_scale: int,
) -> Iterator[tuple]:
    """Yield (slot, block_time, payload) for this worker's shard of
    [first_slot, end_slot) — slot % n_workers == worker, exactly
    SERVER/subscriber.py:111."""
    blocks = _gen_blocks(n_blocks, seed, tx_scale)
    for slot in range(first_slot, end_slot):
        if slot % n_workers != worker:
            continue
        blk = blocks[slot % len(blocks)]
        yield (
            slot,
            int(blk["result"]["blockTime"]),
            json.dumps(blk, separators=(",", ":")),
        )


class _WorkerShard(InputPartition):
    def __init__(self, worker: int, start: int, end: int):
        self.worker = worker
        self.start = start
        self.end = end


class _Options:
    """Parsed, defaulted reader options (shared batch/stream)."""

    def __init__(self, options: dict):
        self.n_workers = int(options.get("n_workers", 4))
        self.n_blocks = int(options.get("n_blocks", 20))
        self.seed = int(options.get("seed", 7))
        self.tx_scale = int(options.get("tx_scale", 1))
        self.first_slot = int(options.get("first_slot", 1000))
        # Batch: total slots to read. Stream: slots per micro-batch.
        self.n_slots = int(options.get("n_slots", self.n_blocks))
        self.blocks_per_batch = int(options.get("blocks_per_batch", 4))
        self.max_slots = int(options.get("max_slots", 0))  # 0 = unbounded


class SolanaBlockBatchReader(DataSourceReader):
    def __init__(self, opts: _Options):
        self.o = opts

    def partitions(self) -> Sequence[InputPartition]:
        end = self.o.first_slot + self.o.n_slots
        return [
            _WorkerShard(w, self.o.first_slot, end)
            for w in range(self.o.n_workers)
        ]

    def read(self, partition: _WorkerShard) -> Iterator[tuple]:
        return _rows_for_worker(
            partition.worker, self.o.n_workers, partition.start, partition.end,
            self.o.n_blocks, self.o.seed, self.o.tx_scale,
        )


class SolanaBlockStreamReader(DataSourceStreamReader):
    """Micro-batch reader: offset = next unread slot (a single int)."""

    def __init__(self, opts: _Options):
        self.o = opts

    def initialOffset(self) -> dict:
        return {"slot": self.o.first_slot}

    def latestOffset(self) -> dict:
        # Advance the poll frontier by one trigger's worth of slots; a
        # bounded stream (max_slots) stops advancing so tests/terminating
        # replays can drain it (the reference's loop never terminates).
        if not hasattr(self, "_frontier"):
            self._frontier = self.o.first_slot
        limit = (
            self.o.first_slot + self.o.max_slots
            if self.o.max_slots
            else self._frontier + self.o.blocks_per_batch
        )
        self._frontier = min(self._frontier + self.o.blocks_per_batch, limit)
        return {"slot": self._frontier}

    def partitions(self, start: dict, end: dict) -> Sequence[InputPartition]:
        # Restart safety: after recovery Spark replays from checkpointed
        # offsets, but this reader object is fresh (frontier back at
        # first_slot). Fast-forward the frontier so latestOffset never runs
        # behind an already-committed slot.
        self._frontier = max(
            getattr(self, "_frontier", self.o.first_slot), int(end["slot"])
        )
        return [
            _WorkerShard(w, int(start["slot"]), int(end["slot"]))
            for w in range(self.o.n_workers)
        ]

    def read(self, partition: _WorkerShard) -> Iterator[tuple]:
        return _rows_for_worker(
            partition.worker, self.o.n_workers, partition.start, partition.end,
            self.o.n_blocks, self.o.seed, self.o.tx_scale,
        )

    def commit(self, end: dict) -> None:
        # Fire-and-forget upstream (ST6): nothing to ack. Checkpointed
        # offsets give at-least-once into idempotent sinks — strictly
        # better than the reference's error-swallowing loop.
        pass


class SolanaBlockDataSource(DataSource):
    """``spark.read.format("solana_blocks")`` / ``spark.readStream.…``."""

    @classmethod
    def name(cls) -> str:
        return "solana_blocks"

    def schema(self) -> str:
        return SCHEMA

    def reader(self, schema) -> SolanaBlockBatchReader:
        return SolanaBlockBatchReader(_Options(self.options))

    def streamReader(self, schema) -> SolanaBlockStreamReader:
        return SolanaBlockStreamReader(_Options(self.options))


def register_block_datasource(spark) -> None:
    """Idempotently register the datasource on this session."""
    from ..session import ship_package

    ship_package(spark)
    spark.dataSource.register(SolanaBlockDataSource)
