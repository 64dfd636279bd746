"""Streaming-infrastructure queries: driver-verifiable replays of the rows
SURVEY.md §2 marks S8/S9/P12/ST2/ST3/ST6/ST7 — the operators whose substance
is *infrastructure behavior* (pacing, recovery, fan-out, state upserts,
guarded ingest) rather than a single SQL shape.

Each runs as a bounded ``availableNow`` replay over a deterministic file
stream derived from the ``events`` fixture (the ``stream_session_windows``
technique, plans/quality_ops.py), so the result is a plain DataFrame a
DuckDB oracle can hash-match. What each one PROVES:

- ``stream_dim_upsert_replay`` (S9, SERVER/combined_subscriber.py:86-98):
  micro-batched keyed upserts into a parquet dimension converge to the
  global last-writer-wins answer regardless of batch boundaries — the merge
  is ordered by (ts, event_id), associative across batches.
- ``stream_checkpoint_restart`` (ST6): two separate ``availableNow`` runs
  share one checkpoint; run 2 processes ONLY files that arrived after run 1.
  Any replay or loss would break the exact batch-equality of the final
  counts.
- ``stream_backpressure_paced`` (ST2, the reference's bounded worker queue,
  RECEIVER/parser_main.cpp): ``maxFilesPerTrigger=1`` over 4 source files
  must yield exactly 4 micro-batches; the paced result still equals the
  batch answer.
- ``stream_fanout_two_sinks`` (ST7, SERVER/flightWithRedis.py dual
  Flight+Redis write path): one source micro-batch feeds two independent
  sinks inside ``foreachBatch``; both sinks must be complete.
- ``stream_watermark_append`` (ST3): watermarked tumbling-window counts in
  APPEND output mode — windows emit only once the event-time watermark
  passes their end (a max-event-time sentinel finalizes all real windows;
  the no-data micro-batch does the emission).
- ``lookup_batched_mapinpandas`` (S8, SERVER/combined_subscriber.py:46-55):
  the batched external-lookup enrichment with a deterministic md5-derived
  fake fetch, so the oracle recomputes the "HTTP response" in SQL.
- ``json_size_guard_quarantine`` (P12, RECEIVER/parser_main.cpp:92-97 size
  and parse guards): raw lines classified oversize / corrupt / ok BEFORE
  parsing, over a generated corpus with known-bad lines.

Scale notes: every replay keeps the stream→sink path distributed (memory /
parquet sinks, no driver collect of data rows); driver-side state is bounded
to batch ids and scalar counts. The dimension upsert rewrites a dim whose
size is O(distinct keys), not O(stream) — the Redis-hash analogue.
"""

from __future__ import annotations

import json
import os
import tempfile
from contextlib import ExitStack, contextmanager

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import scalars as S
from ..functions.scalars import DUCK, SPARK
from ..sources.tables import load_tables
from ..tmpdirs import scratch_dir
from .registry import register

_WM_DELAY = "30 minutes"
_GUARD_N = 2000
_GUARD_MAX_BYTES = 4096


def _events_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The events source for the streaming replays, VIEW-FIRST: when an
    `events` temp view is registered (the registry wrapper always
    registers one before a builder runs) read through it, so harness-level
    input substitution — the degenerate-input sweeps swap the view for an
    empty / all-NULL / single-row variant — reaches the landing-zone
    replays instead of being silently bypassed by a direct parquet read
    (the round-6 sweeps classified these queries `rows-diff
    self-sourced`; this removes the artifact class entirely). Falls back
    to the parquet loader for direct callers that never registered views.

    View-first requires the registry's view cache to say the registered
    views point at THIS sf_dir — not bare `tableExists`, and not a cache
    hit for some other directory: tests register hand-data temp views
    (tearing down only the cache) and also call raw builders against
    private tmp dirs while the session still holds real views for the
    fixture dir; either stale source leaked into later tests when the
    gate was looser (order-dependent failures in test_streaming_windows,
    round 7). The wrapper and sweep paths always set the cache to the
    sf_dir they pass, so they keep the view-first behavior."""
    return _static_table(spark, sf_dir, "events")


def _static_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """The ``_events_table`` view-first contract generalized to any fixture
    table the composed streaming jobs read (lineitem/supplier/part/...):
    the registered temp view is used ONLY when the registry's view cache
    says the session's views point at THIS sf_dir; otherwise load the
    table straight from the requested directory. Keeps direct callers
    whose session holds views for a different directory from silently
    computing against the wrong fixture (round-7 ADVICE on
    _flagship_e2e's unconditional spark.table reads)."""
    try:
        from .registry import _VIEWS_FOR

        if _VIEWS_FOR.get(id(spark)) == sf_dir and spark.catalog.tableExists(name):
            from ..session import tune_session

            tune_session(spark)
            return spark.table(name)
    except Exception:  # noqa: BLE001 - catalog probe must never mask the load
        pass
    return load_tables(spark, sf_dir, (name,))[name]


def _views_valid(spark: SparkSession, sf_dir: str, name: str) -> bool:
    """True iff the session's registered temp views point at ``sf_dir`` —
    the _static_table gate, exposed so STREAMING code can decide the source
    ONCE at stream-build time on the OUTER session. foreachBatch bodies
    must NOT call _static_table on the batch session: its parquet fallback
    runs load_tables -> tune_session on the micro-batch-cloned session,
    and re-setting spark.sql.adaptive.enabled there re-enables AQE inside
    a stateful micro-batch plan (the engine disables it), which breaks
    state-store commit accounting (STATE_STORE_COMMIT_VALIDATION_FAILED,
    'Expected 8 commits but got 0' — found by the empty-input sweep on
    the composed flagship)."""
    try:
        from .registry import _VIEWS_FOR

        return _VIEWS_FOR.get(id(spark)) == sf_dir and spark.catalog.tableExists(
            name
        )
    except Exception:  # noqa: BLE001
        return False


def _events_src(spark: SparkSession, sf_dir: str, cols: list[str]) -> DataFrame:
    return _events_table(spark, sf_dir).select(*cols)


# Epoch base for slice mtime stamping; any fixed past instant works (the
# file source only compares mtimes relative to each other).
_SLICE_MTIME_BASE = 1_700_000_000


def _stamp_slice_mtimes(path: str, seen: set[str], slice_idx: int) -> None:
    """Pin every file the slice just landed to a DISTINCT, strictly
    increasing mtime (base + slice index, whole seconds). FileStreamSource
    orders the files of one listing by modification time and breaks ties
    arbitrarily — two slices appended within the filesystem's mtime
    granularity could replay out of order and diverge a stateful fold from
    its event-time oracle (round-9 ADVICE on _price_maint_e2e). ``seen``
    carries across calls so a later slice never re-stamps an earlier one."""
    t = _SLICE_MTIME_BASE + slice_idx
    for name in sorted(os.listdir(path)):
        p = os.path.join(path, name)
        if p in seen or not os.path.isfile(p):
            continue
        os.utime(p, (t, t))
        seen.add(p)


def _write_slices(
    df: DataFrame,
    path: str,
    n: int,
    slice_col: str = "event_id",
    indices: "range | None" = None,
    seen_files: "set[str] | None" = None,
) -> None:
    """Write ``df`` as exactly ``n`` parquet files (one sequential append per
    slice) so ``maxFilesPerTrigger=1`` paces the replay into ``n`` batches,
    each slice mtime-stamped so the file source replays them in landing
    order even on coarse-granularity filesystems. ``indices`` restricts to
    a subset of the n slices, letting a caller stage arrivals across stream
    restarts (file-stream landing semantics); such callers pass one
    ``seen_files`` set across calls so re-staged slices keep later stamps."""
    seen = seen_files if seen_files is not None else set()
    for i in indices if indices is not None else range(n):
        (
            df.where(F.col(slice_col) % n == i)
            .coalesce(1)
            .write.mode("append")
            .parquet(path)
        )
        _stamp_slice_mtimes(path, seen, i)


def _run_available_now(writer) -> None:
    q = writer.trigger(availableNow=True).start()
    # awaitTermination(timeout) returns False when the query is STILL
    # RUNNING at the deadline — ignoring that silently truncated the
    # result (round-9 ADVICE). A hung replay must fail loudly, not grade
    # a partial sink.
    if not q.awaitTermination(300):
        q.stop()
        raise TimeoutError(
            "streaming replay still running after 300 s (availableNow)"
        )


@contextmanager
def _state_partitions(spark: SparkSession, n: int = 8):
    """Pin the state-store partition count for a stateful replay.

    Streaming state partitioning is fixed by ``spark.sql.shuffle.partitions``
    at FIRST checkpoint creation and AQE never coalesces it — in a session
    that keeps the 200 default, a replay over a few thousand keys would run
    200 state tasks per micro-batch. Production sizes this knob to the
    cluster; the replays pin a small count to match their key space. The
    session value is restored afterwards (batch queries are unaffected
    either way — AQE re-coalesces those)."""
    old = None
    try:
        old = spark.conf.get("spark.sql.shuffle.partitions")
    except Exception:  # pragma: no cover
        pass
    spark.conf.set("spark.sql.shuffle.partitions", str(n))
    try:
        yield
    finally:
        if old is not None:
            spark.conf.set("spark.sql.shuffle.partitions", old)


# ---------------------------------------------------------------------------
# S9 — keyed dimension upsert, micro-batched
# ---------------------------------------------------------------------------

_DIM_UPSERT_ORACLE = """
SELECT user_id, event_id AS last_event_id, value AS last_value
FROM (
    SELECT user_id, event_id, value,
        row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
    FROM events WHERE event_type = 'purchase'
) t
WHERE rn = 1
ORDER BY user_id
"""


@register(
    "stream_dim_upsert_replay",
    oracle=_DIM_UPSERT_ORACLE,
    tags=("streaming", "dim"),
    doc="S9 Redis-state sink as a streaming replay: 4 paced micro-batches "
    "foreachBatch-upsert purchases into a parquet dimension keyed by "
    "user_id, winner ordered by (ts, event_id). The merged dim must equal "
    "the global last-writer-wins row — batch-boundary independence.",
)
def stream_dim_upsert_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..sources.io import upsert_dimension

    src = (
        _events_table(spark, sf_dir)
        .where(F.col("event_type") == "purchase")
        .select("user_id", "ts", "event_id", "value")
    )
    src_dir = scratch_dir(prefix="rugpull_dim_src_")
    _write_slices(src, src_dir, 4)
    dim_dir = os.path.join(scratch_dir(prefix="rugpull_dim_out_"), "dim")

    stream = (
        spark.readStream.schema(src.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src_dir)
    )

    def apply(batch: DataFrame, _bid: int) -> None:
        upsert_dimension(
            batch.sparkSession, batch, dim_dir, ["user_id"], order_by=["ts", "event_id"]
        )

    _run_available_now(
        stream.writeStream.foreachBatch(apply).option(
            "checkpointLocation", scratch_dir(prefix="rugpull_dim_ckpt_")
        )
    )
    return (
        spark.read.parquet(dim_dir)
        .select(
            "user_id",
            F.col("event_id").alias("last_event_id"),
            F.col("value").alias("last_value"),
        )
        .orderBy("user_id")
    )


# ---------------------------------------------------------------------------
# ST6 — checkpointed restart: second run processes only new files
# ---------------------------------------------------------------------------

_CKPT_ORACLE = f"""
SELECT user_id,
    cast(count(*) as bigint) AS n_clicks,
    {S.dsum('value', DUCK)} AS click_value
FROM events WHERE event_type = 'click'
GROUP BY user_id
ORDER BY user_id
"""


@register(
    "stream_checkpoint_restart",
    oracle=_CKPT_ORACLE,
    tags=("streaming", "recovery"),
    doc="ST6 checkpoint recovery: run 1 streams half the click files to a "
    "parquet sink, then new files land and run 2 RESTARTS from the same "
    "checkpoint — it must process only the new files (exactly-once). Any "
    "replay would double counts; any loss would drop them.",
)
def stream_checkpoint_restart(spark: SparkSession, sf_dir: str) -> DataFrame:
    src = (
        _events_table(spark, sf_dir)
        .where(F.col("event_type") == "click")
        .select("user_id", "event_id", "value")
    )
    src_dir = scratch_dir(prefix="rugpull_ckpt_src_")
    out_dir = os.path.join(scratch_dir(prefix="rugpull_ckpt_out_"), "out")
    ckpt = scratch_dir(prefix="rugpull_ckpt_log_")

    def run_once() -> None:
        stream = spark.readStream.schema(src.schema).parquet(src_dir)
        _run_available_now(
            stream.writeStream.format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", ckpt)
        )

    src.where(F.col("event_id") % 2 == 0).coalesce(1).write.mode("append").parquet(src_dir)
    run_once()
    src.where(F.col("event_id") % 2 == 1).coalesce(1).write.mode("append").parquet(src_dir)
    run_once()

    return (
        spark.read.parquet(out_dir)
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_clicks"),
            F.expr(S.dsum("value", SPARK)).alias("click_value"),
        )
        .orderBy("user_id")
    )


# ---------------------------------------------------------------------------
# ST2 — backpressure pacing: maxFilesPerTrigger bounds each micro-batch
# ---------------------------------------------------------------------------

_PACED_ORACLE = """
SELECT cast(user_id % 4 as bigint) AS bucket,
    cast(count(*) as bigint) AS n_events,
    4 AS n_batches
FROM events
GROUP BY bucket
ORDER BY bucket
"""


@register(
    "stream_backpressure_paced",
    oracle=_PACED_ORACLE,
    tags=("streaming", "backpressure"),
    doc="ST2 backpressure: 4 source files under maxFilesPerTrigger=1 must "
    "produce exactly 4 micro-batches (the bounded-queue admission the "
    "reference gets from its worker pool), and the paced union still "
    "equals the batch answer.",
)
def stream_backpressure_paced(spark: SparkSession, sf_dir: str) -> DataFrame:
    src = _events_src(spark, sf_dir, ["event_id", "user_id"])
    src_dir = scratch_dir(prefix="rugpull_paced_src_")
    _write_slices(src, src_dir, 4)
    out_dir = os.path.join(scratch_dir(prefix="rugpull_paced_out_"), "out")

    batch_ids: list[int] = []

    def apply(batch: DataFrame, bid: int) -> None:
        batch_ids.append(bid)
        batch.write.mode("append").parquet(out_dir)

    stream = (
        spark.readStream.schema(src.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src_dir)
    )
    _run_available_now(
        stream.writeStream.foreachBatch(apply).option(
            "checkpointLocation", scratch_dir(prefix="rugpull_paced_ckpt_")
        )
    )
    return (
        spark.read.parquet(out_dir)
        .groupBy((F.col("user_id") % 4).cast("bigint").alias("bucket"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_events"))
        .withColumn("n_batches", F.lit(len(batch_ids)))
        .orderBy("bucket")
    )


# ---------------------------------------------------------------------------
# ST7 — fan-out: one stream, two sinks, both complete
# ---------------------------------------------------------------------------

_FANOUT_ORACLE = f"""
WITH clicks AS (
    SELECT user_id, cast(count(*) as bigint) AS n_clicks
    FROM events WHERE event_type = 'click' GROUP BY user_id
), purchases AS (
    SELECT user_id, {S.dsum('value', DUCK)} AS purchase_value
    FROM events WHERE event_type = 'purchase' GROUP BY user_id
)
SELECT coalesce(c.user_id, p.user_id) AS user_id,
    coalesce(c.n_clicks, 0) AS n_clicks,
    p.purchase_value
FROM clicks c
FULL OUTER JOIN purchases p ON c.user_id = p.user_id
ORDER BY user_id
"""


@register(
    "stream_fanout_two_sinks",
    oracle=_FANOUT_ORACLE,
    tags=("streaming", "fanout"),
    doc="ST7 fan-out: each micro-batch lands in BOTH a click sink and a "
    "purchase sink (the reference's simultaneous Flight + Redis writes); "
    "the full-outer join of the two sinks must equal the batch fan-out.",
)
def stream_fanout_two_sinks(spark: SparkSession, sf_dir: str) -> DataFrame:
    src = _events_src(spark, sf_dir, ["event_id", "user_id", "event_type", "value"])
    src_dir = scratch_dir(prefix="rugpull_fan_src_")
    _write_slices(src, src_dir, 2)
    sink_a = os.path.join(scratch_dir(prefix="rugpull_fan_a_"), "clicks")
    sink_b = os.path.join(scratch_dir(prefix="rugpull_fan_b_"), "purchases")

    def apply(batch: DataFrame, _bid: int) -> None:
        batch.where(F.col("event_type") == "click").write.mode("append").parquet(sink_a)
        batch.where(F.col("event_type") == "purchase").write.mode("append").parquet(
            sink_b
        )

    stream = (
        spark.readStream.schema(src.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src_dir)
    )
    _run_available_now(
        stream.writeStream.foreachBatch(apply).option(
            "checkpointLocation", scratch_dir(prefix="rugpull_fan_ckpt_")
        )
    )
    clicks = (
        spark.read.parquet(sink_a)
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_clicks"))
    )
    purchases = (
        spark.read.parquet(sink_b)
        .groupBy("user_id")
        .agg(F.expr(S.dsum("value", SPARK)).alias("purchase_value"))
    )
    return (
        clicks.join(purchases, "user_id", "full")
        .select(
            "user_id",
            F.coalesce("n_clicks", F.lit(0)).alias("n_clicks"),
            "purchase_value",
        )
        .orderBy("user_id")
    )


# ---------------------------------------------------------------------------
# ST3 — watermarked tumbling windows, APPEND output mode
# ---------------------------------------------------------------------------

_WM_ORACLE = """
SELECT cast(floor(epoch(ts) / 3600) * 3600 as bigint) AS window_start,
    cast(count(*) as bigint) AS n_events
FROM events
GROUP BY window_start
ORDER BY window_start
"""


@register(
    "stream_watermark_append",
    oracle=_WM_ORACLE,
    tags=("streaming", "watermark"),
    doc="ST3 watermark/late-data: 1-hour tumbling counts with a 30-minute "
    "watermark in APPEND output mode — a window row is emitted exactly "
    "once, only after the event-time watermark passes its end. A sentinel "
    "row 2 days past max(ts) advances the final watermark so every real "
    "window finalizes (the no-data micro-batch performs the emission); "
    "the sentinel's own window stays unemitted in state.",
)
def stream_watermark_append(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events_table(spark, sf_dir)
    src = ev.select("user_id", "ts")
    sentinel = ev.groupBy().agg(
        F.lit(-1).cast("long").alias("user_id"),
        (F.max("ts") + F.expr("INTERVAL 2 DAYS")).alias("ts"),
    )
    src_dir = scratch_dir(prefix="rugpull_wm_src_")
    src.unionByName(sentinel).repartition(2).write.mode("overwrite").parquet(src_dir)

    stream = spark.readStream.schema(src.schema).parquet(src_dir)
    agg = (
        stream.withWatermark("ts", _WM_DELAY)
        .groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_events"))
        .select(F.unix_timestamp(F.col("w.start")).alias("window_start"), "n_events")
    )
    name = "wm_append_sink_" + os.path.basename(src_dir)[-8:]
    with _state_partitions(spark):
        _run_available_now(
            agg.writeStream.format("memory")
            .queryName(name)
            .outputMode("append")
            .option(
                "checkpointLocation", scratch_dir(prefix="rugpull_wm_ckpt_")
            )
        )
    # The sentinel's own (still-open) window never emits; every real window
    # is past the final watermark and appears exactly once.
    return spark.table(name).orderBy("window_start")


# ---------------------------------------------------------------------------
# S8 — batched external lookup with a deterministic fake fetch
# ---------------------------------------------------------------------------


def _fake_pool_price(key: str) -> float:
    import hashlib

    return (int(hashlib.md5(key.encode()).hexdigest()[:15], 16) % 10_000) / 100.0


_LOOKUP_ORACLE = f"""
WITH b AS (
    SELECT 'pool-' || cast(user_id % 50 as varchar) AS pool_id, value
    FROM events
)
SELECT pool_id,
    cast(cast(('0x' || substring(md5(pool_id), 1, 15)) as bigint) % 10000 as double)
        / 100.0 AS pool_price,
    cast(count(*) as bigint) AS n_rows,
    {S.dsum('value', DUCK)} AS total_value
FROM b
GROUP BY pool_id, pool_price
ORDER BY pool_id
"""


@register(
    "lookup_batched_mapinpandas",
    oracle=_LOOKUP_ORACLE,
    tags=("lookup", "udf"),
    doc="S8 Raydium batched lookup (SERVER/combined_subscriber.py:46-55): "
    "mapInPandas dedupes keys per partition and fetches them in batches of "
    "16 through an injectable fetch function — here a deterministic "
    "md5-derived price the DuckDB oracle recomputes in SQL, proving the "
    "batching/dedup/merge plumbing is value-exact.",
)
def lookup_batched_mapinpandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.udfs import lookup_enrich

    base = _events_src(spark, sf_dir, ["user_id", "value"]).select(
        F.concat(F.lit("pool-"), (F.col("user_id") % 50).cast("string")).alias(
            "pool_id"
        ),
        "value",
    )

    def fetch(keys: list[str]) -> dict[str, dict]:
        return {k: {"pool_price": _fake_pool_price(k)} for k in keys}

    enriched = lookup_enrich(base, "pool_id", fetch, "pool_price double", batch_size=16)
    return (
        enriched.groupBy("pool_id", "pool_price")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            F.expr(S.dsum("value", SPARK)).alias("total_value"),
        )
        .orderBy("pool_id")
    )


# ---------------------------------------------------------------------------
# P12 — size/parse guards over a corpus with known-bad lines
# ---------------------------------------------------------------------------


def _guard_corpus_path() -> str:
    return os.path.join(
        tempfile.gettempdir(), f"rugpull_guard_corpus_{_GUARD_N}_{_GUARD_MAX_BYTES}"
    )


def _ensure_guard_corpus() -> str:
    """Deterministic newline-JSON corpus: every 97th line truncated mid-string
    (corrupt), every 131st padded past the byte cap (oversize), rest valid."""
    path = _guard_corpus_path()
    file = os.path.join(path, "docs.jsonl")
    if os.path.exists(file):
        return file
    os.makedirs(path, exist_ok=True)
    lines = []
    for i in range(_GUARD_N):
        if i % 97 == 0:
            lines.append('{"doc_id": %d, "text": "truncated mid strin' % i)
        elif i % 131 == 0:
            lines.append(json.dumps({"doc_id": i, "text": "x" * (_GUARD_MAX_BYTES + 64)}))
        else:
            lines.append(json.dumps({"doc_id": i, "text": ("tok-%d " % i) * (1 + i % 7)}))
    tmp = file + ".tmp"
    with open(tmp, "w") as fh:
        fh.write("\n".join(lines) + "\n")
    os.replace(tmp, file)
    return file


_GUARD_ORACLE = f"""
WITH raw AS (
    SELECT line
    FROM read_csv('{os.path.join(_guard_corpus_path(), "docs.jsonl")}',
        columns={{'line': 'VARCHAR'}}, delim=chr(1), header=false,
        quote='', escape='')
), cls AS (
    SELECT CASE WHEN length(line) > {_GUARD_MAX_BYTES} THEN 'oversize'
                WHEN NOT json_valid(line) THEN 'corrupt'
                ELSE 'ok' END AS status,
        CASE WHEN json_valid(line)
             THEN cast(json_extract_string(line, '$.doc_id') as bigint) END AS doc_id
    FROM raw
)
SELECT status, cast(count(*) as bigint) AS n,
    cast(sum(doc_id) as bigint) AS id_checksum
FROM cls
GROUP BY status
ORDER BY status
"""


@register(
    "json_size_guard_quarantine",
    oracle=_GUARD_ORACLE,
    tags=("source", "guard"),
    doc="P12 ingestion guards (RECEIVER/parser_main.cpp:92-97): raw lines "
    "classified BEFORE parsing — oversize by byte cap, corrupt by parse "
    "failure, ok otherwise — so one bad payload can never fail the job. "
    "Guard evaluation is a JVM-side projection over spark.read.text; no "
    "Python in the path.",
)
def json_size_guard_quarantine(spark: SparkSession, sf_dir: str) -> DataFrame:
    file = _ensure_guard_corpus()
    raw = spark.read.text(file)
    doc_id = F.get_json_object(F.col("value"), "$.doc_id").cast("bigint")
    status = (
        F.when(F.length("value") > _GUARD_MAX_BYTES, "oversize")
        .when(doc_id.isNull(), "corrupt")
        .otherwise("ok")
    )
    return (
        raw.select(status.alias("status"), doc_id.alias("doc_id"))
        .groupBy("status")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum("doc_id").cast("bigint").alias("id_checksum"),
        )
        .orderBy("status")
    )


# Materialize the guard corpus at import so the oracle runs standalone in a
# fresh DuckDB process, before (or without) any Spark builder.
_ensure_guard_corpus()


# ---------------------------------------------------------------------------
# A2 streaming form — cross-batch exact dedup (dropDuplicates + watermark)
# ---------------------------------------------------------------------------

_DEDUP_ORACLE = f"""
SELECT user_id,
    cast(count(*) as bigint) AS n_events,
    {S.dsum('value', DUCK)} AS sum_value
FROM events WHERE event_type = 'view'
GROUP BY user_id
ORDER BY user_id
"""


@register(
    "stream_dedup_watermark",
    oracle=_DEDUP_ORACLE,
    tags=("streaming", "dedup"),
    doc="A2's streaming form as a driver-verifiable replay: 'view' events "
    "are replayed in 4 paced micro-batches with every third event_id "
    "DUPLICATED into the final batch — so duplicate pairs straddle batch "
    "boundaries and only keyed dedup STATE can remove them. The stream "
    "runs withWatermark + dropDuplicates(event_id) into an append parquet "
    "sink; the result must equal the plain batch aggregate over the "
    "original (duplicate-free) events — stream ≡ batch under cross-batch "
    "duplication. The replay's watermark delay exceeds the replay horizon "
    "so eviction provably cannot race the late duplicates; in production "
    "the same delay knob bounds state to the out-of-orderness window, "
    "keeping state O(keys within the watermark), not O(stream).",
)
def stream_dedup_watermark(spark: SparkSession, sf_dir: str) -> DataFrame:
    src = (
        _events_table(spark, sf_dir)
        .where(F.col("event_type") == "view")
        .select("event_id", "ts", "user_id", "value")
    )
    src_dir = scratch_dir(prefix="rugpull_sdedup_src_")
    # Originals land in files 1-3 (non-multiples sliced into 2, multiples of
    # 3 as the 3rd); the SAME multiples-of-3 rows append again as the 4th
    # file, so every duplicate arrives in a LATER micro-batch than its
    # original (maxFilesPerTrigger=1 => one file per batch, in file order).
    _write_slices(src.where(F.col("event_id") % 3 != 0), src_dir, 2)
    src.where(F.col("event_id") % 3 == 0).coalesce(1).write.mode(
        "append"
    ).parquet(src_dir)
    src.where(F.col("event_id") % 3 == 0).coalesce(1).write.mode(
        "append"
    ).parquet(src_dir)
    out_dir = os.path.join(scratch_dir(prefix="rugpull_sdedup_out_"), "rows")

    stream = (
        spark.readStream.schema(src.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src_dir)
    )
    deduped = stream.withWatermark("ts", "3650 days").dropDuplicates(["event_id"])
    with _state_partitions(spark):
        _run_available_now(
            deduped.writeStream.format("parquet")
            .option("path", out_dir)
            .option(
                "checkpointLocation", scratch_dir(prefix="rugpull_sdedup_ckpt_")
            )
            .outputMode("append")
        )
    return (
        spark.read.parquet(out_dir)
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
            F.sum(F.col("value").cast("decimal(38,6)"))
            .cast("double")
            .alias("sum_value"),
        )
        .orderBy("user_id")
    )


# ---------------------------------------------------------------------------
# Stream-stream interval join replay (inner, watermark-bounded state)
# ---------------------------------------------------------------------------

_SSJOIN_ORACLE = """
SELECT c.event_id AS click_id, p.event_id AS purchase_id, c.user_id,
    cast(floor(epoch(p.ts)) as bigint) - cast(floor(epoch(c.ts)) as bigint)
        AS lag_s
FROM events c
JOIN events p ON c.user_id = p.user_id
    AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL 1 HOUR
WHERE c.event_type = 'click' AND p.event_type = 'purchase'
ORDER BY click_id, purchase_id
"""


@register(
    "stream_stream_join_replay",
    oracle=_SSJOIN_ORACLE,
    tags=("streaming", "join"),
    doc="Stream-stream INNER interval join as a driver-verifiable replay: "
    "clicks and purchases arrive as two independent file streams (2 paced "
    "micro-batches each), joined on user within a 1-hour event-time "
    "interval. Both sides carry watermarks so each side's buffered state "
    "is bounded by the interval + watermark delay — the core mechanism "
    "that makes unbounded two-stream correlation feasible. Inner matches "
    "emit as soon as both rows exist; the replayed result must equal the "
    "batch interval join row-for-row.",
)
def stream_stream_join_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events_table(spark, sf_dir)
    clicks = ev.where(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        F.col("user_id").alias("c_user"),
        F.col("ts").alias("c_ts"),
    )
    purchases = ev.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("p_ts"),
    )
    c_dir = scratch_dir(prefix="rugpull_ssj_c_")
    p_dir = scratch_dir(prefix="rugpull_ssj_p_")
    _write_slices(clicks, c_dir, 2, slice_col="click_id")
    _write_slices(purchases, p_dir, 2, slice_col="purchase_id")

    cs = (
        spark.readStream.schema(clicks.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(c_dir)
        .withWatermark("c_ts", "2 hours")
    )
    ps = (
        spark.readStream.schema(purchases.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(p_dir)
        .withWatermark("p_ts", "2 hours")
    )
    joined = cs.join(
        ps,
        F.expr(
            "c_user = p_user AND p_ts >= c_ts "
            "AND p_ts <= c_ts + interval 1 hour"
        ),
        "inner",
    ).select(
        "click_id",
        "purchase_id",
        F.col("c_user").alias("user_id"),
        (F.unix_timestamp("p_ts") - F.unix_timestamp("c_ts")).alias("lag_s"),
    )
    out_dir = os.path.join(scratch_dir(prefix="rugpull_ssj_out_"), "rows")
    with _state_partitions(spark):
        _run_available_now(
            joined.writeStream.format("parquet")
            .option("path", out_dir)
            .option(
                "checkpointLocation", scratch_dir(prefix="rugpull_ssj_ckpt_")
            )
            .outputMode("append")
        )
    return spark.read.parquet(out_dir).orderBy("click_id", "purchase_id")


# ---------------------------------------------------------------------------
# Streaming Bollinger breakout — stateful ring-buffer twin of the batch op
# ---------------------------------------------------------------------------

# Exact integer-arithmetic restatement of |v - mean| > 2·sample_sd over the
# 8-row frame: (n-1)(n·v - s)² > 4n(n·s2 - s²). Micro-unit longs keep every
# quantity integral (HUGEINT guards the ~1e20 products); a float sd near the
# threshold could flip the breakout flag between engines, a row-SET
# difference no rounding can hide.
_BOLL_ORACLE = """
WITH scaled AS (
    SELECT event_type, ts, event_id,
        cast(floor(value * 1000000.0) as bigint) AS v
    FROM events WHERE value IS NOT NULL
),
frames AS (
    SELECT event_type, ts, v,
        cast(count(*) OVER w as bigint) AS n,
        cast(sum(v) OVER w as hugeint) AS s,
        cast(sum(cast(v as hugeint) * v) OVER w as hugeint) AS s2
    FROM scaled
    WINDOW w AS (PARTITION BY event_type ORDER BY ts, event_id
                 ROWS BETWEEN 7 PRECEDING AND CURRENT ROW)
)
SELECT event_type,
    cast(floor(epoch(ts)) as bigint) AS ts_epoch,
    v AS v_micro
FROM frames
WHERE n = 8
  AND cast(n - 1 as hugeint) * (n * v - s) * (n * v - s)
      > cast(4 * n as hugeint) * (n * s2 - s * s)
ORDER BY event_type, ts_epoch, v_micro
"""


@register(
    "stream_bollinger_alert",
    oracle=_BOLL_ORACLE,
    tags=("streaming", "stateful", "series"),
    doc="Bollinger breakout as a custom stateful streaming operator "
    "(applyInPandasWithState): per event type the state is a ring buffer "
    "of the last 7 micro-unit longs — O(active keys) state, never "
    "O(stream) — and a row whose full 8-row frame leaves the ±2σ envelope "
    "emits an alert. The breakout test runs in EXACT integer arithmetic "
    "((n-1)(n·v-s)² > 4n(n·s2-s²)), so the emitted row set is "
    "bit-identical to the SQL window oracle; the streaming twin of the "
    "batch window_bollinger_bands.",
)
def stream_bollinger_alert(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..streaming.pipelines import bollinger_alerts

    src = (
        _events_src(spark, sf_dir, ["event_type", "ts", "event_id", "value"])
        .where(F.col("value").isNotNull())
        .select(
            "event_type",
            "ts",
            "event_id",
            # Fixed-point scaling happens JVM-side so the Python kernel and
            # the oracle fold over the identical longs.
            F.floor(F.col("value") * F.lit(1000000.0)).cast("long").alias("v"),
        )
    )
    src_dir = scratch_dir(prefix="rugpull_boll_src_")
    src.repartition(2).write.mode("overwrite").parquet(src_dir)
    stream = spark.readStream.schema(src.schema).parquet(src_dir)
    with _state_partitions(spark, 8):
        out = bollinger_alerts(stream)
        name = "boll_sink_" + os.path.basename(src_dir)[-8:]
        _run_available_now(
            out.writeStream.format("memory")
            .queryName(name)
            .outputMode("append")
            .option(
                "checkpointLocation", scratch_dir(prefix="rugpull_boll_ckpt_")
            )
        )
    return spark.table(name).orderBy("event_type", "ts_epoch", "v_micro")


# ---------------------------------------------------------------------------
# Streaming last-touch attribution — keyed one-touch state
# ---------------------------------------------------------------------------

_ATTR_STREAM_ORACLE = f"""
WITH p AS (
    SELECT event_id, user_id, ts, value FROM events
    WHERE event_type = 'purchase'
),
t AS (
    SELECT user_id, ts, event_id, event_type FROM events
    WHERE event_type <> 'purchase'
),
best AS (
    SELECT p.event_id, p.user_id, p.value,
        CASE WHEN t.ts IS NOT NULL
              AND {S.epoch_s('p.ts', DUCK)} - {S.epoch_s('t.ts', DUCK)} <= 3600
             THEN t.event_type ELSE 'direct' END AS channel,
        row_number() OVER (
            PARTITION BY p.event_id
            ORDER BY t.ts DESC, t.event_id DESC
        ) AS rn
    FROM p
    LEFT JOIN t ON t.user_id = p.user_id AND t.ts <= p.ts
)
SELECT event_id, user_id, channel, round(value, 6) AS purchase_value
FROM best WHERE rn = 1
ORDER BY event_id
"""


@register(
    "stream_attribution_replay",
    oracle=_ATTR_STREAM_ORACLE,
    tags=("streaming", "stateful", "events"),
    doc="Last-touch attribution as a custom stateful streaming operator: "
    "state per user is exactly ONE (epoch-sec, type) touch — O(active "
    "users) — and each purchase emits its attributed channel on arrival "
    "('direct' beyond the 1-hour lookback). The per-purchase emissions "
    "replayed over the events fixture equal the batch argmax-join oracle "
    "row-for-row; the streaming twin of events_attribution_last_touch's "
    "aggregated rollup.",
)
def stream_attribution_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..streaming.pipelines import attribution_events

    src = _events_src(
        spark, sf_dir, ["user_id", "ts", "event_id", "event_type", "value"]
    ).withColumn(
        "kind",
        F.when(F.col("event_type") == "purchase", F.lit(1)).otherwise(F.lit(0)),
    )
    src_dir = scratch_dir(prefix="rugpull_attr_src_")
    src.repartition(2).write.mode("overwrite").parquet(src_dir)
    stream = spark.readStream.schema(src.schema).parquet(src_dir)
    with _state_partitions(spark, 8):
        out = attribution_events(stream)
        name = "attr_sink_" + os.path.basename(src_dir)[-8:]
        _run_available_now(
            out.writeStream.format("memory")
            .queryName(name)
            .outputMode("append")
            .option(
                "checkpointLocation", scratch_dir(prefix="rugpull_attr_ckpt_")
            )
        )
    return (
        spark.table(name)
        .select(
            "event_id",
            "user_id",
            "channel",
            F.round("purchase_value", 6).alias("purchase_value"),
        )
        .orderBy("event_id")
    )


# ---------------------------------------------------------------------------
# CUSUM changepoint alerts — recursive fold, exact integer arithmetic
# ---------------------------------------------------------------------------

# Per key: 20-sample warm-up fixes sum20; then s_i = max(0, s_{i-1} +
# 20·v_i − sum20); alert and reset when s_i > 5·sum20. Integer micro-units
# end to end, so the Python fold and this recursive walk agree bit-for-bit.
_CUSUM_ORACLE = """
WITH RECURSIVE scaled AS (
    SELECT event_type, ts, event_id,
        cast(floor(value * 1000000.0) as bigint) AS v
    FROM events WHERE value IS NOT NULL
),
arr AS MATERIALIZED (
    SELECT event_type,
        list(v ORDER BY ts, event_id) AS vs,
        list(ts ORDER BY ts, event_id) AS tss,
        count(*) AS n
    FROM scaled GROUP BY event_type
),
walk AS (
    SELECT event_type, 1 AS i,
        cast(0 as bigint) AS s,
        cast(1 as bigint) AS n_warm,
        vs[1] AS sum20,
        false AS alert
    FROM arr WHERE n >= 1
    UNION ALL
    SELECT w.event_type, w.i + 1,
        CASE WHEN w.n_warm < 20 THEN cast(0 as bigint)
             WHEN greatest(cast(0 as bigint),
                    w.s + 20 * a.vs[w.i + 1] - w.sum20) > 5 * w.sum20
                 THEN cast(0 as bigint)
             ELSE greatest(cast(0 as bigint),
                    w.s + 20 * a.vs[w.i + 1] - w.sum20) END,
        CASE WHEN w.n_warm < 20 THEN w.n_warm + 1 ELSE w.n_warm END,
        CASE WHEN w.n_warm < 20 THEN w.sum20 + a.vs[w.i + 1]
             ELSE w.sum20 END,
        w.n_warm >= 20
            AND greatest(cast(0 as bigint),
                    w.s + 20 * a.vs[w.i + 1] - w.sum20) > 5 * w.sum20
    FROM walk w JOIN arr a ON a.event_type = w.event_type
    WHERE w.i < a.n
)
SELECT w.event_type,
    cast(floor(epoch(a.tss[w.i])) as bigint) AS ts_epoch,
    a.vs[w.i] AS v_micro
FROM walk w JOIN arr a ON a.event_type = w.event_type
WHERE w.alert
ORDER BY w.event_type, ts_epoch, v_micro
"""


@register(
    "stream_cusum_alert",
    oracle=_CUSUM_ORACLE,
    tags=("streaming", "stateful", "series"),
    doc="CUSUM changepoint detection as a custom stateful streaming "
    "operator: 20-sample warm-up fixes each key's baseline, then the "
    "classic one-sided fold s = max(0, s + 20·v − sum20) alerts (and "
    "resets) on sustained drift past 5·sum20 — the slow-rug signal a "
    "single-step threshold misses. The fold is EXACT integer arithmetic "
    "over micro-unit longs (three-long state per key), so the replay "
    "hash-matches a recursive-CTE walk oracle — the price-fold proof "
    "technique applied to a second recursive operator.",
)
def stream_cusum_alert(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..streaming.pipelines import cusum_alerts

    src = (
        _events_src(spark, sf_dir, ["event_type", "ts", "event_id", "value"])
        .where(F.col("value").isNotNull())
        .select(
            "event_type",
            "ts",
            "event_id",
            F.floor(F.col("value") * F.lit(1000000.0)).cast("long").alias("v"),
        )
    )
    src_dir = scratch_dir(prefix="rugpull_cusum_src_")
    src.repartition(2).write.mode("overwrite").parquet(src_dir)
    stream = spark.readStream.schema(src.schema).parquet(src_dir)
    with _state_partitions(spark, 8):
        out = cusum_alerts(stream)
        name = "cusum_sink_" + os.path.basename(src_dir)[-8:]
        _run_available_now(
            out.writeStream.format("memory")
            .queryName(name)
            .outputMode("append")
            .option(
                "checkpointLocation", scratch_dir(prefix="rugpull_cusum_ckpt_")
            )
        )
    return spark.table(name).orderBy("event_type", "ts_epoch", "v_micro")


# ---------------------------------------------------------------------------
# S10 — pub/sub control source: a start-signal gates which slices the
# paced stream admits
# ---------------------------------------------------------------------------

# The reference's control plane is a Redis pub/sub channel carrying a
# "starting_slot,start_time" text message (SERVER/subscriber.py:152-161):
# each worker parses the signal, derives my_slot = starting_slot + worker_id,
# and then polls only the slot residue class my_slot % NUM_WORKERS
# (SERVER/subscriber.py:110-112, slot += NUM_WORKERS). Malformed messages
# are swallowed by the handler's try/except (SERVER/subscriber.py:184-185)
# rather than crashing the worker. The Spark analogue: the control channel
# is a FILE the job reads as a tiny static DataFrame; each parsed signal
# admits one slot-residue class, and the paced event stream is gated by a
# broadcast stream-static semi-join on that residue — control messages
# change WHAT the stream processes without touching the streaming query.
#
# Parse is defensively tri-format, JVM-side (no Python in the path):
#   1. JSON object  {"starting_slot": N, "start_time": T}
#   2. CSV          "N,T"            (the reference's actual wire format)
#   3. bare integer "N"
# anything else is ignored (the reference's try/except), expressed as
# coalesce(try_cast(json)..., try_cast(split_part)...) in BOTH dialects.

_CTRL_WORKERS = 4
_CTRL_LINES = (
    "6,1700000000.5",                                     # CSV → residue 2
    '{"starting_slot": 9, "start_time": 1700000100.0}',   # JSON → residue 1
    "12",                                                 # bare → residue 0
    "not-a-signal",                                       # junk → ignored
)


def _ctrl_corpus_path() -> str:
    # Content-keyed stable path (NOT scratch_dir: the oracle text embeds it,
    # so it must resolve identically in a fresh DuckDB-only process).
    return os.path.join(
        tempfile.gettempdir(), f"rugpull_ctrl_corpus_{_CTRL_WORKERS}_{len(_CTRL_LINES)}"
    )


def _ensure_ctrl_corpus() -> str:
    path = _ctrl_corpus_path()
    file = os.path.join(path, "control.txt")
    if os.path.exists(file):
        return file
    os.makedirs(path, exist_ok=True)
    tmp = file + ".tmp"
    with open(tmp, "w") as fh:
        fh.write("\n".join(_CTRL_LINES) + "\n")
    os.replace(tmp, file)
    return file


_CTRL_SLOT_SQL = (
    "coalesce("
    "try_cast({json_slot} as bigint), "
    "try_cast(split_part({line}, ',', 1) as bigint))"
)

_CTRL_ORACLE = f"""
WITH raw AS (
    SELECT line
    FROM read_csv('{os.path.join(_ctrl_corpus_path(), "control.txt")}',
        columns={{'line': 'VARCHAR'}}, delim=chr(1), header=false,
        quote='', escape='')
), sig AS (
    SELECT {_CTRL_SLOT_SQL.format(
        json_slot="CASE WHEN json_valid(line) THEN json_extract_string(line, '$.starting_slot') END",
        line="line")} AS slot
    FROM raw
), res AS (
    SELECT DISTINCT slot % {_CTRL_WORKERS} AS residue FROM sig
    WHERE slot IS NOT NULL
)
SELECT r.residue,
    cast(count(*) as bigint) AS n_events,
    {S.dsum('e.value', DUCK)} AS sum_value,
    cast(max(nb.n_batches) as bigint) AS n_batches
FROM events e
JOIN res r ON e.event_id % {_CTRL_WORKERS} = r.residue
CROSS JOIN (SELECT {_CTRL_WORKERS} AS n_batches) nb
GROUP BY r.residue
ORDER BY r.residue
"""


@register(
    "stream_control_gated_replay",
    oracle=_CTRL_ORACLE,
    tags=("streaming", "control"),
    doc="S10 pub/sub control source (SERVER/subscriber.py:143-185): a "
    "control file of start-signal messages — tri-format-parsed JVM-side "
    "(JSON object / the reference's 'slot,time' CSV / bare int; junk "
    "swallowed like the reference's try/except) — admits one slot-residue "
    "class per signal (my_slot % NUM_WORKERS, the worker-stride sharding "
    "of subscriber.py:110-112). The 4-file paced replay is gated by a "
    "broadcast stream-static semi-join on that residue inside the "
    "streaming query, so the ungated residue's slice flows through a "
    "micro-batch but lands zero rows; the gated union must equal the "
    "batch answer over admitted residues. At scale the control dimension "
    "is O(signals) and broadcast; the gate costs no shuffle.",
)
def stream_control_gated_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    ctrl_file = _ensure_ctrl_corpus()
    line = F.col("value")
    slot = F.expr(
        _CTRL_SLOT_SQL.format(
            json_slot="get_json_object(value, '$.starting_slot')", line="value"
        )
    )
    residues = (
        spark.read.text(ctrl_file)
        .select(slot.alias("slot"))
        .where(F.col("slot").isNotNull())
        .select((F.col("slot") % _CTRL_WORKERS).alias("residue"))
        .distinct()
    )

    src = _events_src(spark, sf_dir, ["event_id", "value"])
    src_dir = scratch_dir(prefix="rugpull_ctrl_src_")
    _write_slices(src, src_dir, _CTRL_WORKERS)
    out_dir = os.path.join(scratch_dir(prefix="rugpull_ctrl_out_"), "out")

    batch_ids: list[int] = []

    def apply(batch: DataFrame, bid: int) -> None:
        batch_ids.append(bid)
        batch.write.mode("append").parquet(out_dir)

    stream = (
        spark.readStream.schema(src.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src_dir)
    )
    gated = (
        stream.withColumn(
            "residue", F.pmod(F.col("event_id"), F.lit(_CTRL_WORKERS))
        )
        .join(F.broadcast(residues), "residue", "inner")
    )
    _run_available_now(
        gated.writeStream.foreachBatch(apply).option(
            "checkpointLocation", scratch_dir(prefix="rugpull_ctrl_ckpt_")
        )
    )
    return (
        spark.read.parquet(out_dir)
        .groupBy(F.col("residue").cast("bigint").alias("residue"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
            F.expr(S.dsum("value", SPARK)).alias("sum_value"),
        )
        .withColumn("n_batches", F.lit(len(batch_ids)).cast("bigint"))
        .orderBy("residue")
    )


# Materialize the control corpus at import so the oracle runs standalone.
_ensure_ctrl_corpus()


# ---------------------------------------------------------------------------
# Streaming drift monitor: PSI re-evaluated after every micro-batch
# ---------------------------------------------------------------------------

_PSI_N_BATCHES = 4


def _psi_prefix_sql(d: str, where: str, batch_id: int) -> str:
    """profile_drift_psi's algebra evaluated over an event-id-sliced prefix
    of the stream, tagged with the micro-batch id that completed it."""
    from .traindata_ops import _psi_drift

    body = _psi_drift(d).replace("FROM events", f"FROM events WHERE {where}")
    body = body.rsplit("ORDER BY", 1)[0]
    return f"SELECT cast({batch_id} as int) AS batch_id, q.* FROM ({body}) q"


_PSI_STREAM_ORACLE = (
    "\nUNION ALL\n".join(
        _psi_prefix_sql(DUCK, f"event_id % {_PSI_N_BATCHES} <= {k}", k)
        for k in range(_PSI_N_BATCHES)
    )
    + "\nORDER BY batch_id, event_type"
)


@register(
    "stream_psi_drift_replay",
    oracle=_PSI_STREAM_ORACLE,
    tags=("streaming", "profiling", "mlprep"),
    doc="The drift monitor as a stream: events replay in 4 paced "
    "micro-batches (maxFilesPerTrigger=1 over event_id%4 slices) and "
    "foreachBatch re-evaluates profile_drift_psi's even/odd-day PSI over "
    "everything accumulated so far, emitting one (batch_id, type, psi) "
    "row set per batch — the converging drift estimate an on-refresh "
    "monitor would alert on, not just the final answer. The oracle "
    "recomputes each prefix independently; accumulated state is a keyed "
    "parquet sink (O(rows seen), re-aggregated per batch over a "
    "few-hundred-row grid), and the emitted history is append-only.",
)
def stream_psi_drift_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    src = _events_src(spark, sf_dir, ["event_id", "ts", "event_type", "value"])
    src_dir = scratch_dir(prefix="rugpull_psi_src_")
    _write_slices(src, src_dir, _PSI_N_BATCHES)
    acc_dir = os.path.join(scratch_dir(prefix="rugpull_psi_acc_"), "acc")
    res_dir = os.path.join(scratch_dir(prefix="rugpull_psi_res_"), "res")
    view = f"psi_acc_{os.getpid()}_{abs(hash(acc_dir)) % 10**8}"

    def apply(batch: DataFrame, bid: int) -> None:
        batch.write.mode("append").parquet(acc_dir)
        s = batch.sparkSession
        s.read.parquet(acc_dir).createOrReplaceTempView(view)
        from .traindata_ops import _psi_drift

        body = _psi_drift(SPARK).replace("FROM events", f"FROM {view}")
        body = body.rsplit("ORDER BY", 1)[0]
        s.sql(
            f"SELECT cast({bid} as int) AS batch_id, q.* FROM ({body}) q"
        ).write.mode("append").parquet(res_dir)

    stream = (
        spark.readStream.schema(src.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src_dir)
    )
    _run_available_now(
        stream.writeStream.foreachBatch(apply).option(
            "checkpointLocation", scratch_dir(prefix="rugpull_psi_ckpt_")
        )
    )
    return spark.read.parquet(res_dir).orderBy("batch_id", "event_type")


# ---------------------------------------------------------------------------
# Streaming heavy hitters: mergeable count-min sketch state, top-k per batch
# ---------------------------------------------------------------------------

_CMS_N_BATCHES = 4


def _cms_sketch_sql(d: str, src: str) -> str:
    """(r, b, c) count-min counters over ``src`` — agg_cms_heavy_hitters'
    sketch build (advanced.py) parameterized by source."""
    from .advanced import _CMS_D, _CMS_W

    key = (
        "cast(user_id as string)" if d == SPARK else "cast(user_id as varchar)"
    )
    h = S.portable_hash64(key, d, seed="r")
    if d == SPARK:
        fanout = f"""
        SELECT user_id, r FROM (
            SELECT user_id, explode(array({', '.join(str(r) for r in range(_CMS_D))})) AS r
            FROM {src}
        ) g"""
    else:
        rows = ", ".join(f"({r})" for r in range(_CMS_D))
        fanout = f"SELECT user_id, r FROM {src} CROSS JOIN (VALUES {rows}) AS t(r)"
    return f"""
    SELECT r, ({h}) % {_CMS_W} AS b, cast(count(*) as bigint) AS c
    FROM ({fanout}) f GROUP BY r, ({h}) % {_CMS_W}
    """


def _cms_topk_sql(d: str, sketch: str, keys: str, batch_id: int) -> str:
    """Top-10 estimated heavy hitters from a (merged) sketch + key set."""
    from .advanced import _CMS_W

    key = (
        "cast(user_id as string)" if d == SPARK else "cast(user_id as varchar)"
    )
    h = S.portable_hash64(key, d, seed="r")
    return f"""
    SELECT cast({batch_id} as int) AS batch_id, user_id, est_count,
        cast(rnk as int) AS rnk
    FROM (
        SELECT user_id, est_count, row_number() OVER (
            ORDER BY est_count DESC, user_id) AS rnk
        FROM (
            SELECT kb.user_id, min(s.c) AS est_count
            FROM (
                SELECT user_id, r, ({h}) % {_CMS_W} AS b
                FROM ({keys}) k2
                CROSS JOIN (SELECT 1 AS one) o {S.explode_seq('r', '0', '3', d)}
            ) kb
            JOIN ({sketch}) s ON s.r = kb.r AND s.b = kb.b
            GROUP BY kb.user_id
        ) est
        ORDER BY est_count DESC, user_id
        LIMIT 10
    ) t
    """


def _cms_stream_oracle() -> str:
    parts = []
    for k in range(_CMS_N_BATCHES):
        where = f"event_id % {_CMS_N_BATCHES} <= {k}"
        sketch = _cms_sketch_sql(DUCK, f"(SELECT user_id FROM events WHERE {where}) pref")
        keys = f"SELECT DISTINCT user_id FROM events WHERE {where}"
        parts.append(_cms_topk_sql(DUCK, f"({sketch})", keys, k))
    return "\nUNION ALL\n".join(parts) + "\nORDER BY batch_id, rnk"


@register(
    "stream_cms_topk_replay",
    oracle=_cms_stream_oracle(),
    tags=("streaming", "agg", "sketch"),
    doc="Streaming heavy hitters with MERGEABLE sketch state: each of 4 "
    "paced micro-batches computes its own count-min counters (4x32) and "
    "the accumulated state is their elementwise SUM — O(D*W) counters "
    "plus the key set, never the raw rows — then emits the top-10 "
    "estimated-count keys after every batch. Counter additivity makes "
    "the merged sketch EXACTLY equal to a from-scratch sketch over the "
    "prefix, which is what the oracle computes independently per prefix; "
    "ranking is integer est DESC with a user_id tie-break. The "
    "mergeable-summary contract (Agarwal et al., CMS) that lets 1000 "
    "executors sketch independently and combine.",
)
def stream_cms_topk_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    src = _events_src(spark, sf_dir, ["event_id", "user_id"])
    src_dir = scratch_dir(prefix="rugpull_cms_src_")
    _write_slices(src, src_dir, _CMS_N_BATCHES)
    sk_dir = os.path.join(scratch_dir(prefix="rugpull_cms_state_"), "sketch")
    key_dir = os.path.join(scratch_dir(prefix="rugpull_cms_state_"), "keys")
    res_dir = os.path.join(scratch_dir(prefix="rugpull_cms_res_"), "res")
    tag = f"{os.getpid()}_{abs(hash(res_dir)) % 10**8}"

    def apply(batch: DataFrame, bid: int) -> None:
        s = batch.sparkSession
        bview = f"cms_batch_{tag}"
        batch.createOrReplaceTempView(bview)
        # batch-local sketch + key set appended to the accumulated state.
        s.sql(_cms_sketch_sql(SPARK, bview)).write.mode("append").parquet(sk_dir)
        s.sql(f"SELECT DISTINCT user_id FROM {bview}").write.mode(
            "append"
        ).parquet(key_dir)
        sk_view, key_view = f"cms_sk_{tag}", f"cms_key_{tag}"
        s.read.parquet(sk_dir).createOrReplaceTempView(sk_view)
        s.read.parquet(key_dir).createOrReplaceTempView(key_view)
        merged = f"SELECT r, b, cast(sum(c) as bigint) AS c FROM {sk_view} GROUP BY r, b"
        keys = f"SELECT DISTINCT user_id FROM {key_view}"
        s.sql(_cms_topk_sql(SPARK, f"({merged})", keys, bid)).write.mode(
            "append"
        ).parquet(res_dir)

    stream = (
        spark.readStream.schema(src.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src_dir)
    )
    _run_available_now(
        stream.writeStream.foreachBatch(apply).option(
            "checkpointLocation", scratch_dir(prefix="rugpull_cms_ckpt_")
        )
    )
    return spark.read.parquet(res_dir).orderBy("batch_id", "rnk")


# ---------------------------------------------------------------------------
# Hopping (sliding) window aggregation — the overlap-window API surface
# ---------------------------------------------------------------------------

_HOP_ORACLE = f"""
WITH e AS (
    SELECT {S.epoch_s('ts', DUCK)} AS es FROM events
),
x AS (
    -- window(length 1h, slide 30m): every event belongs to EXACTLY the two
    -- windows starting at floor(es/1800)*1800 and 1800 s earlier.
    SELECT (({S.idiv('es', '1800', DUCK)}) - k) * 1800 AS window_start
    FROM e, unnest(range(0, 2)) t(k)
)
SELECT window_start, cast(count(*) as bigint) AS n_events
FROM x
GROUP BY window_start
ORDER BY window_start
"""


@register(
    "stream_hopping_window_replay",
    oracle=_HOP_ORACLE,
    tags=("streaming", "window", "watermark"),
    doc="Hopping (sliding) event-time window aggregation in APPEND mode — "
    "the overlap-window surface stream_watermark_append's tumbling window "
    "does not exercise: window('1 hour', slide '30 minutes') fans each "
    "event into exactly two open windows, watermark eviction closes a "
    "window only when the watermark passes its END, and a +2-day sentinel "
    "row flushes every real window exactly once (the sentinel's own two "
    "windows stay open and never emit, proving append-mode emission "
    "discipline on overlapping state). Oracle: each event's two window "
    "starts materialized arithmetically, then a plain GROUP BY. State is "
    "O(open windows), i.e. 2/slide x horizon per key space, independent "
    "of stream length.",
)
def stream_hopping_window_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events_table(spark, sf_dir)
    src = ev.select("user_id", "ts")
    sentinel = ev.groupBy().agg(
        F.lit(-1).cast("long").alias("user_id"),
        (F.max("ts") + F.expr("INTERVAL 2 DAYS")).alias("ts"),
    )
    src_dir = scratch_dir(prefix="rugpull_hop_src_")
    src.unionByName(sentinel).repartition(2).write.mode("overwrite").parquet(src_dir)

    stream = spark.readStream.schema(src.schema).parquet(src_dir)
    agg = (
        stream.withWatermark("ts", _WM_DELAY)
        .groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_events"))
        .select(
            F.unix_timestamp(F.col("w.start")).alias("window_start"), "n_events"
        )
    )
    name = "hop_sink_" + os.path.basename(src_dir)[-8:]
    with _state_partitions(spark):
        _run_available_now(
            agg.writeStream.format("memory")
            .queryName(name)
            .outputMode("append")
            .option("checkpointLocation", scratch_dir(prefix="rugpull_hop_ckpt_"))
        )
    return spark.table(name).orderBy("window_start")


# ---------------------------------------------------------------------------
# Kalman local-level filter — recursive fold, fixed IEEE expression order
# ---------------------------------------------------------------------------

# Per key, over micro-unit doubles z_i: first observation initializes
# (x = z, p = R, innovation 0); then p_n = p + Q, k = p_n/(p_n + R),
# x += k*(z - x), p = (1 - k)*p_n. The Python kernel and this recursive
# walk execute the IDENTICAL expression tree in the identical order, so
# the unrounded doubles agree bit-for-bit; both sides round only the
# emitted unit-scaled columns (SQL round, 6 dp).
_KALMAN_ORACLE = """
WITH RECURSIVE scaled AS (
    SELECT event_type, ts, event_id,
        cast(cast(floor(value * 1000000.0) as bigint) as double) AS z
    FROM events WHERE value IS NOT NULL
),
arr AS MATERIALIZED (
    SELECT event_type,
        list(z ORDER BY ts, event_id) AS zs,
        list(ts ORDER BY ts, event_id) AS tss,
        count(*) AS n
    FROM scaled GROUP BY event_type
),
walk AS (
    SELECT event_type, 1 AS i,
        zs[1] AS x,
        cast(1000000000000 as double) AS p,
        cast(0 as double) AS innov
    FROM arr WHERE n >= 1
    UNION ALL
    SELECT w.event_type, w.i + 1,
        w.x + ((w.p + 10000000000.0) / ((w.p + 10000000000.0)
             + 1000000000000.0)) * (a.zs[w.i + 1] - w.x),
        (1.0 - ((w.p + 10000000000.0) / ((w.p + 10000000000.0)
             + 1000000000000.0))) * (w.p + 10000000000.0),
        a.zs[w.i + 1] - w.x
    FROM walk w JOIN arr a ON a.event_type = w.event_type
    WHERE w.i < a.n
)
SELECT w.event_type,
    cast(floor(epoch(a.tss[w.i])) as bigint) AS ts_epoch,
    round(w.x / 1000000.0, 6) AS filtered,
    round(w.innov / 1000000.0, 6) AS innovation
FROM walk w JOIN arr a ON a.event_type = w.event_type
ORDER BY w.event_type, ts_epoch, filtered, innovation
"""


@register(
    "stream_kalman_filter",
    oracle=_KALMAN_ORACLE,
    tags=("streaming", "stateful", "series"),
    doc="1-D Kalman filter (local-level model) as a custom stateful "
    "streaming operator: per key the state is just (level estimate x, "
    "error variance p) — the optimal recursive smoother that the "
    "reference's single-step ±10% predicate and the Bollinger ring "
    "buffer both approximate, emitting the filtered level AND the "
    "innovation (the residual every downstream changepoint test wants) "
    "for every observation. The fold is a fixed IEEE double expression "
    "tree over micro-unit observations, so the availableNow replay "
    "hash-matches a recursive-CTE walk oracle running the identical "
    "arithmetic — the CUSUM proof technique extended from integer to "
    "floating-point recursion. O(active keys) state, O(rows) output, "
    "no shuffle beyond the keyed state exchange.",
)
def stream_kalman_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..streaming.pipelines import kalman_filtered

    src = (
        _events_src(spark, sf_dir, ["event_type", "ts", "event_id", "value"])
        .where(F.col("value").isNotNull())
        .select(
            "event_type",
            "ts",
            "event_id",
            F.floor(F.col("value") * F.lit(1000000.0)).cast("long").alias("v"),
        )
    )
    src_dir = scratch_dir(prefix="rugpull_kalman_src_")
    src.repartition(2).write.mode("overwrite").parquet(src_dir)
    stream = spark.readStream.schema(src.schema).parquet(src_dir)
    with _state_partitions(spark, 8):
        out = kalman_filtered(stream)
        name = "kalman_sink_" + os.path.basename(src_dir)[-8:]
        _run_available_now(
            out.writeStream.format("memory")
            .queryName(name)
            .outputMode("append")
            .option(
                "checkpointLocation",
                scratch_dir(prefix="rugpull_kalman_ckpt_"),
            )
        )
    return (
        spark.table(name)
        .select(
            "event_type",
            "ts_epoch",
            F.round("filtered", 6).alias("filtered"),
            F.round("innovation", 6).alias("innovation"),
        )
        .orderBy("event_type", "ts_epoch", "filtered", "innovation")
    )


_CONSOLE_HEAD10_ORACLE = """
SELECT ts, event_id, user_id, event_type, value
FROM (SELECT * FROM events ORDER BY ts, event_id LIMIT 10) t
ORDER BY ts, event_id
"""


@register(
    "console_head10",
    oracle=_CONSOLE_HEAD10_ORACLE,
    tags=("sink", "console"),
    doc="S11 console sink as a driver-verifiable shape: the reference "
    "pretty-prints each chunk's FIRST 10 rows of a fixed projection "
    "(SERVER/flightWithRedis.py:101-121, print_df.head(10)). The Spark "
    "twin is sources/io.py:show_chunk (df.show(n, truncate=False)); the "
    "printable content is exactly this deterministic limit-10 projection "
    "— ordered on (ts, event_id) so the head is total-ordered and "
    "engine-independent. LIMIT is driver-side after a top-k sort "
    "(TakeOrderedAndProject), so at 100 TB only k rows ever leave the "
    "executors.",
)
def console_head10(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _events_src(spark, sf_dir, ["ts", "event_id", "user_id", "event_type", "value"])
        .orderBy("ts", "event_id")
        .limit(10)
    )


# ---------------------------------------------------------------------------
# End-to-end streaming composition of the reference pipeline (SURVEY §3.1)
# ---------------------------------------------------------------------------


@register(
    "stream_flagship_e2e_replay",
    oracle=None,  # set below: the BATCH flagship's oracle, verbatim
    tags=("streaming", "flagship", "e2e"),
    doc="The reference's WHOLE §3.1 pipeline as ONE streaming job under one "
    "checkpoint — every stage previously verified alone (ST1 pacing, J1 "
    "watchlist semi-join, A1 conditional agg, ST4 keyed state, ST5 "
    "stream-static refresh, S9 keyed sink) now composed: a 4-slice paced "
    "landing-zone replay of lineitem (the getBlock firehose analogue, "
    "RECEIVER/main.cpp poll loop) -> broadcast watchlist semi-join INSIDE "
    "the stream (stage2_processing.cpp:358-364) -> UPDATE-mode streaming "
    "aggregation keyed (suppkey,partkey) with decimal conditional sums "
    "(state is O(watchlisted pairs), the Redis-hash shape, common.h:84-86) "
    "-> foreachBatch enriches each updated key against the per-batch "
    "re-read dims (name + USD price, flightWithRedisLatest.py:92-112) and "
    "last-writer-wins-upserts into a keyed parquet dimension (the Redis "
    "HSET sink). The final sink state must equal the BATCH flagship's "
    "answer row-for-row — the same FLAGSHIP_ORACLE SQL grades both, "
    "proving batch/stream unification on the flagship path. Update-mode "
    "rows carry cumulative aggregates, so the LWW merge on the "
    "monotonically increasing n_moves is batch-boundary independent; at "
    "100 TB the landing zone is the real object-store prefix and "
    "maxFilesPerTrigger bounds per-trigger work (ST2).",
)
def stream_flagship_e2e_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _flagship_e2e(spark, sf_dir, n_slices=4)


def _flagship_e2e(
    spark: SparkSession, sf_dir: str, n_slices: int, restart_after: int | None = None
) -> DataFrame:
    """Core of stream_flagship_e2e_replay, parameterized so tests can prove
    two composition-level guarantees:

    - batch-boundary independence (``n_slices``): ANY slicing must converge
      to the identical sink state — the update-mode aggregates are
      cumulative and the LWW merge keys on the strictly-increasing n_moves;
    - checkpointed recovery (``restart_after=k``, ST6 composed): only the
      first k slices land, the stream runs to completion and STOPS; the
      remaining slices land and a SECOND stream starts from the SAME
      checkpoint — it must restore the keyed aggregation state and process
      only the new files (any replay double-counts n_moves, any loss drops
      it), converging to the same answer as the uninterrupted run."""
    from ..sources.io import upsert_dimension

    lineitem = _static_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_partkey", "l_returnflag",
        "l_quantity", "l_shipdate",
    )
    src_dir = scratch_dir(prefix="rugpull_flag_src_")
    first = n_slices if restart_after is None else restart_after
    landed: set[str] = set()
    _write_slices(lineitem, src_dir, n_slices, slice_col="l_orderkey",
                  indices=range(first), seen_files=landed)
    dim_dir = os.path.join(scratch_dir(prefix="rugpull_flag_out_"), "report")
    ckpt_dir = scratch_dir(prefix="rugpull_flag_ckpt_")

    # Watchlist: ASIA suppliers (the hot-address file, file_utils.cpp:3-36).
    watch = (
        _static_table(spark, sf_dir, "supplier")
        .join(
            F.broadcast(
                _static_table(spark, sf_dir, "nation")
                .join(
                    F.broadcast(
                        _static_table(spark, sf_dir, "region").where(
                            F.col("r_name") == "ASIA"
                        )
                    ),
                    F.col("n_regionkey") == F.col("r_regionkey"),
                )
                .select("n_nationkey")
            ),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey", "s_name")
        .localCheckpoint()
    )

    def run_stream() -> None:
        # Rebuilt per run: a restart constructs a FRESH query against the
        # same checkpoint, exactly how a recovered production job does.
        stream = (
            spark.readStream.schema(lineitem.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src_dir)
        )
        # J1 inside the stream: stream-static broadcast semi-join, then the
        # A1 conditional aggregation as UPDATE-mode keyed state.
        hot = stream.join(
            F.broadcast(watch.select("s_suppkey")),
            stream["l_suppkey"] == F.col("s_suppkey"),
            "left_semi",
        )
        agg = hot.groupBy("l_suppkey", "l_partkey").agg(
            F.expr(S.dsum("case when l_returnflag = 'R' then l_quantity end")).alias("pre_qty"),
            F.expr(S.dsum("case when l_returnflag <> 'R' then l_quantity end")).alias("post_qty"),
            F.count(F.lit(1)).alias("n_moves"),
            F.max("l_shipdate").alias("last_ship_ts"),
        )
        with _state_partitions(spark, 8):
            _run_available_now(
                agg.writeStream.outputMode("update")
                .foreachBatch(apply)
                .option("checkpointLocation", ckpt_dir)
            )

    # Decide the per-batch part source ONCE, on the OUTER session (see
    # _views_valid: calling _static_table on the batch session corrupts
    # stateful micro-batch execution). View-first keeps the sweep's input
    # substitution reaching the stream; the fallback DataFrame is built
    # here but re-reads its parquet at every batch action, so ST5's
    # per-batch re-resolution holds either way.
    part_dim = (
        None
        if _views_valid(spark, sf_dir, "part")
        else load_tables(spark, sf_dir, ("part",))["part"]
    )

    def apply(batch: DataFrame, _bid: int) -> None:
        sp = batch.sparkSession
        # ST5: dims re-resolved per micro-batch (the server re-reads Redis
        # per request); enrichment rides the updated keys only.
        enriched = (
            batch.join(
                F.broadcast(
                    (sp.table("part") if part_dim is None else part_dim).select(
                        "p_partkey", "p_retailprice"
                    )
                ),
                batch["l_partkey"] == F.col("p_partkey"),
                "left",
            )
            .join(F.broadcast(watch), batch["l_suppkey"] == watch["s_suppkey"])
            .select(
                F.col("l_suppkey").alias("suppkey"),
                F.col("l_partkey").alias("partkey"),
                F.col("s_name").alias("supplier_name"),
                "pre_qty", "post_qty", "n_moves",
                F.expr(S.fmt_date("last_ship_ts")).alias("last_ship_day"),
                F.col("p_retailprice").alias("usd_price"),
            )
        )
        upsert_dimension(
            sp, enriched, dim_dir, ["suppkey", "partkey"], order_by=["n_moves"]
        )

    run_stream()
    if restart_after is not None:
        # The rest of the corpus lands while the job is DOWN; the restart
        # must resume from checkpointed state, not from scratch.
        _write_slices(lineitem, src_dir, n_slices, slice_col="l_orderkey",
                      indices=range(first, n_slices), seen_files=landed)
        run_stream()
    return spark.read.parquet(dim_dir).select(
        "suppkey", "partkey", "supplier_name", "pre_qty", "post_qty",
        "n_moves", "last_ship_day", "usd_price",
    )


def _set_flagship_stream_oracle() -> None:
    # One SQL grades both engines AND both execution modes: the streaming
    # composition's sink must hash-match the batch flagship's oracle.
    from .relational import FLAGSHIP_ORACLE

    _REGISTRY["stream_flagship_e2e_replay"].oracle = FLAGSHIP_ORACLE


from .registry import _REGISTRY  # noqa: E402


# ---------------------------------------------------------------------------
# End-to-end streaming compositions of §3.2 (pool detection), §3.3 (price
# maintenance), the ST7 fan-out of both pipelines off ONE landing zone, and
# the §3.2→§3.1 watchlist feedback loop — the reference's full runtime
# topology (round-7 verdict items 3 and 4).
# ---------------------------------------------------------------------------


def _tx_stream(spark: SparkSession, src_glob: str) -> DataFrame:
    """Streaming per-transaction rows from a block-JSON landing zone: the
    in-stream twin of domain._read_blocks + the P3/P4/P5 projections —
    schema-pruned from_json, transaction explode, continuous key indexing
    (accountKeys ‖ readonly ‖ writable), log join. Shared by the composed
    §3.2 / fan-out / feedback jobs."""
    from ..operators.balance import parse_blocks

    raw = (
        spark.readStream.option("maxFilesPerTrigger", 1)
        .text(src_glob)
    )
    blocks = parse_blocks(raw, "value")
    return blocks.select(
        F.col("blockTime").alias("block_time"),
        F.explode("transactions").alias("t"),
    ).select(
        F.col("t.transaction.signatures")[0].alias("signature"),
        F.col("block_time"),
        F.concat(
            F.coalesce(F.col("t.transaction.message.accountKeys"), F.array()),
            F.coalesce(F.col("t.meta.loadedAddresses.readonly"), F.array()),
            F.coalesce(F.col("t.meta.loadedAddresses.writable"), F.array()),
        ).alias("all_keys"),
        F.array_join(F.col("t.meta.logMessages"), " ").alias("logs"),
    )


def _pool_rows(tx: DataFrame, min_bt: int, hot_arr) -> DataFrame:
    """P8 instruction-log regex + P9 recency + key-stat projection — the
    pool-detection predicate chain (SERVER/combined_subscriber.py:120-147,
    62-65) applied INSIDE the stream."""
    return tx.where(
        F.col("logs").rlike(r"Instruction: initialize2\b")
        & (F.col("block_time") >= F.lit(min_bt))
    ).select(
        "signature",
        F.col("block_time").cast("long").alias("ts_epoch"),
        F.size("all_keys").cast("long").alias("n_keys"),
        F.size(F.array_intersect(F.col("all_keys"), hot_arr))
        .cast("long")
        .alias("n_hot_keys"),
    )


def _pool_e2e_oracle() -> str:
    from .domain import _N_BLOCKS, _duck_tx_cte, _hot_literal

    min_bt = 1_700_000_000 + (_N_BLOCKS - 8) * 400
    return f"""
    WITH {_duck_tx_cte()}
    SELECT signature,
        cast(block_time as bigint) AS ts_epoch,
        len(all_keys) AS n_keys,
        len(list_intersect(all_keys, {_hot_literal(DUCK)})) AS n_hot_keys,
        cast(cast(('0x' || substring(md5(signature), 1, 15)) as bigint)
            % 10000 as double) / 100.0 AS pool_price
    FROM keyed
    WHERE regexp_matches(logs, 'Instruction: initialize2\\b')
      AND block_time >= {min_bt}
    ORDER BY signature
    """


@register(
    "stream_pool_detect_e2e",
    oracle=_pool_e2e_oracle(),
    tags=("streaming", "e2e", "domain"),
    doc="The reference's WHOLE §3.2 pool-detection chain as ONE "
    "checkpointed streaming job: paced block-JSON replay "
    "(maxFilesPerTrigger=1, the subscriber poll cadence) -> in-stream P8 "
    "initialize2 log filter + P9 recency predicate "
    "(SERVER/combined_subscriber.py:120-147,62-65) -> S8 batched "
    "external lookup inside foreachBatch (mapInPandas, deterministic "
    "md5-derived price the oracle recomputes in SQL, :46-118) -> S9 "
    "keyed last-writer-wins upsert into the pools dimension (:86-98). "
    "Graded by the batch solana_pool_detection oracle extended with the "
    "lookup column — batch/stream unification on the §3.2 path. The "
    "signature-keyed upsert is batch-boundary independent; at 100 TB "
    "the landing zone is the object-store prefix and the dim is the "
    "lakehouse MERGE target.",
)
def stream_pool_detect_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.udfs import lookup_enrich
    from ..sources.io import upsert_dimension
    from .domain import _N_BLOCKS, _ensure_blocks, _hot_literal

    path = _ensure_blocks()
    min_bt = 1_700_000_000 + (_N_BLOCKS - 8) * 400
    pools = _pool_rows(
        _tx_stream(spark, f"{path}/blocks_*.json"), min_bt, F.expr(_hot_literal(SPARK))
    )
    dim_dir = os.path.join(scratch_dir(prefix="rugpull_poold_out_"), "pools")
    ckpt = scratch_dir(prefix="rugpull_poold_ckpt_")

    def apply(batch: DataFrame, _bid: int) -> None:
        def fetch(keys: list[str]) -> dict[str, dict]:
            return {k: {"pool_price": _fake_pool_price(k)} for k in keys}

        enriched = lookup_enrich(
            batch, "signature", fetch, "pool_price double", batch_size=16
        )
        upsert_dimension(
            batch.sparkSession, enriched, dim_dir, ["signature"],
            order_by=["ts_epoch"],
        )

    _run_available_now(
        pools.writeStream.outputMode("append")
        .foreachBatch(apply)
        .option("checkpointLocation", ckpt)
    )
    if not os.path.isdir(dim_dir):
        # Zero matching blocks -> no upsert ever ran -> no dim directory;
        # an unguarded read raised AnalysisException (round-9 ADVICE).
        return spark.createDataFrame(
            [],
            "signature string, ts_epoch bigint, n_keys bigint, "
            "n_hot_keys bigint, pool_price double",
        )
    return spark.read.parquet(dim_dir).select(
        "signature", "ts_epoch", "n_keys", "n_hot_keys", "pool_price"
    ).orderBy("signature")


def _price_maint_oracle() -> str:
    from .domain import _PRICE_CHANGE_ORACLE

    return f"""
    WITH em AS (SELECT * FROM ({_PRICE_CHANGE_ORACLE}) t),
    last AS (
        SELECT pair, ts_epoch, base_price, quote_price,
            row_number() OVER (PARTITION BY pair
                ORDER BY ts_epoch DESC, base_price DESC, quote_price DESC) AS rn
        FROM em
    )
    SELECT 'vault-' || substring(md5(pair), 1, 8) AS vault,
        pair, ts_epoch, base_price, quote_price
    FROM last WHERE rn = 1 ORDER BY pair
    """


@register(
    "stream_price_maint_e2e",
    oracle=_price_maint_oracle(),
    tags=("streaming", "e2e", "stateful"),
    doc="The reference's WHOLE §3.3 price-maintenance chain as ONE "
    "checkpointed streaming job: a time-sliced paced price replay (S7, "
    "SERVER/priceAPIfiller.py:25-98) -> P11 10%%-vs-last-EMITTED "
    "threshold fold as keyed state (applyInPandasWithState, "
    "ingest_prices.py:42-55) -> J4 pair->vault broadcast equi-join "
    "(redis_map_editor.py:51-72, deterministic md5-derived dim) -> A4 "
    "last-value-per-key LWW upsert into the price dimension (the Redis "
    "HSET, priceAPIfiller.py:77-82). Slices are contiguous TIME ranges "
    "paced one file per trigger, so the cross-batch fold order equals "
    "the oracle's global (ts, event_id) walk; the LWW merge orders by "
    "the full (ts, base, quote) tuple, making tied-timestamp emissions "
    "batch-boundary safe. Graded by the recursive-CTE fold walk + "
    "arg-max-per-key oracle — batch/stream unification on the §3.3 path.",
)
def stream_price_maint_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _price_maint_e2e(spark, sf_dir)


@register(
    "stream_price_maint_tws",
    oracle=_price_maint_oracle(),
    tags=("streaming", "e2e", "stateful", "tws"),
    doc="The SAME composed §3.3 price-maintenance chain as "
    "stream_price_maint_e2e, with the P11 keyed fold running on the "
    "modern Spark 4 StatefulProcessor API (transformWithStateInPandas + "
    "RocksDB state store) instead of applyInPandasWithState — typed "
    "ValueState holding the last-EMITTED (base, quote) per pair "
    "(SERVER/ingest_prices.py:42-55). Graded by the IDENTICAL "
    "recursive-CTE fold + arg-max-per-key oracle, so the two stateful "
    "APIs are pinned to one semantics by the driver itself. Runs "
    "without the real protobuf package: the TWS state-server protocol "
    "is carried by the vendored pure-Python miniproto runtime "
    "(_vendor/miniproto, public wire format only).",
)
def stream_price_maint_tws(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _price_maint_e2e(spark, sf_dir, kernel="tws")


@contextmanager
def _rocksdb_state(spark: SparkSession):
    """Scope the RocksDB state-store provider (required by
    transformWithStateInPandas) to one streaming run, restoring the
    session's previous provider afterwards."""
    key = "spark.sql.streaming.stateStore.providerClass"
    try:
        prev = spark.conf.get(key)
    except Exception:  # noqa: BLE001 - unset -> restore by unsetting
        prev = None
    spark.conf.set(
        key,
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider",
    )
    try:
        yield
    finally:
        if prev is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, prev)


def _price_maint_e2e(
    spark: SparkSession,
    sf_dir: str,
    restart_after: int | None = None,
    kernel: str = "apips",
) -> DataFrame:
    """Core of stream_price_maint_e2e, parameterized so tests can prove the
    composed ST6 recovery contract for KEYED CUSTOM STATE: with
    ``restart_after=k`` only the first k time slices land, the stream runs
    to completion and stops; the later slices land while the job is down;
    a fresh query restarts from the SAME checkpoint and must restore every
    pair's last-EMITTED (base, quote) fold state — a lost state re-anchors
    the 10%% threshold chain and emits a different event set, a replayed
    slice emits duplicates — converging to the identical price dimension
    as the uninterrupted run."""
    from ..sources.io import upsert_dimension
    from ..streaming.pipelines import price_change_events, price_change_events_tws

    fold = price_change_events if kernel == "apips" else price_change_events_tws

    ev = _events_table(spark, sf_dir)
    prices = ev.select(
        F.concat(F.lit("pair-"), (F.col("user_id") % 5).cast("string")).alias("pair"),
        "ts",
        "event_id",
        (F.col("value") + F.lit(1.0)).alias("base_price"),
        (F.col("value") / F.lit(1.5) + F.lit(1.0)).alias("quote_price"),
    )
    # Land the replay as 4 CONTIGUOUS TIME slices (the priceAPIfiller's
    # chronological poll order): the stateful fold's cross-batch order
    # must equal event-time order for the oracle's global walk to grade it.
    src_dir = scratch_dir(prefix="rugpull_pmaint_src_")
    bounds = prices.agg(
        F.min(F.unix_timestamp("ts")).alias("lo"),
        F.max(F.unix_timestamp("ts")).alias("hi"),
    ).first()
    lo, hi = (bounds["lo"] or 0), (bounds["hi"] or 0)
    n_slices = 4
    step = max(1, (hi - lo) // n_slices + 1)
    slice_col = F.least(
        F.lit(n_slices - 1), ((F.unix_timestamp("ts") - F.lit(lo)) / F.lit(step))
        .cast("long"),
    )
    staged = prices.withColumn("slice", slice_col)

    landed: set[str] = set()

    def land(indices: range) -> None:
        for i in indices:
            (
                staged.where(F.col("slice") == i)
                .drop("slice")
                .coalesce(1)
                .write.mode("append")
                .parquet(src_dir)
            )
            # Distinct increasing mtimes per slice: the fold's cross-batch
            # order must equal event-time order, and FileStreamSource
            # breaks mtime ties arbitrarily (round-9 ADVICE).
            _stamp_slice_mtimes(src_dir, landed, i)

    first = n_slices if restart_after is None else restart_after
    land(range(first))
    vault_dim = (
        prices.select("pair")
        .distinct()
        .select(
            "pair",
            F.concat(F.lit("vault-"), F.substring(F.md5("pair"), 1, 8)).alias("vault"),
        )
        .localCheckpoint()
    )
    dim_dir = os.path.join(scratch_dir(prefix="rugpull_pmaint_out_"), "prices")
    ckpt = scratch_dir(prefix="rugpull_pmaint_ckpt_")

    def apply(batch: DataFrame, _bid: int) -> None:
        rows = (
            batch.join(F.broadcast(vault_dim), "pair")
            .select(
                "vault", "pair",
                F.unix_timestamp("ts").alias("ts_epoch"),
                "base_price", "quote_price",
            )
        )
        upsert_dimension(
            batch.sparkSession, rows, dim_dir, ["vault"],
            order_by=["ts_epoch", "base_price", "quote_price"],
        )

    def run_stream() -> None:
        # Rebuilt per run: a restart constructs a FRESH query against the
        # same checkpoint, exactly how a recovered production job does.
        stream = (
            spark.readStream.schema(prices.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src_dir)
        )
        emitted = fold(stream)
        with ExitStack() as scopes:
            scopes.enter_context(_state_partitions(spark, 8))
            if kernel == "tws":
                scopes.enter_context(_rocksdb_state(spark))
            _run_available_now(
                emitted.writeStream.outputMode("append")
                .foreachBatch(apply)
                .option("checkpointLocation", ckpt)
            )

    run_stream()
    if restart_after is not None:
        # The rest of the price history lands while the job is DOWN; the
        # restart must resume from the checkpointed per-pair fold state.
        land(range(first, n_slices))
        run_stream()
    if not os.path.isdir(dim_dir):
        return spark.createDataFrame(
            [], "vault string, pair string, ts_epoch bigint, "
            "base_price double, quote_price double",
        )
    return spark.read.parquet(dim_dir).select(
        "vault", "pair", "ts_epoch", "base_price", "quote_price"
    ).orderBy("pair")


def _fanout_oracle() -> str:
    from .domain import _balance_oracle

    return f"""
    WITH bal AS (SELECT * FROM ({_balance_oracle()}) t),
    pool AS (SELECT * FROM ({_pool_e2e_oracle()}) t)
    SELECT 'balance' AS sink, signature,
        wallet || '|' || mint AS subkey, post_balance AS val, ts_epoch
    FROM bal
    UNION ALL
    SELECT 'pool' AS sink, signature, '' AS subkey,
        cast(n_keys as varchar) || '/' || cast(n_hot_keys as varchar) AS val,
        ts_epoch
    FROM pool
    ORDER BY sink, signature, subkey
    """


@register(
    "stream_fanout_composed",
    oracle=_fanout_oracle(),
    tags=("streaming", "e2e", "fanout"),
    doc="ST7 fan-out of the TWO composed pipelines off ONE landing zone "
    "(SERVER/combined_subscriber.py:200-227: each fetched block feeds "
    "BOTH the §3.1 balance extraction and the §3.2 pool detector): two "
    "concurrent checkpointed streaming queries consume the same block "
    "prefix — the §3.1 chain (per-batch watchlist refresh -> balance "
    "extraction -> append sink) and the §3.2 chain (P8/P9 in-stream -> "
    "S9 keyed upsert) — started together and drained together. Both "
    "sinks are graded at once against the UNION of the two batch "
    "oracles, proving neither subscriber starves or double-reads the "
    "shared feed.",
)
def stream_fanout_composed(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..sources.io import upsert_dimension
    from ..streaming.pipelines import stream_balance_pipeline
    from .domain import _N_BLOCKS, _ensure_blocks, _hot_literal
    from ..sources.solana import hot_addresses

    blocks_dir = _ensure_blocks()
    watch_dir = os.path.join(blocks_dir, "watch_dim")
    if not os.path.isdir(watch_dir):
        spark.createDataFrame(
            [(a,) for a in hot_addresses()], "address string"
        ).write.mode("overwrite").parquet(watch_dir)

    bal_dir = scratch_dir(prefix="rugpull_fan_bal_")
    pool_dir = os.path.join(scratch_dir(prefix="rugpull_fan_pool_"), "pools")

    def bal_sink(df: DataFrame, _epoch: int) -> None:
        df.write.mode("append").parquet(bal_dir)

    # Subscriber 1: the §3.1 balance pipeline (stream-static watch refresh
    # per micro-batch, ST5).
    q1 = stream_balance_pipeline(
        spark,
        blocks_dir,
        watch_dir,
        bal_sink,
        max_files_per_trigger=1,
        checkpoint_dir=scratch_dir(prefix="rugpull_fan_ckpt1_"),
    )
    # Subscriber 2: the §3.2 pool detector over the SAME landing zone,
    # its own checkpoint — started while subscriber 1 is running.
    min_bt = 1_700_000_000 + (_N_BLOCKS - 8) * 400
    pools = _pool_rows(
        _tx_stream(spark, f"{blocks_dir}/blocks_*.json"),
        min_bt,
        F.expr(_hot_literal(SPARK)),
    )

    def pool_apply(batch: DataFrame, _bid: int) -> None:
        upsert_dimension(
            batch.sparkSession, batch, pool_dir, ["signature"],
            order_by=["ts_epoch"],
        )

    q2 = (
        pools.writeStream.outputMode("append")
        .foreachBatch(pool_apply)
        .option("checkpointLocation", scratch_dir(prefix="rugpull_fan_ckpt2_"))
        .trigger(availableNow=True)
        .start()
    )
    q1.processAllAvailable()
    q1.stop()
    # awaitTermination(timeout) returns False while the query is STILL
    # RUNNING — a hung pool branch must fail loudly, not grade a
    # truncated fanout result (round-9 verdict residue; the same guard
    # _run_available_now grew in commit 422b4ea).
    if not q2.awaitTermination(300):
        q2.stop()
        raise TimeoutError(
            "fanout pool branch still running after 300 s (availableNow)"
        )

    bal = spark.read.parquet(bal_dir).select(
        F.lit("balance").alias("sink"),
        "signature",
        F.concat(F.col("wallet"), F.lit("|"), F.col("mint")).alias("subkey"),
        F.col("post_balance").alias("val"),
        F.unix_timestamp("ts").alias("ts_epoch"),
    )
    poo = spark.read.parquet(pool_dir).select(
        F.lit("pool").alias("sink"),
        "signature",
        F.lit("").alias("subkey"),
        F.concat(
            F.col("n_keys").cast("string"), F.lit("/"),
            F.col("n_hot_keys").cast("string"),
        ).alias("val"),
        "ts_epoch",
    )
    return bal.unionByName(poo).orderBy("sink", "signature", "subkey")


_FEEDBACK_SLICES = 4


def _feedback_oracle() -> str:
    from .domain import _N_BLOCKS, _duck_tx_cte

    per_slice = _N_BLOCKS // _FEEDBACK_SLICES
    return f"""
    WITH {_duck_tx_cte()},
    sl AS (
        SELECT signature, cast(block_time as bigint) AS ts_epoch, all_keys, logs,
            (cast(block_time as bigint) - 1700000000) // 400 // {per_slice} AS slice
        FROM keyed
    ),
    pool_keys AS (
        SELECT k, min(slice) AS first_slice
        FROM (SELECT slice, unnest(all_keys) AS k FROM sl
              WHERE regexp_matches(logs, 'Instruction: initialize2\\b')) t
        GROUP BY k
    ),
    tx_keys AS (SELECT signature, slice, unnest(all_keys) AS k FROM sl),
    hits AS (
        SELECT DISTINCT t.signature
        FROM tx_keys t JOIN pool_keys p
            ON p.k = t.k AND p.first_slice < t.slice
    )
    SELECT s.signature, s.ts_epoch, cast(s.slice as bigint) AS slice,
        CASE WHEN h.signature IS NOT NULL THEN 1 ELSE 0 END AS tagged
    FROM sl s LEFT JOIN hits h ON h.signature = s.signature
    ORDER BY s.signature
    """


@register(
    "stream_watchlist_feedback",
    oracle=_feedback_oracle(),
    tags=("streaming", "e2e", "feedback"),
    doc="The §3.2→§3.1 feedback loop: the pool detector WRITES the "
    "watchlist the flagship READS (combined_subscriber.py:86-98 -> "
    "flightWithRedis.py:81-84). One checkpointed streaming job over a "
    "TIME-CHUNKED block landing zone (slice i = blocks [10i,10i+10), "
    "paced one file per trigger): each micro-batch first TAGS its "
    "transactions against the watchlist dimension as of batch start "
    "(the ST5 per-batch dim re-read), then upserts the keys of pools it "
    "discovered — so a pool discovered in micro-batch N tags "
    "transactions from micro-batch N+1 on, never its own batch. The "
    "oracle restates that visibility rule in EVENT TIME (a key tags "
    "strictly-later slices), which the time-aligned pacing makes "
    "equivalent — the update-visibility contract, previously tested "
    "only with hand-written dims, now graded end-to-end.",
)
def stream_watchlist_feedback(spark: SparkSession, sf_dir: str) -> DataFrame:
    import json as _json

    from ..sources.io import upsert_dimension
    from ..sources.solana import generate_blocks
    from .domain import _N_BLOCKS, _SEED

    per_slice = _N_BLOCKS // _FEEDBACK_SLICES
    # Time-chunked landing zone: slice i holds blocks [i*k, (i+1)*k), files
    # written in slice order so the paced file stream replays event time.
    src_dir = scratch_dir(prefix="rugpull_fb_src_")
    blocks = generate_blocks(_N_BLOCKS, _SEED)
    for i in range(_FEEDBACK_SLICES):
        with open(os.path.join(src_dir, f"blocks_{i:02d}.json"), "w") as fh:
            for blk in blocks[i * per_slice:(i + 1) * per_slice]:
                fh.write(_json.dumps(blk, separators=(",", ":")) + "\n")
    tx = _tx_stream(spark, f"{src_dir}/blocks_*.json").select(
        "signature",
        F.col("block_time").cast("long").alias("ts_epoch"),
        "all_keys",
        "logs",
        (
            ((F.col("block_time").cast("long") - F.lit(1_700_000_000)) / F.lit(400))
            .cast("long")
            / F.lit(per_slice)
        ).cast("long").alias("slice"),
    )
    dim_dir = os.path.join(scratch_dir(prefix="rugpull_fb_dim_"), "watch")
    out_dir = scratch_dir(prefix="rugpull_fb_out_")
    ckpt = scratch_dir(prefix="rugpull_fb_ckpt_")

    def apply(batch: DataFrame, _bid: int) -> None:
        sp = batch.sparkSession
        batch = batch.localCheckpoint()
        # 1) TAG against the watchlist as of batch START (pools found in
        # THIS batch must not tag it — batch-N+1 visibility).
        if os.path.isdir(dim_dir):
            watch = F.broadcast(sp.read.parquet(dim_dir).select("k"))
            hits = (
                batch.select("signature", F.explode("all_keys").alias("k"))
                .join(watch, "k")
                .select("signature")
                .distinct()
                .withColumn("hit", F.lit(1))
            )
            tagged = batch.join(hits, "signature", "left").select(
                "signature", "ts_epoch", "slice",
                F.coalesce(F.col("hit"), F.lit(0)).alias("tagged"),
            )
        else:
            tagged = batch.select(
                "signature", "ts_epoch", "slice", F.lit(0).alias("tagged")
            )
        tagged.write.mode("append").parquet(out_dir)
        # 2) DETECT pools in this batch and upsert their key set into the
        # watchlist dimension (SADD semantics; first_slice kept via the
        # negated-order LWW so re-discovery never advances it).
        pool_keys = (
            batch.where(F.col("logs").rlike(r"Instruction: initialize2\b"))
            .select(F.explode("all_keys").alias("k"), "slice")
            .groupBy("k")
            .agg(F.min("slice").alias("first_slice"))
            .withColumn("neg_slice", -F.col("first_slice"))
        )
        upsert_dimension(sp, pool_keys, dim_dir, ["k"], order_by=["neg_slice"])

    _run_available_now(
        tx.writeStream.outputMode("append")
        .foreachBatch(apply)
        .option("checkpointLocation", ckpt)
    )
    return spark.read.parquet(out_dir).select(
        "signature", "ts_epoch", "slice", "tagged"
    ).orderBy("signature")

_set_flagship_stream_oracle()
