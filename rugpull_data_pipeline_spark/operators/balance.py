"""The flagship extraction chain: raw block JSON → balance-change relation.

Spark-first restatement of the reference's engine core (SURVEY.md §3.1):

    SIMD structural index + skip-map + FSM extractors     → schema-pruned from_json
    (RECEIVER/stage1_simd.cpp:17-130,
     stage2_processing.cpp:15-33,192-251)
    hot-address xxHash semi-join filter (J1, :358-364)    → arrays_overlap vs broadcast watchlist
    index→address map + owner replacement (J2, :366-389,  → element_at on the concatenated key
     applied :160-167)                                      array + coalesce precedence
    per-(owner,mint) pre/post hash agg (A1, :149-174)     → groupBy(wallet, mint) conditional agg
    blockTime stamping (W1, file_utils.cpp:68-88)         → to_timestamp(from_unixtime(blockTime))

Output matches the reference's one output relation: all-utf8
{wallet, signature, mint, pre_balance, post_balance} + ts
(RECEIVER/stage2_processing.cpp:254-262; SERVER/server.py:44-73). Balances
stay decimal *strings* end-to-end exactly like the reference (parsed to
DecimalType only in math contexts) — crypto amounts exceed double precision.

Scale design: the only wide operation is the final groupBy on
(signature, wallet, mint) — partial aggregation runs map-side; the watchlist
is broadcast (it is small by construction, like the reference's per-thread
hash set); everything else is narrow (explode/filter/project) and fuses into
one whole-stage-codegen span per stage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..schemas import SOLANA_BLOCK


def parse_blocks(raw: DataFrame, payload_col: str = "value") -> DataFrame:
    """Raw JSON payload strings → typed block rows (tight, nested-pruned
    schema: only the five arrays the reference materializes are declared).

    For payloads that are already a DataFrame column (streaming micro-batches,
    the custom DataSource) this is the only option. For block FILES prefer
    ``read_blocks``: ``from_json`` is a scalar expression, so every optimizer
    rule that collapses projections or infers generator filters duplicates
    the full parse per consumer expression (measured: 2-4 Jackson passes per
    row on the extraction chain), while the JSON datasource parses each line
    exactly once at the scan."""
    return raw.select(
        F.from_json(F.col(payload_col), SOLANA_BLOCK).alias("block")
    ).select("block.result.*")


def _drop_tx_meta_field(name: str) -> T.StructType:
    """SOLANA_BLOCK with ``transactions[].meta.<name>`` removed — a manually
    pruned scan schema. The JSON datasource only prunes TOP-LEVEL columns
    (nested-schema pruning is parquet/ORC-level), so consumers that never
    touch a heavy nested field must not declare it to the scan."""
    tx_struct: T.StructType = SOLANA_BLOCK["result"].dataType["transactions"].dataType.elementType
    meta: T.StructType = tx_struct["meta"].dataType
    # A renamed field must fail loudly: silently keeping the heavy field
    # would quietly regress the pruned-scan optimization (round-12 ADVICE).
    assert name in meta.fieldNames(), f"{name!r} not in meta: {meta.fieldNames()}"
    meta_pruned = T.StructType([f for f in meta.fields if f.name != name])
    tx_pruned = T.StructType(
        [f if f.name != "meta" else T.StructField("meta", meta_pruned) for f in tx_struct.fields]
    )
    result: T.StructType = SOLANA_BLOCK["result"].dataType
    result_pruned = T.StructType(
        [
            f
            if f.name != "transactions"
            else T.StructField("transactions", T.ArrayType(tx_pruned))
            for f in result.fields
        ]
    )
    return T.StructType([T.StructField("result", result_pruned)])


# The balance-extraction chain never reads logMessages; keeping it out of the
# declared scan schema saves materializing the two log strings per tx.
_BALANCE_BLOCK = _drop_tx_meta_field("logMessages")


def read_blocks(
    spark: SparkSession, path_glob: str, with_logs: bool = False
) -> DataFrame:
    """Block FILES → typed block rows via the JSON datasource: one Jackson
    pass per line materializes the (manually pruned) schema at the scan.

    The previous ``spark.read.text + from_json`` shape re-evaluated the parse
    in every expression the optimizer collapsed it into — the inferred
    generator filter (``size(transactions) > 0 AND isnotnull``) plus the
    collapsed projection each carried their own ``from_json``, so the chain
    paid 2-4 full parses per row. ``with_logs=True`` keeps logMessages for
    the instruction-log consumers (P8)."""
    schema = SOLANA_BLOCK if with_logs else _BALANCE_BLOCK
    return spark.read.schema(schema).json(path_glob).select("result.*")


def extract_balance_changes(
    blocks: DataFrame, watchlist: DataFrame, prefilter: bool = True
) -> DataFrame:
    """Typed block rows (result.*) + watchlist(address) → balance changes.

    ``prefilter=True`` keeps the reference's cheap-check-before-parse shape
    (SURVEY.md §4): transactions are dropped by the broadcast semi-join
    *before* token-balance explosion pays for itself.
    """
    watch_arr = F.broadcast(
        watchlist.select(F.collect_set("address").alias("watch"))
    )

    tx = (
        blocks.select(
            F.to_timestamp(F.from_unixtime(F.col("blockTime"))).alias("ts"),
            F.explode("transactions").alias("tx"),
        )
        # One concatenated key sequence with continuous indexing — exactly the
        # reference's accountKeys‖readonly‖writable traversal order is
        # accountKeys‖writable‖readonly in v1 and accountKeys‖readonly‖writable
        # in v2; we follow stage2_processing.cpp:366-389 (keys, readonly,
        # writable via loadedAddresses order).
        .select(
            "ts",
            F.col("tx.transaction.signatures")[0].alias("signature"),
            F.concat(
                F.coalesce(F.col("tx.transaction.message.accountKeys"), F.array()),
                F.coalesce(F.col("tx.meta.loadedAddresses.readonly"), F.array()),
                F.coalesce(F.col("tx.meta.loadedAddresses.writable"), F.array()),
            ).alias("all_keys"),
            F.col("tx.meta.preTokenBalances").alias("pre"),
            F.col("tx.meta.postTokenBalances").alias("post"),
        )
    )

    # J1: hot-transaction semi-join — keep the tx iff any key is watchlisted
    # (RECEIVER/stage2_processing.cpp:358-364). Broadcast + arrays_overlap:
    # no shuffle, evaluated before any balance parsing.
    if prefilter:
        tx = tx.crossJoin(watch_arr).where(
            F.arrays_overlap(F.col("all_keys"), F.col("watch"))
        )
    else:
        tx = tx.crossJoin(watch_arr)

    # Explode pre and post balance arrays with a phase tag (the two passes of
    # stage2_processing.cpp:391-403) — fused into ONE generator: tag each
    # array element with its phase, concatenate, explode once. The earlier
    # union-of-two-explodes planned the whole scan+parse+semi-join subtree
    # TWICE (Spark plans each union branch independently), doubling the input
    # read — row set is identical (order differs; the groupBy below is
    # order-insensitive).
    def _tagged(col: str, tag: str):
        return F.transform(
            F.coalesce(F.col(col), F.array()),
            lambda b: F.struct(F.lit(tag).alias("phase"), b.alias("b")),
        )

    entries = (
        tx.select(
            "ts",
            "signature",
            "all_keys",
            "watch",
            F.explode(
                F.concat(_tagged("pre", "pre"), _tagged("post", "post"))
            ).alias("e"),
        )
        .where(F.col("e.b").isNotNull())
        .select(
            "ts",
            "signature",
            "all_keys",
            "watch",
            F.col("e.phase").alias("phase"),
            F.col("e.b").alias("b"),
        )
    )

    # J2: owner replacement — if the address at this entry's accountIndex
    # (within the concatenated sequence) is watchlisted, it is the pool vault
    # and REPLACES the owner (stage2_processing.cpp:160-167 precedence).
    # try_element_at: ANSI mode (Spark 4 default) makes element_at THROW on
    # an out-of-range index; a malformed tx must yield null → owner kept.
    addr_at = F.try_element_at(F.col("all_keys"), F.col("b.accountIndex") + F.lit(1))
    entries = entries.select(
        "ts",
        "signature",
        "phase",
        F.when(F.array_contains(F.col("watch"), addr_at), addr_at)
        .otherwise(F.col("b.owner"))
        .alias("wallet"),
        F.col("b.mint").alias("mint"),
        F.col("b.uiTokenAmount.uiAmountString").alias("amount"),
    )

    # A1: per-(tx, wallet, mint) pre/post merge; emit iff either side present
    # (stage2_processing.cpp:399-401 — explode_outer already dropped txs with
    # no entries, and a row exists only when pre or post existed).
    out = (
        entries.groupBy("signature", "wallet", "mint")
        .agg(
            F.max(F.when(F.col("phase") == "pre", F.col("amount"))).alias("pre_balance"),
            F.max(F.when(F.col("phase") == "post", F.col("amount"))).alias("post_balance"),
            F.max("ts").alias("ts"),
        )
        .select("wallet", "signature", "mint", "pre_balance", "post_balance", "ts")
    )
    return out
