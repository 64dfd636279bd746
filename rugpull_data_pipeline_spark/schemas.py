"""Explicit schemas — nothing is ever inferred on a stream.

The Solana block schema is the tight, nested-pruned shape of the reference's
`getBlock` payload: only the five sub-arrays the reference engine materializes
(readonly, writable, accountKeys, pre/postTokenBalances — reference
``RECEIVER/common.h:40-46``, ``RECEIVER/stage2_processing.cpp:192-251``) are
declared, so Catalyst's nested-schema pruning skips everything else, the
declarative analogue of the reference's bracket skip-map
(``RECEIVER/stage2_processing.cpp:15-33``).
"""

from __future__ import annotations

from pyspark.sql import types as T

# --- testdata star schema (FIXTURES.md) -----------------------------------

REGION = T.StructType(
    [
        T.StructField("r_regionkey", T.IntegerType()),
        T.StructField("r_name", T.StringType()),
    ]
)

NATION = T.StructType(
    [
        T.StructField("n_nationkey", T.IntegerType()),
        T.StructField("n_name", T.StringType()),
        T.StructField("n_regionkey", T.IntegerType()),
    ]
)

CUSTOMER = T.StructType(
    [
        T.StructField("c_custkey", T.LongType()),
        T.StructField("c_name", T.StringType()),
        T.StructField("c_nationkey", T.IntegerType()),
        T.StructField("c_acctbal", T.DoubleType()),
        T.StructField("c_mktsegment", T.StringType()),
    ]
)

SUPPLIER = T.StructType(
    [
        T.StructField("s_suppkey", T.LongType()),
        T.StructField("s_name", T.StringType()),
        T.StructField("s_nationkey", T.IntegerType()),
        T.StructField("s_acctbal", T.DoubleType()),
    ]
)

PART = T.StructType(
    [
        T.StructField("p_partkey", T.LongType()),
        T.StructField("p_name", T.StringType()),
        T.StructField("p_brand", T.StringType()),
        T.StructField("p_type", T.StringType()),
        T.StructField("p_size", T.IntegerType()),
        T.StructField("p_retailprice", T.DoubleType()),
    ]
)

ORDERS = T.StructType(
    [
        T.StructField("o_orderkey", T.LongType()),
        T.StructField("o_custkey", T.LongType()),
        T.StructField("o_orderstatus", T.StringType()),
        T.StructField("o_totalprice", T.DoubleType()),
        T.StructField("o_orderdate", T.TimestampType()),
        T.StructField("o_orderpriority", T.StringType()),
    ]
)

LINEITEM = T.StructType(
    [
        T.StructField("l_orderkey", T.LongType()),
        T.StructField("l_partkey", T.LongType()),
        T.StructField("l_suppkey", T.LongType()),
        T.StructField("l_linenumber", T.IntegerType()),
        T.StructField("l_quantity", T.DoubleType()),
        T.StructField("l_extendedprice", T.DoubleType()),
        T.StructField("l_discount", T.DoubleType()),
        T.StructField("l_tax", T.DoubleType()),
        T.StructField("l_returnflag", T.StringType()),
        T.StructField("l_linestatus", T.StringType()),
        T.StructField("l_shipdate", T.TimestampType()),
    ]
)

EVENTS = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)

DOCUMENTS = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("n_chars", T.LongType()),
    ]
)

EMBEDDINGS = T.StructType(
    [
        T.StructField("vec_id", T.LongType()),
        T.StructField("embedding", T.ArrayType(T.FloatType())),
        T.StructField("label", T.IntegerType()),
    ]
)

TABLE_SCHEMAS: dict[str, T.StructType] = {
    "region": REGION,
    "nation": NATION,
    "customer": CUSTOMER,
    "supplier": SUPPLIER,
    "part": PART,
    "orders": ORDERS,
    "lineitem": LINEITEM,
    "events": EVENTS,
    "documents": DOCUMENTS,
    "embeddings": EMBEDDINGS,
}

# --- Solana getBlock shape (reference domain) ------------------------------

# One element of pre/postTokenBalances (reference parses exactly these fields:
# RECEIVER/stage2_processing.cpp:76-147).
TOKEN_BALANCE = T.StructType(
    [
        T.StructField("accountIndex", T.IntegerType()),
        T.StructField("mint", T.StringType()),
        T.StructField("owner", T.StringType()),
        T.StructField(
            "uiTokenAmount",
            T.StructType([T.StructField("uiAmountString", T.StringType())]),
        ),
    ]
)

# One transaction: the five arrays the reference's TxKeyViews materializes
# (RECEIVER/common.h:40-46). logMessages added for the new-pool instruction
# filter (SERVER/combined_subscriber.py:120-147).
TRANSACTION = T.StructType(
    [
        T.StructField(
            "transaction",
            T.StructType(
                [
                    T.StructField(
                        "message",
                        T.StructType(
                            [T.StructField("accountKeys", T.ArrayType(T.StringType()))]
                        ),
                    ),
                    T.StructField("signatures", T.ArrayType(T.StringType())),
                ]
            ),
        ),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField(
                        "loadedAddresses",
                        T.StructType(
                            [
                                T.StructField("readonly", T.ArrayType(T.StringType())),
                                T.StructField("writable", T.ArrayType(T.StringType())),
                            ]
                        ),
                    ),
                    T.StructField("preTokenBalances", T.ArrayType(TOKEN_BALANCE)),
                    T.StructField("postTokenBalances", T.ArrayType(TOKEN_BALANCE)),
                    T.StructField("logMessages", T.ArrayType(T.StringType())),
                ]
            ),
        ),
    ]
)

# Full getBlock result (SERVER/subscriber.py:34-55 fetches this; the reference
# parses it with the SIMD indexer, we declare it to from_json).
SOLANA_BLOCK = T.StructType(
    [
        T.StructField(
            "result",
            T.StructType(
                [
                    T.StructField("blockTime", T.LongType()),
                    T.StructField("parentSlot", T.LongType()),
                    T.StructField("transactions", T.ArrayType(TRANSACTION)),
                ]
            ),
        )
    ]
)

# The engine's one output relation (reference Arrow schema at
# RECEIVER/stage2_processing.cpp:254-262: all-utf8 {wallet, signature, mint,
# pre_balance, post_balance}); ts added from block time metadata
# (RECEIVER/stage2_processing2.cpp:294-300, SERVER/server.py:44-73).
BALANCE_CHANGE = T.StructType(
    [
        T.StructField("wallet", T.StringType()),
        T.StructField("signature", T.StringType()),
        T.StructField("mint", T.StringType()),
        T.StructField("pre_balance", T.StringType()),
        T.StructField("post_balance", T.StringType()),
        T.StructField("ts", T.TimestampType()),
    ]
)

# Price event stream (SERVER/ingest_prices.py:42-55, priceAPIfiller.py:63-75).
PRICE_EVENT = T.StructType(
    [
        T.StructField("pair", T.StringType()),
        T.StructField("base_price", T.DoubleType()),
        T.StructField("quote_price", T.DoubleType()),
        T.StructField("ts", T.TimestampType()),
    ]
)

# Watchlist dimension (hot addresses: RECEIVER/file_utils.cpp:3-36; Redis sets
# BASE_VAULTS/QUOTE_VAULTS/BASE_MINTS/QUOTE_MINTS: SERVER/init_redis_maps.py:10-20).
WATCHLIST = T.StructType(
    [
        T.StructField("address", T.StringType()),
        T.StructField("kind", T.StringType()),  # base_vault|quote_vault|base_mint|quote_mint
    ]
)
