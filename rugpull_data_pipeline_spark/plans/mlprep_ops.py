"""Time-series diagnostics + ML feature-prep text operators (round 4b).

Capability uplift beyond the reference's inventory, in the same two
directions the baseline mandates ("text analysis", price-series analytics —
the reference's only series op is the ±10% lag predicate,
SERVER/combined_subscriber.py:171-210):

Series diagnostics: ``window_rolling_median`` (order-statistic smoothing),
``window_acf_lags`` (lag-1..3 autocorrelation — the series-level analogue
of the reference's lag-1 predicate), ``agg_linreg_daily`` (OLS drift),
``window_bollinger_bands`` / ``window_rsi_14`` (volatility envelope +
momentum oscillator), ``agg_holder_concentration`` (HHI — the rugpull
holder-concentration screen), ``graph_pagerank_power3`` (flow-graph
influence, 3 checkpointed power iterations).

Text/corpus prep: ``text_word_entropy`` (distributional-concentration
quality signal), ``text_whitespace_normalize`` (first-pass cleaning),
``text_feature_hash_16`` (hashing-trick featurizer),
``text_bpe_merge_round2`` (merge APPLICATION via replace()'s greedy
leftmost semantics, then recount), ``text_filter_gate`` (one-pass
map-only FineWeb-style keep/drop verdict).

Dedup/similarity: ``dedup_containment_ngram`` (asymmetric containment on
the df-capped inverted index), ``audit_minhash_estimate`` (sketch
accuracy vs exact Jaccard), ``sim_mmr_diversify`` (greedy MMR re-rank),
``sim_knn_classify`` (majority-vote read path).

Temporal joins/events: ``join_point_in_time`` (leakage-free SCD2 feature
lookup), ``events_attribution_last_touch`` (as-of union-carry revenue
attribution; streaming twin in plans/stream_infra.py).

Scale notes:
- The two window queries partition by event_type and sort by (ts, event_id)
  inside each partition — one shuffle on the series key, then a single sort
  per partition serves the frame/lag; at 100 TB the series key is the
  natural range-partitioning key and skew is bounded by series cardinality.
- ACF computes all three lag columns in ONE window pass and unpivots them
  with stack() (a UNION ALL over the CTE would re-window events three times
  — Catalyst inlines WITH-CTEs), so the shuffle cost is one window exchange
  plus one tiny (series × 3)-key aggregation. Co-moments are summed
  DECIMAL-exact so the single final sqrt/divide is bit-identical across
  engines (same rationale as pipeline_ops._series_correlation).
- Linreg aggregates to (series, day) first — the daily roll-up is the big
  shuffle and it is map-side-combinable; the OLS itself runs over the tiny
  daily table with the same DECIMAL-exact co-moment trick. x is a small day
  index (not epoch seconds), so n*sxx - sx*sx never catastrophically
  cancels.
- Entropy/feature-hash are explode → per-doc hash aggregations: fan-out is
  partition-parallel (REPARTITION hint before the explode, same rationale
  as llm_ops' shingle generator), all state is doc-keyed, nothing joins.
- Whitespace normalization is a pure per-row projection — codegen'd regex,
  zero shuffles.
"""

from __future__ import annotations

from ..functions import scalars as S
from ..functions.scalars import DUCK, SPARK
from .registry import register, sql_pair, static_table


def _pair(name: str, q, tags: tuple[str, ...] = (), doc: str = "") -> None:
    sql_pair(name, q(SPARK), q(DUCK), tags=tags, doc=doc)


_W = "PARTITION BY event_type ORDER BY ts, event_id"


# ---------------------------------------------------------------------------
# Rolling median (order-statistic smoothing)
# ---------------------------------------------------------------------------


def _rolling_median(d: str) -> str:
    # Exact median is selection + at most one add/divide — deterministic
    # across engines given the identical (ts, event_id) total order, unlike
    # accumulated sums. Spark's median() refuses a window frame
    # (INVALID_WINDOW_SPEC_FOR_AGGREGATION_FUNC); percentile(v, 0.5) is the
    # frameable exact-interpolated twin of DuckDB's median().
    med = "percentile(value, 0.5)" if d == SPARK else "median(value)"
    return f"""
    SELECT event_id, event_type,
        round({med} OVER ({_W}
            ROWS BETWEEN 4 PRECEDING AND CURRENT ROW), 6) AS roll_median_5
    FROM events
    ORDER BY event_type, event_id
    """


_pair(
    "window_rolling_median",
    _rolling_median,
    tags=("window", "series"),
    doc="5-row rolling exact median of the value series per event type — "
    "robust smoothing that a single outlier tick cannot drag (the mean-"
    "based EWMA twin lives in pipeline_ops). One shuffle on the series "
    "key, one sort per partition, frame evaluation is streaming.",
)


# ---------------------------------------------------------------------------
# Autocorrelation at lags 1..3 (DECIMAL-exact co-moment Pearson)
# ---------------------------------------------------------------------------


def _acf_lags(d: str) -> str:
    n = "cast(count(*) as double)"
    sx = "cast(sum(cast(x as decimal(38,9))) as double)"
    sy = "cast(sum(cast(y as decimal(38,9))) as double)"
    sxy = "cast(sum(cast(x * y as decimal(38,9))) as double)"
    sxx = "cast(sum(cast(x * x as decimal(38,9))) as double)"
    syy = "cast(sum(cast(y * y as decimal(38,9))) as double)"
    lagged = f"""
        SELECT event_type, value,
            lag(value, 1) OVER ({_W}) AS v1,
            lag(value, 2) OVER ({_W}) AS v2,
            lag(value, 3) OVER ({_W}) AS v3
        FROM events
    """
    if d == SPARK:
        # Catalyst inlines WITH-CTEs, so a UNION ALL over the lagged CTE
        # would re-scan and re-window events three times. stack() unpivots
        # the three lag columns after ONE window pass — one exchange total.
        stacked = f"""
        SELECT event_type, x, lag_k, y FROM (
            SELECT event_type, value AS x,
                stack(3, 1, v1, 2, v2, 3, v3) AS (lag_k, y)
            FROM ({lagged}) lagged
        ) u WHERE x IS NOT NULL AND y IS NOT NULL
        """
    else:
        # Oracle side: plan shape is irrelevant, plain UNION ALL is clearest.
        stacked = f"""
        SELECT event_type, 1 AS lag_k, value AS x, v1 AS y FROM ({lagged}) lagged
        WHERE value IS NOT NULL AND v1 IS NOT NULL
        UNION ALL
        SELECT event_type, 2 AS lag_k, value AS x, v2 AS y FROM ({lagged}) lagged
        WHERE value IS NOT NULL AND v2 IS NOT NULL
        UNION ALL
        SELECT event_type, 3 AS lag_k, value AS x, v3 AS y FROM ({lagged}) lagged
        WHERE value IS NOT NULL AND v3 IS NOT NULL
        """
    return f"""
    WITH stacked AS ({stacked})
    SELECT event_type, lag_k,
        cast(count(*) as bigint) AS n_pairs,
        round(({n} * {sxy} - {sx} * {sy})
            / nullif(sqrt(greatest({n} * {sxx} - {sx} * {sx},
                        cast(0 as double))
                    * greatest({n} * {syy} - {sy} * {sy},
                        cast(0 as double))),
                cast(0 as double)), 6) AS acf
    FROM stacked
    GROUP BY event_type, lag_k
    ORDER BY event_type, lag_k
    """


_pair(
    "window_acf_lags",
    _acf_lags,
    tags=("window", "series", "agg"),
    doc="Autocorrelation of each event-type's value series at lags 1-3 — "
    "the stationarity screen before forecasting, generalizing the "
    "reference's lag-1 price predicate to a series diagnostic. One window "
    "exchange computes all three lag columns; stack() unpivots them into a "
    "(series x 3)-key DECIMAL-exact co-moment aggregation.",
)


# ---------------------------------------------------------------------------
# Per-series OLS trend over daily means
# ---------------------------------------------------------------------------


def _day_index(d: str) -> str:
    if d == SPARK:
        return "datediff(cast(ts as date), DATE '2024-01-01')"
    return "datediff('day', DATE '2024-01-01', cast(ts as date))"


def _linreg_daily(d: str) -> str:
    n = "cast(count(*) as double)"
    sx = "cast(sum(cast(x as decimal(38,9))) as double)"
    sy = "cast(sum(cast(y as decimal(38,9))) as double)"
    sxy = "cast(sum(cast(x * y as decimal(38,9))) as double)"
    sxx = "cast(sum(cast(x * x as decimal(38,9))) as double)"
    slope = f"(({n} * {sxy} - {sx} * {sy}) / ({n} * {sxx} - {sx} * {sx}))"
    return f"""
    WITH daily AS (
        SELECT event_type, {_day_index(d)} AS x,
            cast(sum(cast(value as decimal(38,9))) as double)
                / cast(count(*) as double) AS y
        FROM events
        WHERE value IS NOT NULL
        GROUP BY event_type, {_day_index(d)}
    )
    SELECT event_type,
        cast(count(*) as bigint) AS n_days,
        round({slope}, 6) AS slope_per_day,
        round(({sy} - {slope} * {sx}) / {n}, 6) AS intercept
    FROM daily
    GROUP BY event_type
    HAVING count(*) >= 2
    ORDER BY event_type
    """


_pair(
    "agg_linreg_daily",
    _linreg_daily,
    tags=("agg", "series"),
    doc="Per-series OLS trend: slope and intercept of the daily mean value "
    "against a small integer day index (not epoch seconds — keeps "
    "n*sxx - sx^2 far from catastrophic cancellation). The daily roll-up "
    "is the only big shuffle and is map-side combinable; the regression "
    "runs over the tiny (series, day) table with DECIMAL-exact sums so "
    "both engines hash-match.",
)


# ---------------------------------------------------------------------------
# Token-distribution Shannon entropy per document
# ---------------------------------------------------------------------------


def _word_entropy(d: str) -> str:
    # H = ln(n) - sum(c*ln c)/n over per-doc token counts c. Each c*ln(c)
    # term is quantized to DECIMAL(38,12) before summing: the sum is then
    # order-independent, and a last-ulp ln() divergence between engines
    # perturbs the final entropy by ~1e-12 — invisible at round-6.
    ssum = "cast(sum(cast(c * ln(c) as decimal(38,12))) as double)"
    if d == SPARK:
        # REPARTITION(doc_id) on the COMPACT documents, before the explode
        # (r13): the old hint sat on the exploding select, so Spark planned
        # Scan -> Generate -> round-robin Exchange — a serial explode
        # followed by a shuffle of every token STRING. Hashing by doc_id
        # instead satisfies both downstream groupBys (doc_id is a subset of
        # (doc_id, tok)), so the only data exchange left is the compact
        # documents themselves: 4 exchanges -> 2, interleaved median
        # 0.883 -> 0.701 s at sf0.1. (A round-robin doc shuffle + map-side
        # partial aggs measured 0.625 s locally but pays TWO shuffles of
        # exploded (doc, tok) partials at scale where this form pays one
        # shuffle of the smallest possible data — guide §2.1/§2.2.)
        toks = f"""
        SELECT doc_id, explode({S.split_ws('text', d)}) AS tok
        FROM (SELECT /*+ REPARTITION(doc_id) */ doc_id, text
              FROM documents) d
        """
    else:
        toks = f"""
        SELECT doc_id, unnest({S.split_ws('text', d)}) AS tok
        FROM documents
        """
    return f"""
    WITH cnt AS (
        SELECT doc_id, tok, count(*) AS c
        FROM ({toks}) t
        GROUP BY doc_id, tok
    )
    SELECT doc_id,
        cast(sum(c) as bigint) AS n_tokens,
        cast(count(*) as bigint) AS n_distinct,
        round(ln(cast(sum(c) as double))
            - {ssum} / cast(sum(c) as double), 6) AS token_entropy_nats
    FROM cnt
    GROUP BY doc_id
    ORDER BY doc_id
    """


_pair(
    "text_word_entropy",
    _word_entropy,
    tags=("text", "quality"),
    doc="Per-document Shannon entropy (nats) of the token distribution — "
    "the distributional-concentration quality signal: keyword-stuffed or "
    "template text scores low even when no n-gram repeats verbatim "
    "(complements quality_ops' Gopher repetition rules). Explode + two "
    "doc-keyed hash aggregations, partition-parallel, no joins.",
)


# ---------------------------------------------------------------------------
# Whitespace / control-character normalization
# ---------------------------------------------------------------------------


def _ws_normalize(d: str) -> str:
    stripped = S.re_replace("text", r"[\x00-\x1f]", "' '", d)
    collapsed = S.re_replace(stripped, r"[ ]+", "' '", d)
    return f"""
    SELECT doc_id,
        length(text) AS raw_len,
        length(clean) AS clean_len,
        (length(clean) < length(text)) AS collapsed
    FROM (
        SELECT doc_id, text, trim({collapsed}) AS clean
        FROM documents
    ) t
    ORDER BY doc_id
    """


_pair(
    "text_whitespace_normalize",
    _ws_normalize,
    tags=("text", "curation"),
    doc="First-pass corpus cleaning: control characters become spaces, "
    "space runs collapse to one, ends trimmed — reported as raw/clean "
    "lengths plus a changed flag so downstream stages can audit shrinkage. "
    "Pure per-row projection, codegen'd regex, zero shuffles.",
)


# ---------------------------------------------------------------------------
# Hashing-trick bag-of-words (16 buckets)
# ---------------------------------------------------------------------------


def _feature_hash(d: str) -> str:
    bucket = f"cast({S.portable_hash64('tok', d)} % 16 as int)"
    if d == SPARK:
        # Same shape as _word_entropy (r13): hash the compact documents by
        # doc_id BEFORE the explode so the groupBy(doc_id, bucket) needs no
        # further exchange and the explode runs partition-parallel.
        toks = f"""
        SELECT doc_id, explode({S.split_ws('text', d)}) AS tok
        FROM (SELECT /*+ REPARTITION(doc_id) */ doc_id, text
              FROM documents) d
        """
    else:
        toks = f"""
        SELECT doc_id, unnest({S.split_ws('text', d)}) AS tok
        FROM documents
        """
    return f"""
    SELECT doc_id, bucket, cast(count(*) as bigint) AS tf
    FROM (SELECT doc_id, {bucket} AS bucket FROM ({toks}) t) b
    GROUP BY doc_id, bucket
    ORDER BY doc_id, bucket
    """


_pair(
    "text_feature_hash_16",
    _feature_hash,
    tags=("text", "mlprep"),
    doc="Hashing-trick bag-of-words: every token maps to one of 16 buckets "
    "via the cross-engine portable hash (property-tested in "
    "tests/test_portable_scalars.py), yielding fixed-width sparse term "
    "frequencies with no vocabulary build — the classic pre-embedding "
    "featurizer, collision-tolerant by design. Explode + one doc-keyed "
    "hash aggregation; bucket width is a constant, so output size is "
    "bounded at docs x 16 regardless of corpus vocabulary.",
)


# ---------------------------------------------------------------------------
# Asymmetric containment dedup (sub-document duplication)
# ---------------------------------------------------------------------------


def _containment(d: str) -> str:
    # Containment C(src→dst) = |S(src) ∩ S(dst)| / |S(src)| is ASYMMETRIC:
    # a short doc fully embedded in a long one scores ~1.0 in that direction
    # while Jaccard (|∩|/|∪|) is diluted by the long doc's size and misses
    # it. Same inverted-index join + stop-shingle df-cap machinery as
    # dedup_ngram_jaccard (llm_ops), same 60-bit hash keys.
    from .llm_ops import _JACCARD_DF_CAP, _ngram_shingles

    shh = S.portable_hash64("sh", d)
    return f"""
    WITH hashed AS (
        SELECT doc_id, {shh} AS shh FROM ({_ngram_shingles(d)}) raw
    ),
    shingles AS (
        SELECT doc_id, shh FROM (
            SELECT doc_id, shh,
                count(*) OVER (PARTITION BY shh) AS df
            FROM hashed
        ) f WHERE df <= {_JACCARD_DF_CAP}
    ),
    doc_sizes AS (
        SELECT doc_id, count(*) AS n_sh FROM shingles GROUP BY doc_id
    ),
    pair_inter AS (
        SELECT a.doc_id AS src_doc, b.doc_id AS dst_doc, count(*) AS n_inter
        FROM shingles a
        JOIN shingles b ON a.shh = b.shh AND a.doc_id <> b.doc_id
        GROUP BY a.doc_id, b.doc_id
    )
    SELECT src_doc, dst_doc,
        round(cast(n_inter as double) / sa.n_sh, 6) AS containment
    FROM pair_inter
    JOIN doc_sizes sa ON sa.doc_id = src_doc
    WHERE cast(n_inter as double) / sa.n_sh >= 0.5
    ORDER BY src_doc, dst_doc
    """


@register(
    "dedup_containment_ngram",
    oracle=_containment(DUCK),
    tags=("dedup",),
    doc="Asymmetric shingle containment |A∩B|/|A| — catches a short doc "
    "embedded inside a longer one, which symmetric Jaccard dilutes away "
    "(the quote-the-whole-article failure mode of web corpora). Reuses the "
    "df-capped inverted-index equi-join: the shuffle key is the shingle "
    "hash, pair candidates only form where shingles actually collide, and "
    "hot boilerplate shingles are dropped before the self-join. The capped "
    "shingle table is materialized ONCE (localCheckpoint, same as "
    "dedup_ngram_jaccard) and reused by the self-join's both sides and the "
    "size aggregate — the pure-SQL CTE form recomputed the explode+hash "
    "three times (measured 3.1 s → 2.6 s at sf0.1).",
)
def dedup_containment_ngram(spark, sf_dir):
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from .llm_ops import _JACCARD_DF_CAP, _ngram_shingles

    sh = (
        spark.sql(
            f"SELECT doc_id, {S.portable_hash64('sh', SPARK)} AS shh "
            f"FROM ({_ngram_shingles(SPARK)}) raw"
        )
        .withColumn("df", F.count(F.lit(1)).over(Window.partitionBy("shh")))
        .where(F.col("df") <= _JACCARD_DF_CAP)
        .drop("df")
        .localCheckpoint()
    )
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    a, b = sh.alias("a"), sh.alias("b")
    pair_inter = (
        a.join(
            b,
            (F.col("a.shh") == F.col("b.shh"))
            & (F.col("a.doc_id") != F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("src_doc"), F.col("b.doc_id").alias("dst_doc")
        )
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    sa = sizes.select(
        F.col("doc_id").alias("src_doc"), F.col("n_sh").alias("n_src")
    )
    cont = F.col("n_inter").cast("double") / F.col("n_src")
    return (
        pair_inter.join(sa, "src_doc")
        .where(cont >= 0.5)
        .select("src_doc", "dst_doc", F.round(cont, 6).alias("containment"))
        .orderBy("src_doc", "dst_doc")
    )


# ---------------------------------------------------------------------------
# Bollinger bands (rolling mean ± 2σ breakout detection)
# ---------------------------------------------------------------------------


def _bollinger(d: str) -> str:
    frame = f"OVER ({_W} ROWS BETWEEN 7 PRECEDING AND CURRENT ROW)"
    cnt = f"cast(count(value) {frame} as double)"
    s = f"cast(sum(cast(value as decimal(38,9))) {frame} as double)"
    s2 = f"cast(sum(cast(value * value as decimal(38,9))) {frame} as double)"
    return f"""
    WITH stats AS (
        SELECT event_id, event_type, value,
            {cnt} AS n, {s} AS s, {s2} AS s2
        FROM events
    ),
    bands AS (
        SELECT event_id, event_type, value, n,
            s / n AS mean,
            CASE WHEN n > 1
                THEN sqrt(greatest((n * s2 - s * s) / (n * (n - 1)), 0.0))
                ELSE NULL END AS sd
        FROM stats
    )
    SELECT event_id, event_type,
        round(mean, 6) AS band_mid,
        round(mean + 2 * sd, 6) AS band_upper,
        round(mean - 2 * sd, 6) AS band_lower,
        coalesce(value > mean + 2 * sd OR value < mean - 2 * sd, false)
            AS breakout
    FROM bands
    ORDER BY event_type, event_id
    """


_pair(
    "window_bollinger_bands",
    _bollinger,
    tags=("window", "series"),
    doc="Bollinger bands: 8-row rolling mean ± 2 sample standard deviations "
    "per series, with a breakout flag — the volatility-envelope sibling of "
    "the reference's fixed ±10% predicate. Frame sums are DECIMAL-exact "
    "(built-in windowed stddev accumulates engine-specific), variance "
    "clamps at 0 for constant frames; one series-key exchange, one sort.",
)


# ---------------------------------------------------------------------------
# MMR diversified top-k (greedy re-rank, unrolled)
# ---------------------------------------------------------------------------


def _mmr_diversify(d: str, cand_src: str | None = None) -> str:
    # MMR (Carbonell & Goldstein 1998): greedily pick argmax of
    # rel(c) - λ·max_{s∈selected} sim(c, s), λ=0.5, k=3, over a 32-vector
    # candidate pool (MMR is a RE-RANK step — the pool is the small output
    # of an ANN retrieval like sim_cosine_ivf_bucketed, never the corpus).
    # The greedy recurrence is unrolled: each step is a 1-row broadcast of
    # the selected set against the pool, exactly like the reference's
    # in-process watch-set lookup. Cosines use the engine-identical
    # index-order fold (llm_ops._cosine), so the argmax ties break the same.
    from .llm_ops import _cosine

    # ``cand_src`` lets the Spark builder checkpoint the 32-row candidate
    # pool: inlined, every greedy step (s1 thrice, r2/r3) re-planned the
    # pool scan (14 fact scans planned — the round-11 registry-wide plan
    # audit; each was filter-pruned to the pool, but 14 scans of anything
    # is not the plan you'd want).
    rel = _cosine(d, "q.embedding", "c.embedding")
    cs1 = _cosine(d, "c.embedding", "a.embedding")
    cs2 = _cosine(d, "c.embedding", "b.embedding")
    cand_body = (
        cand_src
        if cand_src is not None
        else f"""
        SELECT c.vec_id, c.embedding, {rel} AS rel
        FROM embeddings c,
            (SELECT embedding FROM embeddings WHERE vec_id = 100) q
        WHERE c.vec_id < 32
    """
    )
    return f"""
    WITH cand AS ({cand_body}),
    s1 AS (SELECT * FROM cand ORDER BY rel DESC, vec_id LIMIT 1),
    r2 AS (
        SELECT c.vec_id, c.embedding, c.rel,
            c.rel - 0.5 * ({cs1}) AS mmr
        FROM cand c, s1 a WHERE c.vec_id <> a.vec_id
    ),
    s2 AS (SELECT * FROM r2 ORDER BY mmr DESC, vec_id LIMIT 1),
    r3 AS (
        SELECT c.vec_id, c.rel,
            c.rel - 0.5 * greatest({cs1}, {cs2}) AS mmr
        FROM cand c, s1 a, s2 b
        WHERE c.vec_id <> a.vec_id AND c.vec_id <> b.vec_id
    ),
    s3 AS (SELECT * FROM r3 ORDER BY mmr DESC, vec_id LIMIT 1)
    SELECT 1 AS rnk, vec_id, round(rel, 6) AS relevance,
        round(rel, 6) AS mmr_score FROM s1
    UNION ALL
    SELECT 2 AS rnk, vec_id, round(rel, 6) AS relevance,
        round(mmr, 6) AS mmr_score FROM s2
    UNION ALL
    SELECT 3 AS rnk, vec_id, round(rel, 6) AS relevance,
        round(mmr, 6) AS mmr_score FROM s3
    ORDER BY rnk
    """


@register(
    "sim_mmr_diversify",
    oracle=_mmr_diversify(DUCK),
    tags=("similarity", "mlprep"),
    doc="Maximal Marginal Relevance re-rank (Carbonell & Goldstein 1998): "
    "greedy k=3, λ=0.5 diversified selection over a 32-vector ANN "
    "candidate pool — relevance minus max-similarity-to-already-selected. "
    "The greedy loop unrolls to three 1-row-broadcast probe steps over the "
    "pool (a re-rank is post-retrieval by definition, so the pool — not "
    "the corpus — bounds every step). The pool is localCheckpointed so "
    "the retrieval scan runs once instead of per greedy step.",
)
def sim_mmr_diversify(spark, sf_dir):
    from .llm_ops import _cosine

    rel = _cosine(SPARK, "q.embedding", "c.embedding")
    cand = spark.sql(
        f"SELECT c.vec_id, c.embedding, {rel} AS rel"
        " FROM embeddings c,"
        " (SELECT embedding FROM embeddings WHERE vec_id = 100) q"
        " WHERE c.vec_id < 32"
    ).localCheckpoint()
    cand.createOrReplaceTempView("mmr_cand_v")
    return spark.sql(
        _mmr_diversify(
            SPARK, cand_src="SELECT vec_id, embedding, rel FROM mmr_cand_v"
        )
    )


# ---------------------------------------------------------------------------
# BPE: apply the learned merge, recount (round 2 of tokenizer training)
# ---------------------------------------------------------------------------


def _bpe_pair_count(d: str, src: str, toks_expr: str) -> str:
    """CTE text: (pa, pb, c) adjacent-pair counts over ``toks_expr`` arrays
    from relation text ``src``."""
    if d == SPARK:
        seq = "CASE WHEN size(toks) >= 2 THEN sequence(1, size(toks) - 1) ELSE array() END"
        pairs = f"""
        SELECT pr.pa AS pa, pr.pb AS pb FROM (
            SELECT explode(transform({seq},
                i -> struct(element_at(toks, i) AS pa,
                            element_at(toks, i + 1) AS pb))) AS pr
            FROM (SELECT /*+ REPARTITION */ {toks_expr} AS toks FROM {src}) t
        ) e
        """
    else:
        pairs = f"""
        SELECT pr['pa'] AS pa, pr['pb'] AS pb FROM (
            SELECT unnest(list_transform(range(1, len(toks)),
                i -> {{'pa': toks[i], 'pb': toks[i + 1]}})) AS pr
            FROM (SELECT {toks_expr} AS toks FROM {src}) t
            WHERE len(toks) >= 2
        ) e
        """
    return f"SELECT pa, pb, count(*) AS c FROM ({pairs}) p GROUP BY pa, pb"


def _bpe_round2(d: str, cnt1_src: str | None = None) -> str:
    # Applying a BPE merge is greedy LEFTMOST-first over non-overlapping
    # occurrences — exactly the semantics of SQL replace() over a delimited
    # string, PROVIDED every token owns both its delimiters. Joining tokens
    # with TWO spaces ('  ') and wrapping in one space gives each token a
    # private leading and trailing space, so consecutive merge sites never
    # share a delimiter character and replace() merges [a,a,a,a] to
    # [aa,aa] exactly as the BPE training loop does (a single-space join
    # would consume the shared delimiter and miss the second site).
    # ``cnt1_src`` lets the Spark builder checkpoint the round-1 pair
    # count: inlined, the two scalar-subquery top1 references and the
    # merge each re-ran the pair explode (7 fact scans planned — the
    # round-11 registry-wide plan audit).
    split2 = (
        "split(trim(s), '  ')" if d == SPARK else "string_split(trim(s), '  ')"
    )
    top_pa, top_pb = "(SELECT pa FROM top1)", "(SELECT pb FROM top1)"
    return f"""
    WITH cnt1 AS ({cnt1_src if cnt1_src is not None
                   else _bpe_pair_count(d, "documents", S.split_ws("text", d))}),
    top1 AS (SELECT pa, pb FROM cnt1 ORDER BY c DESC, pa, pb LIMIT 1),
    joined AS (
        SELECT concat(' ', {S.arr_join(S.split_ws("text", d), "'  '", d)}, ' ') AS s
        FROM documents
    ),
    merged AS (
        SELECT replace(s,
            concat(' ', {top_pa}, '  ', {top_pb}, ' '),
            concat(' ', {top_pa}, {top_pb}, ' ')) AS s
        FROM joined
    ),
    cnt2 AS ({_bpe_pair_count(d, "merged", split2)}),
    top10 AS (
        -- ordered LIMIT first: Spark plans it as a distributed
        -- TakeOrderedAndProject; the rank window then runs over 10 rows,
        -- never a single-partition sort of the full vocab^2 pair table.
        SELECT pa, pb, c FROM cnt2 ORDER BY c DESC, pa, pb LIMIT 10
    )
    SELECT
        cast(row_number() OVER (ORDER BY c DESC, pa, pb) as int) AS rank,
        concat({top_pa}, {top_pb}) AS merge_applied,
        pa, pb, cast(c as bigint) AS n_occurrences
    FROM top10
    ORDER BY rank
    """


@register(
    "text_bpe_merge_round2",
    oracle=_bpe_round2(DUCK),
    tags=("text", "tokenizer"),
    doc="Second BPE training round: pick the top merge from round 1 "
    "(deterministic tie-break), APPLY it corpus-wide, recount adjacent "
    "pairs. Merge application rides on replace()'s greedy leftmost "
    "non-overlap semantics over a double-space-delimited token string — "
    "each token owns both delimiters, so [a,a,a,a] merges to [aa,aa] "
    "exactly like the reference BPE loop. The winning pair attaches as "
    "two uncorrelated scalar subqueries (no join node); both counting "
    "rounds are explode + map-side-combinable hash aggs. The round-1 "
    "pair count is localCheckpointed so the explode runs once.",
)
def text_bpe_merge_round2(spark, sf_dir):
    from ..functions import scalars as S

    cnt1 = spark.sql(
        _bpe_pair_count(SPARK, "documents", S.split_ws("text", SPARK))
    ).localCheckpoint()
    cnt1.createOrReplaceTempView("bpe_cnt1_v")
    return spark.sql(
        _bpe_round2(SPARK, cnt1_src="SELECT pa, pb, c FROM bpe_cnt1_v")
    )


# ---------------------------------------------------------------------------
# Point-in-time feature join (leakage-free feature store lookup)
# ---------------------------------------------------------------------------


def _pit_join(d: str) -> str:
    # SCD2 validity intervals per user are disjoint by construction (lead()
    # closes each version at its successor's start, ties broken by
    # event_id), so the interval predicate matches AT MOST one version per
    # fact row and the LEFT join preserves fact cardinality exactly —
    # facts before the first version get NULL, never a future value
    # (leakage-free by construction: valid_from <= ts strictly precedes).
    lead_ts = "lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)"
    return f"""
    WITH hist AS (
        SELECT user_id, value AS price, ts AS valid_from,
            {lead_ts} AS valid_to
        FROM events
        WHERE event_type = 'purchase'
    ),
    views AS (
        SELECT event_id, user_id, ts FROM events WHERE event_type = 'view'
    )
    SELECT v.event_id, v.user_id, v.ts,
        round(h.price, 6) AS price_at_view,
        h.valid_from AS price_as_of
    FROM views v
    LEFT JOIN hist h ON h.user_id = v.user_id
        AND h.valid_from <= v.ts
        AND (h.valid_to IS NULL OR v.ts < h.valid_to)
    ORDER BY v.event_id
    """


_pair(
    "join_point_in_time",
    _pit_join,
    tags=("join", "temporal", "dimension"),
    doc="Point-in-time feature join: each view event picks up the purchase "
    "price whose SCD2 validity interval covers its timestamp — the "
    "leakage-free feature-store lookup (training labels must never see "
    "future feature values). Equi-join on the user key carries the "
    "shuffle; the interval predicate filters inside the joined partition, "
    "and disjoint intervals guarantee fact cardinality is preserved. "
    "Composes dim_scd2_price_history with the as-of family.",
)


# ---------------------------------------------------------------------------
# One-pass map-only quality gate (FineWeb-style filter chain)
# ---------------------------------------------------------------------------


def _filter_gate(d: str) -> str:
    # Every signal evaluates with higher-order ARRAY functions on the row —
    # token count, mean token length, stopword ratio, distinct-token ratio,
    # duplicate-3-gram ratio — so the whole gate is a single map-only
    # projection: zero shuffles, zero joins, linear scan at any corpus
    # size. (The standalone diagnostic queries — text_word_entropy,
    # text_repetition_score — use aggregations for exact distributions;
    # the production gate needs only row-local verdicts.)
    stops = "('the','a','an','of','and','to','in','is','it','for')"
    if d == SPARK:
        toks = S.split_ws("text", d)
        n = "size(toks)"
        stopc = f"size(filter(toks, t -> t IN {stops}))"
        dstc = "size(array_distinct(toks))"
        g3 = (
            "transform(sequence(1, size(toks) - 2), "
            f"i -> {S.gram_concat('toks', 'i', 3)})"
        )  # element access, no per-i slice alloc (r13)
        g3d = f"size(array_distinct({g3}))"
    else:
        toks = S.split_ws("text", d)
        n = "len(toks)"
        stopc = f"len(list_filter(toks, t -> t IN {stops}))"
        dstc = "len(list_distinct(toks))"
        # element access, not toks[i:i+2] slicing: DuckDB list slices cost
        # O(len(list)) each -> O(tokens^2) per row on megabyte docs (r9
        # giant-payload sweep)
        g3 = (
            "list_transform(range(1, len(toks) - 1), "
            "i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])"
        )
        g3d = f"len(list_distinct({g3}))"
    return f"""
    WITH sig AS (
        -- cast(... as double): Spark parses a bare 1.0 literal as
        -- DECIMAL(2,1), which would ripple decimals (pandas objects)
        -- through every ratio; DuckDB parses it as double.
        SELECT doc_id,
            {n} AS n_tokens,
            cast(length(replace(text, ' ', '')) as double) / {n}
                AS mean_tok_len,
            cast({stopc} as double) / {n} AS stop_ratio,
            cast({dstc} as double) / {n} AS distinct_ratio,
            CASE WHEN {n} >= 3
                THEN cast(1 as double) - cast({g3d} as double) / ({n} - 2)
                ELSE cast(0 as double) END AS dup3_ratio
        FROM (SELECT doc_id, text, {toks} AS toks FROM documents) b
    )
    SELECT doc_id, n_tokens,
        round(mean_tok_len, 6) AS mean_tok_len,
        round(stop_ratio, 6) AS stop_ratio,
        round(distinct_ratio, 6) AS distinct_ratio,
        round(dup3_ratio, 6) AS dup3_ratio,
        (n_tokens >= 20 AND mean_tok_len >= 3.0 AND mean_tok_len <= 8.0
            AND stop_ratio >= 0.02 AND distinct_ratio >= 0.35
            AND dup3_ratio <= 0.05) AS keep
    FROM sig
    ORDER BY doc_id
    """


_pair(
    "text_filter_gate",
    _filter_gate,
    tags=("text", "quality", "curation"),
    doc="One-pass FineWeb-style quality gate: token count, mean token "
    "length, stopword ratio, distinct-token ratio and duplicate-3-gram "
    "ratio all evaluate as higher-order array functions ON THE ROW, so "
    "the entire keep/drop verdict is a map-only projection — zero "
    "shuffles, zero joins, embarrassingly parallel at 100 TB. Ratios are "
    "single int/int divisions (engine-identical doubles), so the "
    "threshold verdicts hash-match exactly.",
)


# ---------------------------------------------------------------------------
# Last-touch attribution (conversion credited to the most recent touch)
# ---------------------------------------------------------------------------

_ATTR_WINDOW_S = 3600  # lookback: credit touches at most 1 h before purchase


def _attribution_oracle(d: str) -> str:
    # Oracle plan shape is irrelevant: per-purchase argmax via row_number
    # over the user-keyed join (t.ts <= p.ts, tie-break on event_id — the
    # "<=" twin of the Spark side's kind-ordered window carry). The latest
    # touch overall is the latest within the lookback whenever one exists,
    # so filtering the winner afterwards is equivalent to filtering in the
    # join.
    e = S.epoch_s
    return f"""
    WITH p AS (
        SELECT event_id, user_id, ts, value FROM events
        WHERE event_type = 'purchase'
    ),
    t AS (
        SELECT user_id, ts, event_id, event_type FROM events
        WHERE event_type <> 'purchase'
    ),
    best AS (
        SELECT p.event_id, p.value,
            CASE WHEN t.ts IS NOT NULL
                  AND {e('p.ts', d)} - {e('t.ts', d)} <= {_ATTR_WINDOW_S}
                 THEN t.event_type ELSE 'direct' END AS channel,
            row_number() OVER (
                PARTITION BY p.event_id
                ORDER BY t.ts DESC, t.event_id DESC
            ) AS rn
        FROM p
        LEFT JOIN t ON t.user_id = p.user_id AND t.ts <= p.ts
    )
    SELECT channel,
        cast(count(*) as bigint) AS n_purchases,
        {S.dsum('value', d)} AS revenue
    FROM best WHERE rn = 1
    GROUP BY channel
    ORDER BY channel
    """


@register(
    "events_attribution_last_touch",
    oracle=_attribution_oracle(DUCK),
    tags=("events", "temporal", "agg"),
    doc="Last-touch attribution: every purchase credits the same user's "
    "most recent non-purchase event within a 1-hour lookback ('direct' "
    "when none) — revenue per acquisition channel. The Spark side is the "
    "as-of union pattern (join_asof_last_view): union touches and "
    "purchases, ONE shuffle on the user key, carry the latest touch with "
    "last(ignoreNulls) over the (ts, kind, event_id) order — no join, no "
    "per-user fan-out, unlike the oracle's argmax join. Revenue sums are "
    "decimal-exact.",
)
def events_attribution_last_touch(spark, sf_dir):
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    ev = static_table(spark, sf_dir, "events")
    touches = ev.where(F.col("event_type") != "purchase").select(
        "user_id",
        "ts",
        F.lit(0).alias("kind"),
        F.col("event_id").alias("order_id"),
        F.struct(
            F.col("ts").alias("t_ts"), F.col("event_type").alias("t_type")
        ).alias("touch"),
        F.lit(None).cast("double").alias("purchase_value"),
    )
    purchases = ev.where(F.col("event_type") == "purchase").select(
        "user_id",
        "ts",
        F.lit(1).alias("kind"),
        F.col("event_id").alias("order_id"),
        F.lit(None)
        .cast("struct<t_ts:timestamp,t_type:string>")
        .alias("touch"),
        F.col("value").alias("purchase_value"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "kind", "order_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = (
        touches.unionByName(purchases)
        .withColumn("last_touch", F.last("touch", ignorenulls=True).over(w))
        .where(F.col("kind") == 1)
    )
    recent = (
        F.col("last_touch").isNotNull()
        & (
            F.unix_timestamp("ts") - F.unix_timestamp("last_touch.t_ts")
            <= _ATTR_WINDOW_S
        )
    )
    return (
        carried.select(
            F.when(recent, F.col("last_touch.t_type"))
            .otherwise(F.lit("direct"))
            .alias("channel"),
            "purchase_value",
        )
        .groupBy("channel")
        .agg(
            F.count(F.lit(1)).alias("n_purchases"),
            F.round(
                F.sum(F.col("purchase_value").cast("decimal(38,6)")).cast(
                    "double"
                ),
                6,
            ).alias("revenue"),
        )
        .orderBy("channel")
    )


# ---------------------------------------------------------------------------
# PageRank (3 power iterations) over the event-transition graph
# ---------------------------------------------------------------------------

_PR_D = 0.85
_PR_ITERS = 3


def _pagerank_oracle(d: str) -> str:
    # Unrolled power iteration, one CTE per step; per-step contribution sums
    # are DECIMAL-quantized so the fold is order-independent (the scores
    # feed the next iteration unrounded). Dangling-mass redistribution is
    # omitted: every fixture node has out-edges (documented variant).
    dsum = "cast(sum(cast(r.score * e.w as decimal(38,18))) as double)"
    nn = "(SELECT n FROM nn)"
    step = lambda prev: f"""
        SELECT n.node,
            (cast(1 as double) - {_PR_D}) / {nn}
            + {_PR_D} * coalesce({dsum}, cast(0 as double)) AS score
        FROM nodes n
        LEFT JOIN edges e ON e.dst = n.node
        LEFT JOIN {prev} r ON r.node = e.src
        GROUP BY n.node
    """
    return f"""
    WITH edges_raw AS (
        SELECT prev AS src, event_type AS dst, count(*) AS c
        FROM (
            SELECT event_type,
                lag(event_type) OVER (
                    PARTITION BY user_id ORDER BY ts, event_id) AS prev
            FROM events
        ) t
        WHERE prev IS NOT NULL
        GROUP BY prev, event_type
    ),
    nodes AS (SELECT DISTINCT event_type AS node FROM events),
    outs AS (SELECT src, sum(c) AS tot FROM edges_raw GROUP BY src),
    edges AS (
        SELECT e.src, e.dst, cast(e.c as double) / o.tot AS w
        FROM edges_raw e JOIN outs o ON o.src = e.src
    ),
    nn AS (SELECT cast(count(*) as double) AS n FROM nodes),
    r0 AS (SELECT node, cast(1 as double) / {nn} AS score FROM nodes),
    r1 AS ({step("r0")}),
    r2 AS ({step("r1")}),
    r3 AS ({step("r2")})
    SELECT node AS event_type, round(score, 6) AS pagerank
    FROM r3
    ORDER BY pagerank DESC, event_type
    """


@register(
    "graph_pagerank_power3",
    oracle=_pagerank_oracle(DUCK),
    tags=("graph", "iterative"),
    doc="PageRank (d=0.85, 3 power iterations) over the event-transition "
    "graph — on production rugpull data the nodes are wallets and the "
    "edges token transfers, ranking influence in the flow graph; the "
    "fixture's event-type transition graph stands in. The edge table "
    "(one window pass + row normalization) is built ONCE and "
    "localCheckpoint'd — the kmeans/cc_fixpoint iteration pattern — and "
    "each iteration is a broadcast-sized join against it, per-step sums "
    "DECIMAL-quantized so both engines fold identically. The oracle "
    "unrolls the same three steps as chained CTEs.",
)
def graph_pagerank_power3(spark, sf_dir):
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    ev = static_table(spark, sf_dir, "events")
    prev = F.lag("event_type").over(
        Window.partitionBy("user_id").orderBy("ts", "event_id")
    )
    edges_raw = (
        ev.select("event_type", prev.alias("prev"))
        .where(F.col("prev").isNotNull())
        .groupBy(F.col("prev").alias("src"), F.col("event_type").alias("dst"))
        .agg(F.count(F.lit(1)).alias("c"))
    )
    outs = edges_raw.groupBy("src").agg(F.sum("c").alias("tot"))
    edges = (
        edges_raw.join(outs, "src")
        .select("src", "dst", (F.col("c").cast("double") / F.col("tot")).alias("w"))
        .localCheckpoint()
    )
    nodes = ev.select(F.col("event_type").alias("node")).distinct().localCheckpoint()
    n = float(nodes.count())  # metadata-sized scalar, like kmeans' k
    if n == 0:
        # empty slice: no graph, no ranks — not a ZeroDivisionError
        return spark.createDataFrame([], "event_type string, pagerank double")
    r = nodes.withColumn("score", F.lit(1.0 / n))
    for _ in range(_PR_ITERS):
        contrib = (
            edges.join(r, edges.src == r.node)
            .groupBy("dst")
            .agg(
                F.sum((F.col("score") * F.col("w")).cast("decimal(38,18)"))
                .cast("double")
                .alias("contrib")
            )
        )
        r = nodes.join(contrib, nodes.node == contrib.dst, "left").select(
            "node",
            (
                F.lit((1.0 - _PR_D) / n)
                + F.lit(_PR_D) * F.coalesce(F.col("contrib"), F.lit(0.0))
            ).alias("score"),
        )
    return r.select(
        F.col("node").alias("event_type"), F.round("score", 6).alias("pagerank")
    ).orderBy(F.desc("pagerank"), "event_type")


# ---------------------------------------------------------------------------
# HITS hubs & authorities (3 power iterations, L1-normalized)
# ---------------------------------------------------------------------------

_HITS_ITERS = 3


def _hits_oracle(d: str) -> str:
    # Unrolled mutual-reinforcement iterations: authority from hubs, hubs
    # from authorities, each L1-normalized (the linear updates make
    # per-round L1 equivalent to normalize-once, and L1 avoids a sqrt in
    # the fold). Sums DECIMAL-quantized, divisions on identical doubles.
    # Every CTE is MATERIALIZED on the DuckDB side: the 6-step chain with
    # norm scalar subqueries re-inlines exponentially otherwise (the
    # oracle-side twin of the builder's localCheckpoint contract).
    mat = "MATERIALIZED " if d == DUCK else ""

    def step(k: int, key: str, other: str, val: str, prev: str, pv: str) -> str:
        dsum = f"cast(sum(cast(e.w * s.{pv} as decimal(38,18))) as double)"
        norm = (
            f"(SELECT cast(sum(cast({val} as decimal(38,18))) as double)"
            f" FROM {val}{k}r)"
        )
        return f"""
    {val}{k}r AS {mat}(
        SELECT n.node, coalesce(x.c, cast(0 as double)) AS {val}
        FROM nodes n
        LEFT JOIN (
            SELECT e.{key} AS node, {dsum} AS c
            FROM edges e JOIN {prev} s ON s.node = e.{other}
            GROUP BY e.{key}
        ) x ON x.node = n.node
    ),
    {val}{k} AS {mat}(
        SELECT node, {val} / nullif({norm}, cast(0 as double)) AS {val}
        FROM {val}{k}r
    )"""

    steps = []
    for k in range(1, _HITS_ITERS + 1):
        steps.append(step(k, "dst", "src", "a", f"h{k - 1}", "h"))
        steps.append(step(k, "src", "dst", "h", f"a{k}", "a"))
    chain = ",".join(steps)
    last = _HITS_ITERS
    return f"""
    WITH edges AS {mat}(
        SELECT prev AS src, event_type AS dst, cast(count(*) as double) AS w
        FROM (
            SELECT event_type,
                lag(event_type) OVER (
                    PARTITION BY user_id ORDER BY ts, event_id) AS prev
            FROM events
        ) t
        WHERE prev IS NOT NULL
        GROUP BY prev, event_type
    ),
    nodes AS {mat}(SELECT DISTINCT event_type AS node FROM events),
    nn AS {mat}(SELECT cast(count(*) as double) AS n FROM nodes),
    h0 AS {mat}(SELECT node, cast(1 as double) / (SELECT n FROM nn) AS h
           FROM nodes),{chain}
    SELECT a{last}.node AS event_type,
        round(a{last}.a, 6) AS authority,
        round(h{last}.h, 6) AS hub
    FROM a{last} JOIN h{last} ON h{last}.node = a{last}.node
    ORDER BY authority DESC, event_type
    """


@register(
    "graph_hits_power3",
    oracle=_hits_oracle(DUCK),
    tags=("graph", "iterative"),
    doc="HITS hubs & authorities (Kleinberg), 3 mutual-reinforcement "
    "iterations over the event-transition graph — the directed complement "
    "of graph_pagerank_power3: PageRank ranks one notion of influence, "
    "HITS separates SOURCES of flow (hubs) from SINKS (authorities), the "
    "distributor-vs-collector split a rugpull flow graph cares about. "
    "Same broadcast-iteration contract as pagerank/kmeans: the weighted "
    "edge table (raw transition counts — HITS uses the unnormalized "
    "adjacency) is localCheckpoint'd once, each half-iteration is one "
    "equi-join + decimal-quantized agg, and the L1 norm is a broadcast "
    "1-row aggregate cross-joined back in-plan (no driver round trips, "
    "no full-frame single-partition window). Per-round L1 normalization is "
    "exactly normalize-once (the updates are linear) but keeps the "
    "doubles near 1 so the decimal(38,18) quantization never saturates.",
)
def graph_hits_power3(spark, sf_dir):
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    ev = static_table(spark, sf_dir, "events")
    prev = F.lag("event_type").over(
        Window.partitionBy("user_id").orderBy("ts", "event_id")
    )
    edges = (
        ev.select("event_type", prev.alias("prev"))
        .where(F.col("prev").isNotNull())
        .groupBy(F.col("prev").alias("src"), F.col("event_type").alias("dst"))
        .agg(F.count(F.lit(1)).cast("double").alias("w"))
        .localCheckpoint()
    )
    nodes = ev.select(F.col("event_type").alias("node")).distinct().localCheckpoint()
    n = float(nodes.count())
    if n == 0:
        # empty slice: no graph, no scores — not a ZeroDivisionError
        return spark.createDataFrame(
            [], "event_type string, authority double, hub double"
        )

    def dsum(col):
        return F.sum(col.cast("decimal(38,18)")).cast("double")

    def half_step(scores, val_col, group_key, join_key):
        contrib = (
            edges.join(scores, scores["node"] == edges[join_key])
            .groupBy(group_key)
            .agg(dsum(F.col("w") * F.col(val_col)).alias("c"))
        )
        # Lazy localCheckpoint: the frame is consumed twice (norm aggregate
        # + value side); without it the two references double the lineage
        # per half-step — 2^6 copies of the join/agg chain, measured 6.7 s
        # vs 2.0 s at sf0.1 (ReuseExchange does not recover it). eager=False
        # materializes INSIDE the main action, so no extra driver round
        # trips — the r11 eager-checkpoint+first() form paid 2 driver jobs
        # per half-step for exactly this sharing.
        unnorm = nodes.join(
            contrib, nodes.node == F.col(group_key), "left"
        ).select(
            "node", F.coalesce(F.col("c"), F.lit(0.0)).alias(val_col)
        ).localCheckpoint(eager=False)
        # The L1 norm is a broadcast 1-row aggregate (same decimal(38,18)-
        # quantized expression the window/collected forms used, so the
        # double is bit-identical), cross-joined back; the edgeless-graph
        # NULL contract rides on nullif(norm, 0) exactly like the oracle.
        # The r12 shape computed it as sum() OVER an unpartitioned window —
        # 11 Exchange SinglePartition nodes each funnelling the ENTIRE
        # node-level frame through one partition (the r12 verdict's scale
        # liability). The aggregate's own final-agg exchange carries one
        # pre-aggregated row per map task (partial-agg tree-reduce), not
        # the frame. Interleaved A/B at sf0.1: wall flat (window 1.99-2.31
        # vs this 2.07-2.15 median across sessions), full-frame funnels
        # 11 -> 0 (guide §2.4/§5).
        tot = unnorm.agg(
            F.sum(F.col(val_col).cast("decimal(38,18)"))
            .cast("double")
            .alias("__tot")
        )
        return unnorm.crossJoin(F.broadcast(tot)).select(
            "node",
            (F.col(val_col) / F.nullif(F.col("__tot"), F.lit(0.0))).alias(val_col),
        )

    h = nodes.withColumn("h", F.lit(1.0 / n))
    a = None
    for _ in range(_HITS_ITERS):
        a = half_step(h, "h", "dst", "src").withColumnRenamed("h", "a")
        h = half_step(a, "a", "src", "dst").withColumnRenamed("a", "h")
    return (
        a.join(h.withColumnRenamed("node", "hn"), a.node == F.col("hn"))
        .select(
            F.col("node").alias("event_type"),
            F.round("a", 6).alias("authority"),
            F.round("h", 6).alias("hub"),
        )
        .orderBy(F.desc("authority"), "event_type")
    )


# ---------------------------------------------------------------------------
# Sketch accuracy audit: MinHash estimate vs exact Jaccard
# ---------------------------------------------------------------------------


def _minhash_audit(d: str, sh_src: str | None = None) -> str:
    # The dedup pipeline trusts the 16-hash MinHash signature to route
    # near-dup candidates; this audit measures what that trust costs. Both
    # the estimate (matching signature positions / 16) and the exact Jaccard
    # are computed per LSH candidate pair, plus the |error| and a
    # within-one-sigma flag (sigma = sqrt(J(1-J)/16) <= 0.125 at J=0.5;
    # bound used: 0.25 = 2 sigma worst-case). Everything is exact rational
    # arithmetic on the cross-engine portable hash, so the audit itself
    # hash-compares.
    from .llm_ops import (
        _BAND_SIZE,
        _LSH_BUCKET_CAP,
        _MINHASH_AB,
        _MINHASH_P,
        _N_HASHES,
        _ngram_shingles,
    )

    shh = S.portable_hash64("sh", d)
    min_cols = ",\n            ".join(
        f"min(({a} * m + {b}) % {_MINHASH_P}) AS h{j}"
        for j, (a, b) in enumerate(_MINHASH_AB)
    )
    band_keys = ", ".join(
        "md5(concat_ws(',', "
        + ", ".join(f"h{4 * band + r}" for r in range(_BAND_SIZE))
        + "))"
        for band in range(_N_HASHES // _BAND_SIZE)
    )
    n_match = " + ".join(
        f"(case when a.h{j} = b.h{j} then 1 else 0 end)" for j in range(_N_HASHES)
    )
    if d == SPARK:
        bands = f"""
        SELECT doc_id, band, band_key
        FROM sigs
        LATERAL VIEW posexplode(array({band_keys})) AS band, band_key
        """
        doc_sets = (
            "SELECT doc_id, collect_set(shh) AS shs FROM sh_hashed GROUP BY doc_id"
        )
        n_inter = "size(array_intersect(sa.shs, sb.shs))"
        n_a, n_b = "size(sa.shs)", "size(sb.shs)"
    else:
        bands = f"""
        SELECT doc_id, i AS band, [{band_keys}][i + 1] AS band_key
        FROM sigs, unnest(range(0, {_N_HASHES // _BAND_SIZE})) t(i)
        """
        doc_sets = (
            "SELECT doc_id, list(DISTINCT shh) AS shs FROM sh_hashed GROUP BY doc_id"
        )
        n_inter = "len(list_intersect(sa.shs, sb.shs))"
        n_a, n_b = "len(sa.shs)", "len(sb.shs)"
    jacc = f"cast({n_inter} as double) / ({n_a} + {n_b} - {n_inter})"
    est = f"cast(({n_match}) as double) / {_N_HASHES}"

    # ``sh_src`` lets the Spark builder checkpoint the hashed-shingle
    # table: inlined, sigs (consumed 3x) and doc_sets each re-ran the
    # shingle explode (6 fact scans planned - the round-11
    # registry-wide plan audit).
    return f"""
    WITH sh_hashed AS ({sh_src if sh_src is not None else f'''
        SELECT doc_id, {shh} AS shh FROM ({_ngram_shingles(d)}) raw
    '''}),
    sigs AS (
        SELECT doc_id,
            {min_cols}
        FROM (SELECT doc_id, shh % {_MINHASH_P} AS m FROM sh_hashed) t
        GROUP BY doc_id
    ),
    bands AS (
        {bands}
    ),
    bands_capped AS (
        SELECT doc_id, band, band_key FROM (
            SELECT doc_id, band, band_key,
                count(*) OVER (PARTITION BY band, band_key) AS bsz
            FROM bands
        ) f WHERE bsz <= {_LSH_BUCKET_CAP}
    ),
    candidates AS (
        SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        FROM bands_capped a
        JOIN bands_capped b ON a.band = b.band AND a.band_key = b.band_key
            AND a.doc_id < b.doc_id
    ),
    doc_sets AS ({doc_sets}),
    paired AS (
        SELECT c.doc_a, c.doc_b,
            {est} AS j_est,
            {jacc} AS j_exact
        FROM candidates c
        JOIN sigs a ON a.doc_id = c.doc_a
        JOIN sigs b ON b.doc_id = c.doc_b
        JOIN doc_sets sa ON sa.doc_id = c.doc_a
        JOIN doc_sets sb ON sb.doc_id = c.doc_b
    )
    SELECT doc_a, doc_b,
        round(j_est, 6) AS jaccard_est,
        round(j_exact, 6) AS jaccard_exact,
        round(abs(j_est - j_exact), 6) AS abs_err,
        (abs(j_est - j_exact) <= 0.25) AS within_bound
    FROM paired
    ORDER BY doc_a, doc_b
    """


@register(
    "audit_minhash_estimate",
    oracle=_minhash_audit(DUCK),
    tags=("dedup", "audit", "sketch"),
    doc="Sketch-accuracy audit: for every LSH candidate pair, the 16-hash "
    "MinHash Jaccard estimate (matching signature positions / 16) next to "
    "the exact shingle-set Jaccard, the |error|, and a 2-sigma "
    "within-bound flag — the verification pass that justifies trusting "
    "the sketch for routing at 100 TB (the agg_approx_sketches bounds "
    "oracle, applied to the dedup family). Same one-pass signature "
    "aggregation and capped band join as dedup_minhash_lsh; everything "
    "is exact rational arithmetic on the portable hash, so even the "
    "audit hash-compares across engines. The hashed-shingle table is "
    "localCheckpointed so the explode runs once.",
)
def audit_minhash_estimate(spark, sf_dir):
    from .llm_ops import _ngram_shingles

    shh = S.portable_hash64("sh", SPARK)
    sh = spark.sql(
        f"SELECT doc_id, {shh} AS shh FROM ({_ngram_shingles(SPARK)}) raw"
    ).localCheckpoint()
    sh.createOrReplaceTempView("mh_audit_sh_v")
    return spark.sql(
        _minhash_audit(SPARK, sh_src="SELECT doc_id, shh FROM mh_audit_sh_v")
    )


# ---------------------------------------------------------------------------
# RSI-14 (momentum oscillator over the value series)
# ---------------------------------------------------------------------------


def _rsi14(d: str) -> str:
    # Simple (cumulative, non-Wilder) RSI over a 14-diff frame, in the
    # division-safe algebraic form 100·G/(G+L): gains and losses sum
    # DECIMAL-exact, the single final divide is engine-identical, and a
    # flat frame (G+L=0) yields NULL rather than a 0/0.
    frame = f"OVER ({_W} ROWS BETWEEN 13 PRECEDING AND CURRENT ROW)"
    sg = f"cast(sum(cast(gain as decimal(38,9))) {frame} as double)"
    sl = f"cast(sum(cast(loss as decimal(38,9))) {frame} as double)"
    nd = f"count(diff) {frame}"
    return f"""
    WITH diffs AS (
        SELECT event_id, event_type, ts,
            value - lag(value) OVER ({_W}) AS diff
        FROM events
    ),
    gl AS (
        SELECT event_id, event_type, ts,
            diff,
            CASE WHEN diff > 0 THEN diff ELSE 0 END AS gain,
            CASE WHEN diff < 0 THEN -diff ELSE 0 END AS loss
        FROM diffs
    )
    SELECT event_id, event_type,
        CASE WHEN {nd} = 14 AND {sg} + {sl} > 0
             THEN round(100 * {sg} / ({sg} + {sl}), 6)
             ELSE NULL END AS rsi_14
    FROM gl
    ORDER BY event_type, event_id
    """


_pair(
    "window_rsi_14",
    _rsi14,
    tags=("window", "series"),
    doc="RSI-14 momentum oscillator per series (100·gains/(gains+losses) "
    "over a 14-diff frame; NULL until the frame fills or when flat) — "
    "with max-drawdown, EWMA and Bollinger this completes the quant "
    "screen the reference's single ±10% predicate hints at. One window "
    "pass computes the lag diff, a second the frame sums — both share "
    "the one series-key exchange and sort.",
)


# ---------------------------------------------------------------------------
# kNN classifier over embeddings (majority vote of cosine top-10)
# ---------------------------------------------------------------------------


def _knn_classify(d: str) -> str:
    from .llm_ops import _cosine

    cos = _cosine(d, "q.embedding", "c.embedding")
    return f"""
    WITH queries AS (
        SELECT vec_id AS query_id, embedding, label AS true_label
        FROM embeddings WHERE vec_id >= 5 AND vec_id < 15
    ),
    scored AS (
        SELECT q.query_id, q.true_label, c.vec_id, c.label,
            {cos} AS cosine
        FROM queries q
        JOIN embeddings c ON c.vec_id <> q.query_id
    ),
    top10 AS (
        SELECT query_id, true_label, label FROM (
            SELECT query_id, true_label, label,
                row_number() OVER (
                    PARTITION BY query_id ORDER BY cosine DESC, vec_id
                ) AS rnk
            FROM scored
        ) r WHERE rnk <= 10
    ),
    votes AS (
        SELECT query_id, true_label, label, count(*) AS n_votes
        FROM top10 GROUP BY query_id, true_label, label
    )
    SELECT query_id, true_label,
        label AS predicted_label,
        cast(n_votes as bigint) AS n_votes,
        (label = true_label) AS correct
    FROM (
        SELECT *, row_number() OVER (
            PARTITION BY query_id ORDER BY n_votes DESC, label
        ) AS rn
        FROM votes
    ) w WHERE rn = 1
    ORDER BY query_id
    """


_pair(
    "sim_knn_classify",
    _knn_classify,
    tags=("similarity", "mlprep"),
    doc="kNN label prediction: majority vote over each query vector's "
    "cosine top-10 (deterministic tie-breaks on vec_id then label) with a "
    "per-query correctness flag — the classification read-path of the "
    "similarity stack. Same broadcast-queries linear scan as the top-k "
    "baseline; voting is integer counting, argmax is a per-query window "
    "over at most 10 rows.",
)


# ---------------------------------------------------------------------------
# Holder-concentration (HHI) per series
# ---------------------------------------------------------------------------


def _hhi(d: str) -> str:
    # Rugpull risk reads directly off holder concentration: HHI = sum of
    # squared user shares of the per-type value flow. User sums are
    # DECIMAL-exact; each share is one divide; share^2 terms re-quantize to
    # DECIMAL(38,18) so the final sum is order-independent.
    usum = "cast(sum(cast(value as decimal(38,9))) as double)"
    return f"""
    WITH per_user AS (
        SELECT event_type, user_id, {usum} AS v
        FROM events
        WHERE value IS NOT NULL AND value > 0
        GROUP BY event_type, user_id
    ),
    tot AS (
        SELECT event_type, cast(sum(cast(v as decimal(38,9))) as double) AS t,
            count(*) AS n_users
        FROM per_user GROUP BY event_type
    )
    SELECT p.event_type,
        cast(max(t.n_users) as bigint) AS n_users,
        round(cast(sum(cast((p.v / t.t) * (p.v / t.t) as decimal(38,18)))
            as double), 6) AS hhi,
        round(max(p.v / t.t), 6) AS top_share
    FROM per_user p
    JOIN tot t ON t.event_type = p.event_type
    GROUP BY p.event_type
    ORDER BY p.event_type
    """


_pair(
    "agg_holder_concentration",
    _hhi,
    tags=("agg", "domain"),
    doc="Holder-concentration screen: Herfindahl index (sum of squared "
    "user shares) and top-holder share of each event type's value flow — "
    "the concentration signal rugpull detection reads off token holder "
    "tables. Two stacked map-side-combinable aggregations keyed by "
    "(type, user) then type; shares are single divides of DECIMAL-exact "
    "sums and the HHI terms re-quantize before summing, so both engines "
    "agree bit-for-bit.",
)


# ---------------------------------------------------------------------------
# Leakage-free temporal train/test split
# ---------------------------------------------------------------------------


def _temporal_split(d: str) -> str:
    # The hash split (text_train_val_split) is exchangeable; time-series
    # models need a TEMPORAL split — train strictly before test — or the
    # eval leaks the future. Cutoff = exact 80th percentile of epoch
    # seconds per series (integer interpolation, engine-identical, already
    # proven by agg_percentiles_exact).
    e = S.epoch_s("ts", d)
    pct = (
        f"percentile(es, 0.8)" if d == SPARK else "quantile_cont(es, 0.8)"
    )
    # Quantize the interpolated cutoff to integer MICRO-seconds before the
    # comparison. The 0.8-interpolation of integer seconds is mathematically
    # an exact multiple of 0.2 s — an integer in micro units — but the two
    # engines' fp evaluation can land an ulp on either side of it; rounding
    # to the nearest micro (fp error ≪ 0.5 micro at any epoch magnitude)
    # makes the train/test boundary engine-identical even when the true
    # percentile coincides with a data value. Same integer-quantized-compare
    # convention as the repo's fixed-point folds.
    return f"""
    WITH stamped AS (
        SELECT event_type, {e} AS es FROM events
    ),
    cuts AS (
        SELECT event_type,
            cast(round({pct} * 1000000) as bigint) AS cutoff_micro
        FROM stamped GROUP BY event_type
    )
    SELECT event_type, split,
        cast(count(*) as bigint) AS n_rows,
        cast(min(es) as bigint) AS min_es,
        cast(max(es) as bigint) AS max_es
    FROM (
        SELECT s.event_type AS event_type, s.es AS es,
            CASE WHEN s.es * 1000000 <= c.cutoff_micro
                 THEN 'train' ELSE 'test' END AS split
        FROM stamped s
        JOIN cuts c ON c.event_type = s.event_type
    ) tagged
    GROUP BY event_type, split
    ORDER BY event_type, split DESC
    """


_pair(
    "sample_temporal_split",
    _temporal_split,
    tags=("sample", "mlprep", "temporal"),
    doc="Leakage-free temporal train/test split: per series, train = rows "
    "at or before the exact 80th-percentile timestamp, test strictly "
    "after — the time-ordered counterpart of the hash-based "
    "text_train_val_split (which is exchangeable and therefore leaks for "
    "forecasting). Emitted as per-(series, split) counts and boundaries "
    "so the no-overlap invariant (max train < min test) is auditable in "
    "the output itself. One agg for cutoffs (broadcastable), one "
    "grouped count.",
)


# ---------------------------------------------------------------------------
# Time-hierarchy ROLLUP (hypertable-style day→hour drill-down)
# ---------------------------------------------------------------------------


def _time_rollup(d: str) -> str:
    day = S.fmt_date("ts", d)
    return f"""
    SELECT {day} AS day,
        hour(ts) AS hr,
        grouping({day}) AS g_day,
        grouping(hour(ts)) AS g_hr,
        cast(count(*) as bigint) AS n_events,
        {S.dsum('value', d)} AS total_value
    FROM events
    WHERE event_type = 'purchase'
    GROUP BY ROLLUP ({day}, hour(ts))
    ORDER BY g_day, g_hr, day, hr
    """


_pair(
    "agg_time_rollup",
    _time_rollup,
    tags=("agg", "temporal", "sweep:rollup-empty"),
    doc="Hypertable-style time-hierarchy ROLLUP: purchase volume at "
    "(day, hour), per-day subtotals, and the grand total in ONE "
    "aggregation pass (grouping() markers distinguish subtotal rows from "
    "NULL keys) — the continuous-aggregate drill-down shape. Spark plans "
    "ROLLUP as a single Expand + hash agg: one shuffle for all three "
    "levels, map-side combinable.",
)


# ---------------------------------------------------------------------------
# Seasonal-baseline deviation (hour-of-day aware anomaly screen)
# ---------------------------------------------------------------------------


def _seasonal_baseline(d: str) -> str:
    # A global z-score flags every nightly lull and daily peak; the honest
    # baseline is the (series, hour-of-day) profile. Deviation = value
    # minus its seasonal-cell mean, reported with the cell population so
    # thin cells are discountable downstream. Means are DECIMAL-exact
    # sums / counts (one divide); the join back is on the tiny
    # (series × 24) profile — broadcastable at any fact scale.
    cell_mean = (
        "cast(sum(cast(value as decimal(38,9))) as double)"
        " / cast(count(value) as double)"
    )
    return f"""
    WITH profile AS (
        SELECT event_type, hour(ts) AS hr,
            {cell_mean} AS cell_mean,
            count(value) AS n_cell
        FROM events
        GROUP BY event_type, hour(ts)
    )
    SELECT e.event_id, e.event_type,
        hour(e.ts) AS hr,
        round(p.cell_mean, 6) AS cell_mean,
        cast(p.n_cell as bigint) AS n_cell,
        round(e.value - p.cell_mean, 6) AS seasonal_dev
    FROM events e
    JOIN profile p ON p.event_type = e.event_type AND p.hr = hour(e.ts)
    WHERE e.value IS NOT NULL
    ORDER BY e.event_id
    """


_pair(
    "window_seasonal_baseline",
    _seasonal_baseline,
    tags=("series", "agg", "quality"),
    doc="Hour-of-day seasonal baseline: each event's deviation from its "
    "(series, hour) historical mean, with the cell population attached — "
    "the seasonality-aware anomaly screen (a global z-score flags every "
    "nightly lull; agg_zscore_outliers is that global sibling). One "
    "map-combinable profile aggregation, then a broadcast join of the "
    "(series × 24)-row profile back onto the facts.",
)


# ---------------------------------------------------------------------------
# Token-budgeted mixture construction (greedy-by-quality per source)
# ---------------------------------------------------------------------------

_MIX_BUDGET_TOKENS = 800


def _token_budget_mixture(d: str) -> str:
    # Real training mixtures are built to TOKEN budgets per source, not doc
    # counts (text_mixture_sample is the doc-count sibling): within each
    # source, take documents best-quality-first until the running token sum
    # crosses the budget. Quality proxy = distinct-token ratio (map-only,
    # engine-identical single divide); the greedy prefix is one window
    # cumsum per source partition.
    toks = S.split_ws("text", d)
    n = "size(toks)" if d == SPARK else "len(toks)"
    dst = (
        "size(array_distinct(toks))" if d == SPARK else "len(list_distinct(toks))"
    )
    return f"""
    WITH scored AS (
        SELECT doc_id, source,
            {n} AS n_tokens,
            cast({dst} as double) / {n} AS quality
        FROM (SELECT doc_id, source, {toks} AS toks FROM documents) t
    ),
    ranked AS (
        SELECT doc_id, source, n_tokens, quality,
            sum(n_tokens) OVER (
                PARTITION BY source
                ORDER BY quality DESC, doc_id
                ROWS UNBOUNDED PRECEDING
            ) AS cum_tokens
        FROM scored
    )
    SELECT source, doc_id,
        cast(n_tokens as bigint) AS n_tokens,
        round(quality, 6) AS quality,
        cast(cum_tokens as bigint) AS cum_tokens
    FROM ranked
    WHERE cum_tokens <= {_MIX_BUDGET_TOKENS}
    ORDER BY source, cum_tokens
    """


_pair(
    "text_token_budget_mixture",
    _token_budget_mixture,
    tags=("text", "mlprep", "sample"),
    doc="Token-budgeted mixture construction: within each source, take "
    "documents best-quality-first (distinct-token-ratio proxy, "
    "deterministic tie-breaks) until the running token sum reaches the "
    "per-source budget — how training mixtures are actually sized "
    "(text_mixture_sample is the doc-count sibling). One window cumsum "
    "per source partition; the quality score is map-only, so the single "
    "shuffle is the source-key window exchange.",
)


# ---------------------------------------------------------------------------
# Classifier evaluation: confusion matrix + per-class precision/recall
# ---------------------------------------------------------------------------


def _lang_confusion(d: str) -> str:
    # Model evaluation as a first-class query: the lang-id heuristic's
    # predictions against the labeled lang column, as a confusion matrix
    # with per-cell share of the true class (recall decomposition). All
    # counts are integers; shares are single divides of exact counts.
    from .llm_ops import _lang_id

    inner = _lang_id(d).replace("ORDER BY doc_id", "")
    return f"""
    WITH preds AS ({inner}),
    cells AS (
        SELECT labeled_lang, predicted_class, count(*) AS n
        FROM preds GROUP BY labeled_lang, predicted_class
    ),
    totals AS (
        SELECT labeled_lang, sum(n) AS n_true FROM cells GROUP BY labeled_lang
    )
    SELECT c.labeled_lang, c.predicted_class,
        cast(c.n as bigint) AS n,
        round(cast(c.n as double) / t.n_true, 6) AS recall_share
    FROM cells c
    JOIN totals t ON t.labeled_lang = c.labeled_lang
    ORDER BY c.labeled_lang, c.predicted_class
    """


_pair(
    "eval_lang_confusion",
    _lang_confusion,
    tags=("eval", "text"),
    doc="Classifier evaluation as a query: confusion matrix of the lang-id "
    "heuristic's predictions against the labeled lang column, each cell "
    "with its share of the true class (the recall decomposition) — the "
    "eval primitive every model-in-the-pipeline needs, distributed as two "
    "stacked hash aggs over integer counts; the class-total join is "
    "broadcast-sized.",
)


# ---------------------------------------------------------------------------
# Gini coefficient per series (inequality of user value shares)
# ---------------------------------------------------------------------------


def _gini(d: str) -> str:
    # G = (2·Σ i·x_(i))/(n·Σx) − (n+1)/n over per-user value sums x sorted
    # ascending (rank i from a per-type window). User sums and the Σ i·x
    # co-moment are DECIMAL-exact; the two final divides are engine-
    # identical. Complements the HHI screen: Gini reads the whole Lorenz
    # curve where HHI squares the top shares.
    usum = "cast(sum(cast(value as decimal(38,9))) as double)"
    sixi = "cast(sum(cast(i * x as decimal(38,9))) as double)"
    sx = "cast(sum(cast(x as decimal(38,9))) as double)"
    n = "cast(count(*) as double)"
    return f"""
    WITH per_user AS (
        SELECT event_type, user_id, {usum} AS x
        FROM events
        WHERE value IS NOT NULL AND value > 0
        GROUP BY event_type, user_id
    ),
    ranked AS (
        SELECT event_type, x,
            row_number() OVER (
                PARTITION BY event_type ORDER BY x, user_id
            ) AS i
        FROM per_user
    )
    SELECT event_type,
        cast(count(*) as bigint) AS n_users,
        round(2 * {sixi} / ({n} * {sx}) - ({n} + 1) / {n}, 6) AS gini
    FROM ranked
    GROUP BY event_type
    ORDER BY event_type
    """


_pair(
    "agg_gini_value",
    _gini,
    tags=("agg", "domain"),
    doc="Gini coefficient of each event type's per-user value distribution "
    "(sorted-cumulative-share identity, deterministic rank tie-break on "
    "user_id) — reads the whole Lorenz curve where agg_holder_"
    "concentration's HHI weighs the top; together they are the standard "
    "concentration screen pair. One user-sum aggregation, one per-type "
    "rank window, DECIMAL-exact co-moments.",
)


# ---------------------------------------------------------------------------
# Forward as-of join (next observation at-or-after the anchor)
# ---------------------------------------------------------------------------


def _asof_next_oracle(d: str) -> str:
    # Deterministic argmin formulation (v.ts >= p.ts, nearest first, ties on
    # event_id) rather than DuckDB's native ASOF: with duplicate timestamps
    # the native operator's tie pick is unspecified, and the hash compare
    # needs one canonical winner on both engines.
    return f"""
    SELECT event_id, user_id, ts_s, purchase_value, next_view_value FROM (
        SELECT p.event_id, p.user_id,
            {S.fmt_ts('p.ts', d)} AS ts_s,
            p.value AS purchase_value,
            v.value AS next_view_value,
            row_number() OVER (
                PARTITION BY p.event_id ORDER BY v.ts, v.event_id
            ) AS rn
        FROM (SELECT * FROM events WHERE event_type = 'purchase') p
        LEFT JOIN (SELECT * FROM events WHERE event_type = 'view') v
            ON v.user_id = p.user_id AND v.ts >= p.ts
    ) r WHERE rn = 1
    ORDER BY event_id
    """


@register(
    "join_asof_next_view",
    oracle=_asof_next_oracle(DUCK),
    tags=("join", "window", "temporal"),
    doc="FORWARD as-of join: each purchase picks up the next view at or "
    "after its timestamp — the label-construction direction (outcome "
    "observed after feature time), mirror of join_asof_last_view's "
    "backward lookup. Same union+window scale shape: one shuffle on the "
    "user key, first(ignoreNulls) over the FOLLOWING frame, no per-user "
    "join fan-out; the oracle is the independent argmin-join form with "
    "deterministic tie-breaks.",
)
def join_asof_next_view(spark, sf_dir):
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    ev = static_table(spark, sf_dir, "events")
    # kind 0 = purchase, 1 = view: at equal ts the purchase row precedes
    # the views, so the FOLLOWING frame includes same-instant views —
    # matching the oracle's v.ts >= p.ts.
    purchases = ev.where(F.col("event_type") == "purchase").select(
        "user_id",
        "ts",
        F.lit(0).alias("kind"),
        "event_id",
        F.col("value").alias("purchase_value"),
        F.lit(None).cast("double").alias("view_value"),
    )
    views = ev.where(F.col("event_type") == "view").select(
        "user_id",
        "ts",
        F.lit(1).alias("kind"),
        "event_id",
        F.lit(None).cast("double").alias("purchase_value"),
        F.col("value").alias("view_value"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "kind", "event_id")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    from ..functions import scalars as S

    return (
        purchases.unionByName(views)
        .withColumn(
            "next_view_value", F.first("view_value", ignorenulls=True).over(w)
        )
        .where(F.col("kind") == 0)
        .select(
            "event_id",
            "user_id",
            F.expr(S.fmt_ts("ts")).alias("ts_s"),
            "purchase_value",
            "next_view_value",
        )
        .orderBy("event_id")
    )


# ---------------------------------------------------------------------------
# Conversion latency (first view → first purchase)
# ---------------------------------------------------------------------------


def _time_to_convert(d: str) -> str:
    e = S.epoch_s("ts", d)
    return f"""
    WITH firsts AS (
        SELECT user_id,
            min(CASE WHEN event_type = 'view' THEN {e} END) AS first_view,
            min(CASE WHEN event_type = 'purchase' THEN {e} END)
                AS first_purchase
        FROM events
        GROUP BY user_id
    ),
    bucketed AS (
        SELECT user_id,
            CASE
                WHEN first_view IS NULL THEN 'no_view'
                WHEN first_purchase IS NULL
                     OR first_purchase < first_view THEN 'never'
                WHEN first_purchase - first_view <= 3600 THEN 'lt_1h'
                WHEN first_purchase - first_view <= 86400 THEN 'lt_1d'
                WHEN first_purchase - first_view <= 604800 THEN 'lt_7d'
                ELSE 'gte_7d'
            END AS bucket,
            CASE WHEN first_view IS NOT NULL AND first_purchase
                      >= first_view
                 THEN first_purchase - first_view END AS latency_s
        FROM firsts
    )
    SELECT bucket,
        cast(count(*) as bigint) AS n_users,
        cast(min(latency_s) as bigint) AS min_latency_s,
        cast(max(latency_s) as bigint) AS max_latency_s
    FROM bucketed
    GROUP BY bucket
    ORDER BY bucket
    """


_pair(
    "events_time_to_convert",
    _time_to_convert,
    tags=("events", "temporal", "agg"),
    doc="Conversion latency: per user, seconds from first view to first "
    "purchase, bucketed (<1h, <1d, <7d, >=7d, never/no-view) with min/max "
    "per bucket — the survival-curve input of funnel analytics "
    "(events_funnel_stages counts stage reach; this measures HOW LONG "
    "conversion takes). One conditional-min aggregation per user, then a "
    "tiny bucket rollup; integer epoch arithmetic throughout.",
)


# ---------------------------------------------------------------------------
# LSH band/row (b, r) sensitivity audit
# ---------------------------------------------------------------------------


def _lsh_configs() -> list[tuple[int, int, str, float]]:
    # Every (b, r) factorization of the 16-hash signature, each with its
    # collision predicate over the m0..m15 per-position match bits and the
    # theoretical S-curve value 1 − (1 − 0.5^r)^b at J = 0.5.
    from .llm_ops import _N_HASHES

    out = []
    for b_bands in (16, 8, 4, 2):
        r_rows = _N_HASHES // b_bands
        collide = " OR ".join(
            "("
            + " AND ".join(f"m{band * r_rows + r}" for r in range(r_rows))
            + ")"
            for band in range(b_bands)
        )
        theo = round(1.0 - (1.0 - 0.5**r_rows) ** b_bands, 6)
        out.append((b_bands, r_rows, collide, theo))
    return out


def _lsh_flags_query(d: str) -> str:
    # dedup_minhash_lsh fixes (b=4, r=4) over the 16-hash signature; this
    # audit measures what THAT choice trades away, by re-partitioning the
    # same signatures into every (b, r) factorization — (16,1), (8,2),
    # (4,4), (2,8) — and counting, per config, the surfaced candidate pairs
    # and how many true near-dups (exact shingle Jaccard ≥ 0.5) each one
    # captures, next to the theoretical collision probability
    # 1 − (1 − 0.5^r)^b at J = 0.5. The candidate UNIVERSE is the (16,1)
    # single-hash collision set — a superset of every coarser config's
    # collisions, since an r-run of matching hashes implies each hash
    # matches individually — so every config's flag is computable from the
    # two signatures alone, with NO extra join: one 16-band capped
    # equi-join builds the universe, plain boolean algebra does the rest
    # (the audit_minhash_estimate machinery, re-aimed at parameter choice).
    # Returns the per-pair flag table (is_true + m0..m15); the aggregation
    # over it differs per engine — see audit_lsh_band_sensitivity.
    from .llm_ops import (
        _LSH_BUCKET_CAP,
        _MINHASH_AB,
        _MINHASH_P,
        _N_HASHES,
        _ngram_shingles,
    )

    shh = S.portable_hash64("sh", d)
    min_cols = ",\n            ".join(
        f"min(({a} * m + {b}) % {_MINHASH_P}) AS h{j}"
        for j, (a, b) in enumerate(_MINHASH_AB)
    )
    if d == SPARK:
        hash_arr = "array(" + ", ".join(f"h{j}" for j in range(_N_HASHES)) + ")"
        bands = f"""
        SELECT doc_id, band, band_key
        FROM sigs
        LATERAL VIEW posexplode({hash_arr}) AS band, band_key
        """
        doc_sets = (
            "SELECT doc_id, collect_set(shh) AS shs FROM sh_hashed GROUP BY doc_id"
        )
        n_inter = "size(array_intersect(sa.shs, sb.shs))"
        n_a, n_b = "size(sa.shs)", "size(sb.shs)"
    else:
        hash_arr = "[" + ", ".join(f"h{j}" for j in range(_N_HASHES)) + "]"
        bands = f"""
        SELECT doc_id, i AS band, {hash_arr}[i + 1] AS band_key
        FROM sigs, unnest(range(0, {_N_HASHES})) t(i)
        """
        doc_sets = (
            "SELECT doc_id, list(DISTINCT shh) AS shs FROM sh_hashed GROUP BY doc_id"
        )
        n_inter = "len(list_intersect(sa.shs, sb.shs))"
        n_a, n_b = "len(sa.shs)", "len(sb.shs)"
    jacc = f"cast({n_inter} as double) / ({n_a} + {n_b} - {n_inter})"

    match_bits = ",\n            ".join(
        f"a.h{j} = b.h{j} AS m{j}" for j in range(_N_HASHES)
    )

    return f"""
    WITH sh_hashed AS (
        SELECT doc_id, {shh} AS shh FROM ({_ngram_shingles(d)}) raw
    ),
    sigs AS (
        SELECT doc_id,
            {min_cols}
        FROM (SELECT doc_id, shh % {_MINHASH_P} AS m FROM sh_hashed) t
        GROUP BY doc_id
    ),
    bands AS (
        {bands}
    ),
    bands_capped AS (
        SELECT doc_id, band, band_key FROM (
            SELECT doc_id, band, band_key,
                count(*) OVER (PARTITION BY band, band_key) AS bsz
            FROM bands
        ) f WHERE bsz <= {_LSH_BUCKET_CAP}
    ),
    universe AS (
        SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        FROM bands_capped a
        JOIN bands_capped b ON a.band = b.band AND a.band_key = b.band_key
            AND a.doc_id < b.doc_id
    ),
    doc_sets AS ({doc_sets})
    SELECT u.doc_a, u.doc_b,
        ({jacc}) >= 0.5 AS is_true,
        {match_bits}
    FROM universe u
    JOIN sigs a ON a.doc_id = u.doc_a
    JOIN sigs b ON b.doc_id = u.doc_b
    JOIN doc_sets sa ON sa.doc_id = u.doc_a
    JOIN doc_sets sb ON sb.doc_id = u.doc_b
    """


def _lsh_oracle() -> str:
    # DuckDB materializes a multiply-referenced CTE once, so the pure-SQL
    # UNION-of-aggregates form is already single-pass there.
    branches = "\n    UNION ALL\n".join(
        f"""
    SELECT 'b{b:02d}r{r}' AS config, {b} AS n_bands, {r} AS rows_per_band,
        {S.isum(f'CASE WHEN {collide} THEN 1 ELSE 0 END', DUCK)} AS n_candidates,
        {S.isum(f'CASE WHEN ({collide}) AND is_true THEN 1 ELSE 0 END', DUCK)}
            AS n_true_captured,
        {S.isum('CASE WHEN is_true THEN 1 ELSE 0 END', DUCK)} AS n_true_universe,
        cast({theo} as double) AS theo_p_at_05
    FROM flags"""
        for b, r, collide, theo in _lsh_configs()
    )
    return f"""
    WITH flags AS ({_lsh_flags_query(DUCK)})
    SELECT * FROM ({branches}) c
    ORDER BY config
    """


@register(
    "audit_lsh_band_sensitivity",
    oracle=_lsh_oracle(),
    tags=("dedup", "audit", "sketch"),
    doc="LSH parameter-sensitivity audit: the production (b=4, r=4) banding "
    "of the 16-hash MinHash signature, re-evaluated against every other "
    "(b, r) factorization — (16,1), (8,2), (2,8) — over the single-hash "
    "collision universe (a superset of every coarser config, so each "
    "config's collision flag is pure boolean algebra on the two "
    "signatures: no extra joins beyond the one capped 16-band equi-join). "
    "Per config: surfaced candidate pairs, true near-dups captured (exact "
    "Jaccard ≥ 0.5), and the theoretical S-curve value 1−(1−0.5^r)^b — "
    "the measured evidence behind the banding choice, refreshable at any "
    "scale for the cost of one LSH pass. Spark side: the flag table is "
    "materialized ONCE (localCheckpoint — Spark inlines multiply-"
    "referenced CTEs, so the pure-SQL UNION form re-ran the whole "
    "shingle→minhash→join pipeline 4×: 24 file scans, measured 2.7 s → "
    "0.9 s at sf0.1), then ALL four configs aggregate in a single pass "
    "and stack() unpivots the one-row result.",
)
def audit_lsh_band_sensitivity(spark, sf_dir):
    from pyspark.sql import functions as F

    flags = spark.sql(_lsh_flags_query(SPARK)).localCheckpoint()
    aggs = []
    for b, r, collide, _theo in _lsh_configs():
        aggs.append(
            F.expr(S.isum(f"CASE WHEN {collide} THEN 1 ELSE 0 END", SPARK)).alias(
                f"c_{b}"
            )
        )
        aggs.append(
            F.expr(
                S.isum(f"CASE WHEN ({collide}) AND is_true THEN 1 ELSE 0 END", SPARK)
            ).alias(f"t_{b}")
        )
    aggs.append(
        F.expr(S.isum("CASE WHEN is_true THEN 1 ELSE 0 END", SPARK)).alias("tu")
    )
    one = flags.agg(*aggs)
    stack_args = ", ".join(
        f"'b{b:02d}r{r}', {b}, {r}, c_{b}, t_{b}, tu, cast({theo} as double)"
        for b, r, _collide, theo in _lsh_configs()
    )
    return one.selectExpr(
        f"stack(4, {stack_args}) AS (config, n_bands, rows_per_band, "
        "n_candidates, n_true_captured, n_true_universe, theo_p_at_05)"
    ).orderBy("config")
