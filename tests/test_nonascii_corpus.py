"""Full-harness non-ASCII coverage: the driver's sf tables are ASCII-only,
so the byte-exact multimodal/text oracles never meet a multi-byte UTF-8
document in a CORRECTNESS window. This suite clones sf0.001 into a scratch
sf_dir, appends documents whose codepoints are 2/3/4 bytes wide (é, €,
emoji), and runs the REGISTERED query + oracle pairs through the same
``check_query`` hash-compare the driver uses — any char-vs-byte arithmetic
slip in either dialect shows up here before a driver round can mask it.
"""

from __future__ import annotations

import os
import shutil

import duckdb
import pytest

from rugpull_data_pipeline_spark.tmpdirs import scratch_dir

from .conftest import SF_SMOKE
from .oracle_harness import check_query

# Ops whose kernels/oracles walk text bytes or tokens — the ones the round-5
# byte-exact rewrite (plans/multimodal_q.py:186-240) exists to protect, plus
# the chunking/entropy text family the round-5 verdict named.
NONASCII_QUERIES = [
    "multimodal_resize_batch",
    "multimodal_window_energy",
    "text_chunk_sliding",
    "text_word_entropy",
    "text_whitespace_normalize",
    "text_winnow_fingerprint",
]

NONASCII_DOCS = [
    # (lang, source, text) — text mixes 1/2/3/4-byte UTF-8 codepoints so
    # byte offsets and char offsets disagree everywhere.
    ("fr", "src_nonascii", "héllo wörld é café naïve " * 6),
    ("de", "src_nonascii", "größe straße über 42€ preis " * 5),
    ("zh", "src_nonascii", "查询 引擎 数据 分组 排序 " * 8),
    ("es", "src_nonascii", "emoji \U0001f680 mix \U0001f4a9 tail " * 7),
    ("en", "src_nonascii", "plain ascii control document " * 4),
]


@pytest.fixture(scope="module")
def nonascii_sf_dir():
    d = scratch_dir("nonascii_sf_")
    for f in os.listdir(SF_SMOKE):
        if f.endswith(".parquet") and f != "documents.parquet":
            shutil.copyfile(os.path.join(SF_SMOKE, f), os.path.join(d, f))
    con = duckdb.connect()
    try:
        # COPY/CREATE VIEW can't take prepared parameters — inline literals
        # (texts contain no quote characters; assert to keep it that way).
        rows = []
        for i, (lang, source, text) in enumerate(NONASCII_DOCS):
            assert "'" not in text + lang + source
            rows.append(f"({i}, '{text}', '{lang}', '{source}')")
        base = os.path.join(SF_SMOKE, "documents.parquet")
        con.execute(
            f"""
            COPY (
                SELECT * FROM read_parquet('{base}')
                UNION ALL
                SELECT cast(1000 + idx as bigint) AS doc_id, text, lang, source,
                       cast(length(text) as bigint) AS n_chars
                FROM (VALUES {", ".join(rows)}) v(idx, text, lang, source)
                ORDER BY doc_id
            ) TO '{os.path.join(d, "documents.parquet")}' (FORMAT PARQUET)
            """
        )
    finally:
        con.close()
    return d


@pytest.mark.parametrize("name", NONASCII_QUERIES)
def test_query_matches_oracle_on_nonascii_corpus(spark, nonascii_sf_dir, name):
    problems = check_query(spark, name, nonascii_sf_dir)
    assert not problems, f"{name} on non-ASCII corpus: " + " | ".join(problems)
