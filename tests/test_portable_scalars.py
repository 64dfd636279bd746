"""Property-based cross-engine checks for the portable scalar layer.

`portable_hash64` is the key primitive every dedup/sampling/split operator
derives its keys from — if Spark and DuckDB ever disagree on one input
string, whole query families silently diverge. Hypothesis drives
adversarial inputs (unicode, quotes, pipes, whitespace, empties) through
BOTH engines and requires bit-equal hashes.
"""

from __future__ import annotations

import duckdb
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from rugpull_data_pipeline_spark.functions import scalars as S
from rugpull_data_pipeline_spark.functions.scalars import DUCK, SPARK

# No NUL (parquet/JDBC-hostile) and no private-use planes; everything else
# printable-ish is fair game, including the '|' seed separator itself.
_TEXT = st.text(
    alphabet=st.characters(blacklist_categories=("Cs", "Co"), blacklist_characters="\x00"),
    min_size=0,
    max_size=60,
)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(st.lists(_TEXT, min_size=1, max_size=16, unique=True))
def test_portable_hash64_cross_engine(spark, texts):
    df = spark.createDataFrame([(t,) for t in texts], "s string")
    df.createOrReplaceTempView("hash_probe")
    got = {
        r["s"]: r["h"]
        for r in spark.sql(
            f"SELECT s, {S.portable_hash64('s', SPARK)} AS h FROM hash_probe"
        ).collect()
    }
    con = duckdb.connect()
    con.execute("CREATE TABLE t(s VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?)", [(t,) for t in texts])
    want = dict(
        con.execute(f"SELECT s, {S.portable_hash64('s', DUCK)} FROM t").fetchall()
    )
    assert got == want


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(_TEXT)
def test_portable_hash64_seeded_families_cross_engine(spark, text):
    """The seeded form (minhash's independent hash families) must also
    agree, and different seeds must disagree with overwhelming odds."""
    df = spark.createDataFrame([(text,)], "s string")
    df.createOrReplaceTempView("hash_probe_seeded")
    exprs = ", ".join(
        f"{S.portable_hash64('s', SPARK, seed=repr(seed))} AS h{i}"
        for i, seed in enumerate(["mh-0", "mh-1"])
    )
    row = spark.sql(f"SELECT {exprs} FROM hash_probe_seeded").collect()[0]
    con = duckdb.connect()
    con.execute("CREATE TABLE t(s VARCHAR)")
    con.execute("INSERT INTO t VALUES (?)", [text])
    dexprs = ", ".join(
        S.portable_hash64("s", DUCK, seed=repr(seed))
        for seed in ["mh-0", "mh-1"]
    )
    drow = con.execute(f"SELECT {dexprs} FROM t").fetchone()
    assert (row["h0"], row["h1"]) == drow
    assert row["h0"] != row["h1"]


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    st.lists(st.integers(0, 99), min_size=0, max_size=20),
    st.integers(1, 25),
    st.integers(1, 12),
)
def test_arr_slice_cross_engine(spark, xs, start, length):
    """arr_slice must clamp identically in both engines at every boundary:
    start past the end, slice running off the tail, empty arrays."""
    arr_sql = "array(" + ", ".join(str(x) for x in xs) + ")" if xs else "array()"
    spark_expr = S.arr_slice(f"cast({arr_sql} as array<int>)", str(start), str(length), SPARK)
    got = spark.sql(f"SELECT {spark_expr} AS v").collect()[0]["v"]
    duck_arr = "[" + ", ".join(str(x) for x in xs) + "]"
    duck_expr = S.arr_slice(f"{duck_arr}::INT[]", str(start), str(length), DUCK)
    want = duckdb.connect().execute(f"SELECT {duck_expr}").fetchone()[0]
    assert list(got or []) == list(want or []) == xs[start - 1 : start - 1 + length]


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(st.integers(-3, 3), st.integers(-1, 6))
def test_explode_seq_cross_engine(spark, lo, span):
    """explode_seq must produce the identical inclusive integer range in
    both dialects (DuckDB's range() is end-exclusive — the helper papers
    over that; a negative span means an empty range in... neither engine:
    sequence(a, b) with b < a counts DOWN in Spark, so the helper is only
    ever called with lo <= hi — pin that contract here)."""
    hi = lo + max(span, 0)
    got = [
        r["i"]
        for r in spark.sql(
            f"SELECT i FROM (SELECT 1 AS x) t {S.explode_seq('i', str(lo), str(hi), SPARK)} ORDER BY i"
        ).collect()
    ]
    want = [
        r[0]
        for r in duckdb.connect()
        .execute(f"SELECT i FROM (SELECT 1 AS x) t {S.explode_seq('i', str(lo), str(hi), DUCK)} ORDER BY i")
        .fetchall()
    ]
    assert got == want == list(range(lo, hi + 1))


def _bpe_greedy_merge(toks: list[str], pa: str, pb: str) -> list[str]:
    """Reference BPE merge application: greedy leftmost, non-overlapping."""
    out, i = [], 0
    while i < len(toks):
        if i + 1 < len(toks) and toks[i] == pa and toks[i + 1] == pb:
            out.append(pa + pb)
            i += 2
        else:
            out.append(toks[i])
            i += 1
    return out


@settings(max_examples=100, deadline=None)
@given(
    toks=st.lists(st.sampled_from(["a", "b", "ab", "x"]), min_size=1, max_size=12),
    pa=st.sampled_from(["a", "b", "ab"]),
    pb=st.sampled_from(["a", "b", "ab"]),
)
def test_bpe_replace_trick_equals_greedy_merge(toks, pa, pb):
    """mlprep_ops._bpe_round2 applies a merge via replace() over a
    double-space-delimited string (each token owns BOTH its delimiters).
    Property: for ANY token stream and merge pair — including adjacent
    runs and pairs whose concatenation collides with an existing token —
    the trick equals the reference greedy leftmost non-overlapping merge."""
    s = " " + "  ".join(toks) + " "
    pat = f" {pa}  {pb} "
    rep = f" {pa}{pb} "
    got_s = duckdb.sql(
        "SELECT replace(?, ?, ?) AS s", params=[s, pat, rep]
    ).fetchone()[0]
    got = got_s.strip().split("  ") if got_s.strip() else []
    assert got == _bpe_greedy_merge(toks, pa, pb)
