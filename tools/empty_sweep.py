"""Empty-input robustness sweep: every registered query run against
EMPTY tables, on both engines.

At 100 TB some slice is always empty — a day partition with no events, a
source with no documents after filtering. The round-6 divergence audit
(SCALE.md) showed ANSI Spark and DuckDB disagree violently on the edge
cases an empty input reaches (`x / count(*)` THROWS on Spark when the
count is 0, returns NULL on DuckDB; DuckDB's `sqrt`/`ln` THROW where
Spark yields NaN/NULL). This sweep classifies every query:

    ok         both engines run; same row count AND same normalized values
               (the driver's sort-columns/sort-rows exact compare, via
               tests.oracle_harness.compare — row-count-only `ok` hid the
               HITS 0.0-vs-NULL divergence; ADVICE r6)
    val-diff   both run, same row count, value-level divergence
    rows-diff  both run; row counts differ (semantic divergence)
    explained  would be val-/rows-diff, but the query carries a
               `sweep:<reason>` registry tag documenting a known,
               deliberate engine divergence (currently the ROLLUP/CUBE/
               GROUPING SETS class: on an EMPTY relation DuckDB emits the
               grand-total `()` row, Spark emits nothing — Spark's
               behavior is this engine's behavior; SCALE.md r6 sweep #1)
    spark-err  Spark throws, DuckDB runs   (ANSI landmine)
    duck-err   DuckDB throws, Spark runs   (oracle landmine)
    both-err   both throw

Modes (one per degenerate surface; default is empty tables):

    python tools/empty_sweep.py                  # zero-row tables
    python tools/empty_sweep.py --null-values    # events.value all NULL
    python tools/empty_sweep.py --zero-vectors   # embeddings all-zero
    python tools/empty_sweep.py --empty-text     # documents.text all ''
    python tools/empty_sweep.py --single-row     # min-key row per table
    python tools/empty_sweep.py --hot-key        # all events on ONE user
    python tools/empty_sweep.py --single-type    # all events one type
    python tools/empty_sweep.py --constant-time  # all events.ts identical
    python tools/empty_sweep.py --negative-values # events.value all < 0
    python tools/empty_sweep.py --skewed-duplicates # Zipf keys x tied ts x tied values
    python tools/empty_sweep.py --giant-payloads # 1 MB doc, 10^4-dim vectors, nested props
    python tools/empty_sweep.py --unicode-text   # multilingual gauntlet on every doc
    python tools/empty_sweep.py --duplicate-storm # every row of every table x8

Exit 0 iff every query is `ok` or `explained`. (The round-6 self-sourced
streaming-replay artifact class no longer exists: the replays read the
substituted `events` VIEW since round 7, so the sweeps genuinely reach
them.)
"""

from __future__ import annotations

import argparse
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF = os.environ.get("SPARK_GRAFT_EMPTY_SF", "/root/testdata/sf0.001")


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--only", nargs="*", default=None, help="name-prefix filter")
    ap.add_argument("--start", type=int, default=0)
    ap.add_argument(
        "--null-values",
        action="store_true",
        help="instead of empty tables: real tables but events.value all NULL "
        "(count(*) > 0 while count(value) = 0 — a different degenerate "
        "surface; found the EWMA weight-sum ANSI divide)",
    )
    ap.add_argument(
        "--zero-vectors",
        action="store_true",
        help="instead of empty tables: real tables but every embedding "
        "all-zero (0-norm cosine surface; found 10 unguarded cosine "
        "divisions in the similarity family)",
    )
    ap.add_argument(
        "--empty-text",
        action="store_true",
        help="instead of empty tables: real tables but documents.text all "
        "'' (single-empty-token surface; found the PMI descending-"
        "sequence ANSI element_at and the 1-term Zipf-fit divide)",
    )
    ap.add_argument(
        "--single-row",
        action="store_true",
        help="instead of empty tables: every table cut to its min-key row "
        "(single-point statistics surface; found 7 single-class/empty-"
        "arm ANSI divides: AUC, threshold sweep, Brier skill, ridge R2, "
        "KS, Simpson rates, 1-centroid kmeans least())",
    )
    ap.add_argument(
        "--hot-key",
        action="store_true",
        help="instead of empty tables: real tables but every event on ONE "
        "user_id (the maximal-skew surface: a single giant per-user "
        "window partition, one group in user-keyed aggs, one graph node "
        "fan-in; durable form of the round-6 hot-key probes)",
    )
    ap.add_argument(
        "--single-type",
        action="store_true",
        help="instead of empty tables: real tables but every event_type "
        "'click' (single-category surface: no transition diversity for "
        "Markov/graph edges, one stratum for samplers, one class for "
        "evals; durable form of the round-6 single-type probes)",
    )
    ap.add_argument(
        "--constant-time",
        action="store_true",
        help="instead of empty tables: real tables but every events.ts the "
        "SAME instant (zero time spread: every daily/hourly grid collapses "
        "to one bucket, interarrival gaps are 0, window spans are a point "
        "— the constant-TIME complement of the constant-value surfaces)",
    )
    ap.add_argument(
        "--negative-values",
        action="store_true",
        help="instead of empty tables: real tables but every events.value "
        "strictly negative (-abs(value)-1): drives every signed-division, "
        "sqrt-of-sum and ln(value) path corpus-wide — DuckDB THROWS on "
        "sqrt/ln of negatives where Spark yields NaN/NULL, the r6 "
        "divergence matrix's other half)",
    )
    ap.add_argument(
        "--skewed-duplicates",
        action="store_true",
        help="instead of empty tables: Zipf-distributed duplicate KEYS with "
        "tied timestamps AND tied values — hot-key x constant-time x "
        "constant-value combined (user_id = 1000 // (1 + event_id %% "
        "1000): key 1 carries ~half the rows, harmonic tail; one shared "
        "ts instant; one shared value). Targets order-dependent "
        "tie-breaks in top-k/rank/argmax/fold queries: with every "
        "ordering column tied, any nondeterministic winner diverges "
        "between engines (the surface class that caught the r7 "
        "price-fold emission bug)",
    )
    ap.add_argument(
        "--giant-payloads",
        action="store_true",
        help="instead of empty tables: pathological per-row PAYLOAD sizes — "
        "doc_id 42's text inflated past 1 MB (token-preserving repeat; "
        "exactly ONE giant so the length-bucketed Levenshtein block can "
        "never meet two megabyte strings), EVERY embedding repeated to "
        "10,048 elements (uniform dim — mixed dims would probe engine "
        "zip padding, not a real corpus shape), and events.props wrapped "
        "in 10 levels of JSON nesting. The ten prior surfaces stress "
        "keys/values/time; none stressed per-row payload size — the "
        "remaining 100 TB corpus hazard class (a giant-row OOM or a "
        "quadratic per-row array op hides at sf0.01)",
    )
    ap.add_argument(
        "--unicode-text",
        action="store_true",
        help="instead of empty tables: every documents.text prefixed with a "
        "fixed multilingual gauntlet — combining marks vs precomposed "
        "(cafe\\u0301 vs caf\\u00e9), 4-byte non-BMP emoji (surrogate "
        "pairs in UTF-16 engines), CJK, Greek, Cyrillic, RTL Hebrew, "
        "Turkish dotted-I and German eszett (the classic case-mapping "
        "traps), full-width digits — the eleven prior surfaces stress "
        "keys/values/time/payload-SIZE; none stressed payload CONTENT "
        "encoding, where code-point vs byte vs grapheme length, case "
        "mapping, and regex word-class semantics can silently diverge "
        "between engines over a real multilingual 100 TB corpus",
    )
    ap.add_argument(
        "--duplicate-storm",
        action="store_true",
        help="instead of empty tables: every row of the FACT/corpus "
        "tables (lineitem, events, documents, embeddings) duplicated 8x "
        "with byte-identical CONTENT but FRESH surrogate ids (event_id/"
        "doc_id/vec_id offset per copy) — the real crawled-corpus "
        "multiplicity scenario: the same document, event, or vector "
        "arriving many times under different identities. Identity "
        "columns must stay unique because ~23 operators carry key "
        "contracts on them (dedup fixpoints, winnowing, stateful "
        "replays, blob fixtures keyed by doc_id) and a COLLIDING "
        "duplicate makes builder-vs-oracle algebra legitimately "
        "disagree — that tests the surface, not the engines. Dims keep "
        "their primary keys for the same reason (agg-then-join vs "
        "join-then-agg multiplicity, seen on the flagship builder). "
        "Targets: count-sensitive statistics with x8 multiplicities, "
        "dedup operators on exact-duplicate CONTENT (the thing they "
        "exist for), rank/top-k with >k content-identical candidates, "
        "and self-join fan-out guards (8x rows -> 64x candidate pairs; "
        "caps and DISTINCT-first pair builds must absorb it)",
    )
    args = ap.parse_args()

    import duckdb

    import __spark_entry__ as e
    from rugpull_data_pipeline_spark.plans import registry
    from rugpull_data_pipeline_spark.session import get_spark
    from rugpull_data_pipeline_spark.sources.tables import TABLES, register_views

    from pyspark.sql import functions as F

    spark = get_spark(app_name="empty-sweep")
    # real schemas (incl. the event-time normalization), zero rows; then pin
    # the registry's view cache so builders don't re-register the full views
    register_views(spark, SF)
    con = duckdb.connect()
    if args.duplicate_storm:
        # 8x content duplication with fresh surrogate ids on BOTH
        # engines (see the --duplicate-storm help). Offsets are far
        # above every sf's key domain, integer-exact in both engines.
        id_col = {"events": "event_id", "documents": "doc_id",
                  "embeddings": "vec_id", "lineitem": None}
        for t in TABLES:
            if t not in id_col:
                con.execute(
                    f"CREATE VIEW {t} AS SELECT * FROM"
                    f" read_parquet('{SF}/{t}.parquet')"
                )
                continue
            key = id_col[t]
            dup = spark.table(t).withColumn(
                "_dup", F.explode(F.expr("sequence(0, 7)"))
            )
            if key is not None:
                dup = dup.withColumn(
                    key,
                    F.col(key) + F.col("_dup") * F.lit(10**12).cast("long"),
                )
            dup.drop("_dup").createOrReplaceTempView(t)
            if key is None:
                con.execute(
                    f"CREATE VIEW {t} AS SELECT t.* FROM"
                    f" read_parquet('{SF}/{t}.parquet') t,"
                    " range(8) AS d(i)"
                )
            else:
                con.execute(
                    f"CREATE VIEW {t} AS SELECT t.* REPLACE"
                    f" (t.{key} + d.i * 1000000000000 AS {key}) FROM"
                    f" read_parquet('{SF}/{t}.parquet') t,"
                    " range(8) AS d(i)"
                )
    elif args.skewed_duplicates:
        # All three tie surfaces at once: Zipf-skewed duplicate keys,
        # one shared timestamp, one shared value. Integer-only key math so
        # both engines derive the identical distribution.
        spark.table("events").withColumns(
            {
                "user_id": F.expr("1000 div (1 + (event_id % 1000))"),
                "ts": F.lit("2024-01-01 00:00:00").cast("timestamp"),
                "value": F.lit(7.5),
            }
        ).createOrReplaceTempView("events")
        for t in TABLES:
            if t == "events":
                con.execute(
                    "CREATE VIEW events AS SELECT * REPLACE ("
                    "1000 // (1 + (event_id % 1000)) AS user_id, "
                    "TIMESTAMP '2024-01-01 00:00:00' AS ts, "
                    "7.5 AS value)"
                    f" FROM read_parquet('{SF}/events.parquet')"
                )
            else:
                con.execute(
                    f"CREATE VIEW {t} AS SELECT * FROM"
                    f" read_parquet('{SF}/{t}.parquet')"
                )
    elif args.giant_payloads:
        # Token-preserving inflation: text || ' ' repeated until >= 1 MiB.
        # Integer-only repeat-count math (div) so both engines build the
        # byte-identical string; n_chars re-derived from the new text.
        rep = "cast(1 + (1048576 div (length(text) + 1)) as int)"
        spark.table("documents").withColumn(
            "text",
            F.expr(
                "CASE WHEN doc_id = 42 AND length(text) > 0 "
                f"THEN repeat(concat(text, ' '), {rep}) ELSE text END"
            ),
        ).withColumn("n_chars", F.length("text").cast("long")).localCheckpoint(
        ).createOrReplaceTempView("documents")
        spark.table("embeddings").withColumn(
            "embedding", F.expr("flatten(array_repeat(embedding, 157))")
        ).createOrReplaceTempView("embeddings")
        # Keep the corpus's $.k contract intact (queries hard-cast it) and
        # hang a 12-level subtree NEXT to it — the surface tests parser
        # depth and row width, not a schema break.
        spark.table("events").withColumn(
            "props",
            F.expr(
                "concat('{\"k\": ',"
                " coalesce(get_json_object(props, '$.k'), 'null'),"
                " ', \"nest\": ', repeat('{\"a\":', 12), '1',"
                " repeat('}', 12), '}')"
            ),
        ).createOrReplaceTempView("events")
        for t in TABLES:
            if t == "documents":
                con.execute(
                    "CREATE VIEW documents AS SELECT * REPLACE"
                    " (cast(length(text) as bigint) AS n_chars) FROM ("
                    "SELECT * REPLACE (CASE WHEN doc_id = 42 AND length(text) > 0"
                    " THEN repeat(text || ' ',"
                    " cast(1 + (1048576 // (length(text) + 1)) as int))"
                    " ELSE text END AS text)"
                    f" FROM read_parquet('{SF}/documents.parquet')) t"
                )
            elif t == "embeddings":
                con.execute(
                    "CREATE VIEW embeddings AS SELECT vec_id,"
                    " flatten(list_transform(range(157), x -> embedding))"
                    " AS embedding, label"
                    f" FROM read_parquet('{SF}/embeddings.parquet')"
                )
            elif t == "events":
                con.execute(
                    "CREATE VIEW events AS SELECT * REPLACE"
                    " ('{\"k\": ' ||"
                    " coalesce(json_extract_string(props, '$.k'), 'null') ||"
                    " ', \"nest\": ' || repeat('{\"a\":', 12) || '1' ||"
                    " repeat('}', 12) || '}' AS props)"
                    f" FROM read_parquet('{SF}/events.parquet')"
                )
            else:
                con.execute(
                    f"CREATE VIEW {t} AS SELECT * FROM"
                    f" read_parquet('{SF}/{t}.parquet')"
                )
    elif args.unicode_text:
        # One fixed gauntlet prefixed to EVERY document, built from python
        # escapes so the exact code points are pinned in source; passed to
        # both engines as a parameter/UTF-8 literal so the bytes are
        # identical by construction. ASCII-space separated so tokenizers
        # see it as ordinary tokens. No NULs or lone surrogates: those are
        # not valid parquet/UTF-8 payloads, not an engine-divergence class.
        gauntlet = (
            "caf\u00e9 cafe\u0301 "  # precomposed vs combining acute
            "\U0001f9ea\U0001f600 "  # non-BMP emoji (4-byte UTF-8)
            "漢字 "  # CJK
            "Στίγμας "  # Greek, final sigma
            "слово "  # Cyrillic
            "שלום "  # RTL Hebrew
            "İstanbul ß "  # dotted-I + eszett case traps
            "１２３"  # full-width digits
        )
        spark.table("documents").withColumn(
            "text", F.concat(F.lit(gauntlet + " "), F.col("text"))
        ).withColumn("n_chars", F.length("text").cast("long")).localCheckpoint(
        ).createOrReplaceTempView("documents")
        for t in TABLES:
            if t == "documents":
                # Inline literal (DuckDB forbids bound params in CREATE
                # VIEW); the gauntlet contains no quotes by construction.
                con.execute(
                    "CREATE VIEW documents AS SELECT * REPLACE"
                    " (cast(length(text) as bigint) AS n_chars) FROM ("
                    f"SELECT * REPLACE ('{gauntlet} ' || text AS text)"
                    f" FROM read_parquet('{SF}/documents.parquet')) t"
                )
            else:
                con.execute(
                    f"CREATE VIEW {t} AS SELECT * FROM"
                    f" read_parquet('{SF}/{t}.parquet')"
                )
    elif (args.hot_key or args.single_type or args.constant_time
            or args.negative_values):
        if args.hot_key:
            col, lit_spark, lit_duck = (
                "user_id", F.lit(1).cast("long"), "cast(1 as bigint) AS user_id"
            )
        elif args.single_type:
            col, lit_spark, lit_duck = (
                "event_type", F.lit("click"), "'click' AS event_type"
            )
        elif args.negative_values:
            col, lit_spark, lit_duck = (
                "value",
                -F.abs(F.col("value")) - F.lit(1.0),
                "-abs(value) - 1.0 AS value",
            )
        else:
            col, lit_spark, lit_duck = (
                "ts",
                F.lit("2024-01-01 00:00:00").cast("timestamp"),
                "TIMESTAMP '2024-01-01 00:00:00' AS ts",
            )
        spark.table("events").withColumn(col, lit_spark).createOrReplaceTempView(
            "events"
        )
        for t in TABLES:
            if t == "events":
                con.execute(
                    f"CREATE VIEW events AS SELECT * REPLACE ({lit_duck})"
                    f" FROM read_parquet('{SF}/events.parquet')"
                )
            else:
                con.execute(
                    f"CREATE VIEW {t} AS SELECT * FROM"
                    f" read_parquet('{SF}/{t}.parquet')"
                )
    elif args.null_values:
        spark.table("events").withColumn(
            "value", F.lit(None).cast("double")
        ).createOrReplaceTempView("events")
        for t in TABLES:
            if t == "events":
                con.execute(
                    "CREATE VIEW events AS SELECT * REPLACE"
                    " (cast(NULL as double) AS value)"
                    f" FROM read_parquet('{SF}/events.parquet')"
                )
            else:
                con.execute(
                    f"CREATE VIEW {t} AS SELECT * FROM"
                    f" read_parquet('{SF}/{t}.parquet')"
                )
    elif args.single_row:
        keys = {
            "region": "r_regionkey", "nation": "n_nationkey",
            "customer": "c_custkey", "supplier": "s_suppkey",
            "part": "p_partkey", "orders": "o_orderkey",
            "lineitem": "l_orderkey, l_linenumber", "events": "event_id",
            "documents": "doc_id", "embeddings": "vec_id",
        }
        for t in TABLES:
            spark.sql(
                f"SELECT * FROM {t} ORDER BY {keys[t]} LIMIT 1"
            ).localCheckpoint().createOrReplaceTempView(t)
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM"
                f" read_parquet('{SF}/{t}.parquet')"
                f" ORDER BY {keys[t]} LIMIT 1"
            )
    elif args.empty_text:
        spark.table("documents").withColumn("text", F.lit("")).withColumn(
            "n_chars", F.lit(0)
        ).createOrReplaceTempView("documents")
        for t in TABLES:
            if t == "documents":
                con.execute(
                    "CREATE VIEW documents AS SELECT * REPLACE"
                    " ('' AS text, 0 AS n_chars)"
                    f" FROM read_parquet('{SF}/documents.parquet')"
                )
            else:
                con.execute(
                    f"CREATE VIEW {t} AS SELECT * FROM"
                    f" read_parquet('{SF}/{t}.parquet')"
                )
    elif args.zero_vectors:
        spark.table("embeddings").withColumn(
            "embedding", F.expr("transform(embedding, x -> cast(0.0 as float))")
        ).createOrReplaceTempView("embeddings")
        for t in TABLES:
            if t == "embeddings":
                con.execute(
                    "CREATE VIEW embeddings AS SELECT vec_id,"
                    " list_transform(embedding, x -> cast(0.0 as float))"
                    " AS embedding, label"
                    f" FROM read_parquet('{SF}/embeddings.parquet')"
                )
            else:
                con.execute(
                    f"CREATE VIEW {t} AS SELECT * FROM"
                    f" read_parquet('{SF}/{t}.parquet')"
                )
    else:
        for t in TABLES:
            spark.table(t).limit(0).createOrReplaceTempView(t)
        for t in TABLES:
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM"
                f" read_parquet('{SF}/{t}.parquet') WHERE 1 = 0"
            )
    registry._VIEWS_FOR[id(spark)] = SF

    qs, osql = e.queries(), e.oracle_sql()
    names = [
        n
        for n in qs
        if args.only is None or any(n.startswith(p) for p in args.only)
    ][args.start :]

    sys.path.insert(0, os.path.join(REPO, "tests"))
    from oracle_harness import compare as _value_compare

    # Per-engine watchdog: a query that hangs (the quadratic/inlining
    # classes the degenerate surfaces hunt) must surface as an ERROR row,
    # not block the whole sweep. DuckDB honors con.interrupt() from
    # another thread; Spark honors cancelJobGroup.
    import threading

    deadline_s = int(os.environ.get("SPARK_GRAFT_SWEEP_TIMEOUT", "420"))

    def _with_deadline(run, cancel, drain=None):
        # Round-9 ADVICE race fix: the timer callback checks a done flag
        # UNDER A LOCK and holds the lock THROUGH cancel(), while the
        # finally path takes the same lock before marking done — so a
        # cancel can never land after run() completed without us knowing
        # (state["fired"]), and a cancel that did land post-completion is
        # drained (stale DuckDB interrupt flag) before the next query.
        # Timeout classification uses the fired flag, never
        # exception-text substring matching.
        lock = threading.Lock()
        state = {"done": False, "fired": False}

        def _cancel():
            with lock:
                if state["done"]:
                    return
                state["fired"] = True
                try:
                    cancel()
                except Exception:  # noqa: BLE001 - watchdog must not raise
                    pass

        timer = threading.Timer(deadline_s, _cancel)
        timer.start()
        try:
            result, err = run(), None
        except Exception as ex:  # noqa: BLE001
            result = None
            err = f"{type(ex).__name__}: {str(ex).splitlines()[0][:110]}"
        finally:
            with lock:
                state["done"] = True
            timer.cancel()
        if state["fired"]:
            if drain is not None:
                try:
                    drain()
                except Exception:  # noqa: BLE001 - swallowing the poison
                    pass
            err = f"TIMEOUT>{deadline_s}s: " + (err or "cancelled")
            result = None
        return result, err

    tallies: dict[str, list] = {}
    for i, name in enumerate(names):
        t0 = time.time()
        group = f"sweep-{name}"
        spark.sparkContext.setJobGroup(group, name, interruptOnCancel=True)
        s_pdf, s_err = _with_deadline(
            lambda: qs[name](spark, SF).toPandas(),
            lambda: spark.sparkContext.cancelJobGroup(group),
        )
        d_pdf = d_err = None
        if name in osql:
            d_pdf, d_err = _with_deadline(
                lambda: con.execute(osql[name]).fetchdf(),
                con.interrupt,
                drain=lambda: con.execute("SELECT 1").fetchall(),
            )
        s_rows = None if s_pdf is None else len(s_pdf)
        d_rows = None if d_pdf is None else len(d_pdf)
        val_note = ""
        if s_err and d_err:
            kind = "both-err"
        elif s_err:
            kind = "spark-err"
        elif d_err:
            kind = "duck-err"
        elif name in osql and s_rows != d_rows:
            kind = "rows-diff"
        elif name in osql:
            problems = _value_compare(s_pdf, d_pdf)
            if problems:
                kind = "val-diff"
                val_note = " | ".join(problems)[:160]
            else:
                kind = "ok"
        else:
            kind = "ok"  # nosql query: rows-only check, like the driver's
        if kind in ("rows-diff", "val-diff"):
            sweep_tags = [
                t for t in registry.get(name).tags if t.startswith("sweep:")
            ]
            if sweep_tags:
                kind = "explained"
                val_note = f"[{sweep_tags[0]}] " + (val_note or f"{s_rows} vs {d_rows} rows")
        tallies.setdefault(kind, []).append(name)
        detail = s_err or d_err or val_note or f"{s_rows} rows"
        print(
            f"[{i + 1 + args.start:3d}/{len(names) + args.start}] "
            f"{kind:9s} {name} ({time.time() - t0:.1f}s) {detail}",
            flush=True,
        )

    print("\nEMPTY SWEEP SUMMARY")
    for kind in ("ok", "explained", "val-diff", "rows-diff",
                 "spark-err", "duck-err", "both-err"):
        if kind in tallies:
            print(f"  {kind:9s} {len(tallies[kind])}")
            if kind != "ok":
                for n in tallies[kind]:
                    print(f"      {n}")
    return 0 if set(tallies) <= {"ok", "explained"} else 1


if __name__ == "__main__":
    sys.exit(main())
