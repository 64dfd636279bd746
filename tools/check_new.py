"""Ad-hoc harness: oracle-check a list of queries at a given sf_dir.

Usage: python tools/check_new.py [sf_dir] name1 name2 ...
With no names, checks every query registered by plans/analytics_ops.py.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests")
)

R9_NAMES = [
    "quality_t_closeness",
    "quality_k_suppression_plan",
    "quality_dp_sensitivity",
    "graph_sssp_bellman3",
    "graph_neighbor_jaccard",
    "graph_local_clustering",
    "graph_degree_powerlaw",
    "mlprep_kfold_assign",
    "mlprep_boosted_stumps2",
    "events_sequential_support",
    "events_dau_wau_mau",
    "layout_join_skew_advisor",
    "layout_encoding_advisor",
    "agg_geo_harmonic_mean",
    "agg_mode_peak_hour",
    "agg_column_covariance",
    "eval_pr_auc_trapezoid",
    "eval_ks_separation",
    "window_seasonal_strength",
    "window_realized_vol",
    "text_sentence_length_stats",
    "text_vocab_coverage",
    "profile_source_vocab_overlap",
    "sample_contrastive_pairs",
    "join_nearest_value_1d",
]


def main() -> int:
    args = sys.argv[1:]
    sf = args[0] if args and os.path.isdir(args[0]) else "/root/testdata/sf0.001"
    names = [a for a in args if not os.path.isdir(a)] or R9_NAMES

    from pyspark.sql import SparkSession

    from oracle_harness import check_query

    spark = (
        SparkSession.builder.master("local[8]")
        .appName("check-new")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.shuffle.partitions", "8")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    n_bad = 0
    for name in names:
        t0 = time.time()
        try:
            problems = check_query(spark, name, sf)
        except Exception as ex:  # noqa: BLE001
            problems = [f"EXCEPTION: {type(ex).__name__}: {str(ex)[:400]}"]
        dt = time.time() - t0
        if problems:
            n_bad += 1
            print(f"FAIL {name} ({dt:.1f}s): " + " | ".join(problems))
        else:
            print(f"ok   {name} ({dt:.1f}s)")
    print(f"{len(names) - n_bad}/{len(names)} green")
    return 1 if n_bad else 0


if __name__ == "__main__":
    sys.exit(main())
