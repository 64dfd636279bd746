"""rugpull_data_pipeline_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first re-expression of the query and data-processing
capabilities of the reference pipeline ``eshaanmathur157/RUGPULL_DATA_PIPELINE``
(a Solana rugpull-detection streaming dataflow; see SURVEY.md for the full
structural analysis), plus the LLM-training-data operators (dedup, similarity
search, multimodal columns, text analysis) a 100 TB pipeline needs.

Everything is declared through the DataFrame / Spark SQL API so Catalyst +
Tungsten choose the physical strategy; Python touches data only through
Arrow-vectorized Pandas UDFs, and only where built-ins genuinely cannot
express the semantics.

Layout:
    session     — SparkSession factory tuned for local[N] testing + cluster scale
    schemas     — explicit StructTypes (never infer on streams)
    sources     — testdata loaders, synthetic Solana-block JSON source
    functions   — scalar expression helpers shared by queries and oracles
    operators   — relational core, dedup, similarity, text analysis
    plans       — the query registry (queries() + DuckDB oracle twins)
    streaming   — Structured Streaming pipelines mirroring the reference's dataflow
    multimodal  — binary-column (image/audio) plumbing with stubbed codecs
"""

__version__ = "0.1.0"
