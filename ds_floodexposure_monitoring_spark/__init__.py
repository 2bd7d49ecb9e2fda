"""PySpark-native CDC / incremental-ingest analytics engine.

A from-scratch re-expression of the query and data-processing
capabilities of OCHA-DAP/ds-floodexposure-monitoring (reference at
/root/reference, see SURVEY.md) as an idiomatic PySpark engine:

- ``sources``    — changelog (WAL/binlog-tail) reader + Iceberg-semantics
                   lake table format (snapshots, atomic commit, schema
                   evolution, time travel) over parquet + JSON metadata.
- ``operators``  — dedup (last-writer-wins), MERGE INTO, skew handling,
                   schema evolution, as-of joins, near-dup detection
                   (MinHash/SimHash/n-gram Jaccard), similarity search.
- ``functions``  — vectorized column-expression libraries (text quality,
                   language id, token counting, fingerprinting, vector
                   math). No per-row Python UDFs anywhere.
- ``plans``      — the reference's query shapes (rollup, rolling windows,
                   rank/return-period, quantile bucketing, anti-join
                   update detection) as DataFrame plans with SQL oracles.
- ``streaming``  — micro-batch runner with exactly-once two-phase
                   commit (snapshot + checkpoint), lineage + metrics,
                   and a Structured Streaming adapter.
- ``datagen``    — deterministic seeded transcript change-log generator.
"""

__version__ = "0.1.0"
