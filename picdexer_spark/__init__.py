"""picdexer_spark — a PySpark-native inverted-index build + BM25 query engine.

A brand-new engine with the capabilities of barasher/picdexer (reference at
/root/reference, Go): an extract-then-index pipeline (reference:
cmd/assemble.go:98-162) plus the query surface the reference delegates to
Elasticsearch/Kibana (reference: internal/setup/assets/kibana.ndjson,
picdexer.json), re-expressed Spark-first over web-page tables:

- build side:  pages(url, warc_ts, html, text, lang)
               -> docs / postings / term_stats / metrics / lineage tables
- query side:  BM25 top-k (conjunctive & disjunctive) with block-max pruning,
               plus the Kibana-dashboard aggregation views (Q1-Q12).

Everything is DataFrame/SQL-first; custom algorithmic pieces (posting codec,
block-max WAND, BM25 determinism, head-term salting) live in vectorized
numpy/pandas code behind Arrow UDFs — never per-row Python.
"""

__version__ = "0.1.0"
