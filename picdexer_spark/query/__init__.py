from picdexer_spark.query.bm25 import SearchEngine, idf as bm25_idf

__all__ = ["SearchEngine", "bm25_idf"]
