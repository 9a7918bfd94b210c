from picdexer_spark.query.bm25 import SearchEngine, idf as bm25_idf
from picdexer_spark.query.parser import parse_query_string

__all__ = ["SearchEngine", "bm25_idf", "parse_query_string"]
