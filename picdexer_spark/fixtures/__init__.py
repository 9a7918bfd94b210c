from picdexer_spark.fixtures.pages import (
    gen_pages,
    gen_queries,
    materialize_pages,
    PAGES_SCHEMA,
)

__all__ = ["gen_pages", "gen_queries", "materialize_pages", "PAGES_SCHEMA"]
