from picdexer_spark.sources.catalog import IndexCatalog

__all__ = ["IndexCatalog"]
