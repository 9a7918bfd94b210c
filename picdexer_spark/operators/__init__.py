from picdexer_spark.operators import (
    dashboards,
    geo,
    multimodal,
    similarity,
    textops,
)

__all__ = ["dashboards", "geo", "multimodal", "similarity", "textops"]
