from picdexer_spark.operators import dashboards, similarity, textops

__all__ = ["dashboards", "textops", "similarity"]
