from picdexer_spark.oracle.reference import OracleIndex, K1, B

__all__ = ["OracleIndex", "K1", "B"]
