from picdexer_spark.plans.audit import explain_str, count_exchanges, plan_report

__all__ = ["explain_str", "count_exchanges", "plan_report"]
