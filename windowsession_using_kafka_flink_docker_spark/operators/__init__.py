from windowsession_using_kafka_flink_docker_spark.operators.sessionize import (
    DEFAULT_GAP,
    TIER_GAPS,
    dynamic_gap_expr,
    sessionize,
    sessionize_dynamic,
)
from windowsession_using_kafka_flink_docker_spark.operators.alerts import big_customer_alerts

__all__ = [
    "DEFAULT_GAP",
    "TIER_GAPS",
    "dynamic_gap_expr",
    "sessionize",
    "sessionize_dynamic",
    "big_customer_alerts",
]
