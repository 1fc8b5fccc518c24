from windowsession_using_kafka_flink_docker_spark.plans.catalog import CATALOG, QuerySpec, oracle_sql, queries

__all__ = ["CATALOG", "QuerySpec", "queries", "oracle_sql"]
