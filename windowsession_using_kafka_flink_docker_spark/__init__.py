"""windowsession_using_kafka_flink_docker_spark — a PySpark-native analytics engine.

A brand-new engine with the query/data-processing capabilities of the
reference project ``AkshayaNarsimha/Windowsession-using-kafka-flink-docker``
(a PyFlink user-session monitoring pipeline), re-expressed Spark-first:

- declarative DataFrame/SQL plans (Catalyst optimizes; Tungsten executes),
- native ``session_window`` sessionization (fixed + dynamic per-user gaps),
- Structured Streaming parity (watermarks, streaming dedup, Kafka I/O),
- large-scale training-data-pipeline operators (dedup families, similarity
  search, text analysis, multimodal column plumbing).

Everything here derives from the public Apache Spark API and the reference's
observable behavior only.
"""

from windowsession_using_kafka_flink_docker_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
