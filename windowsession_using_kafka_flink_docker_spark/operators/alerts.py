"""Big-customer alerting — task2 parity (flink_stream_task2.py).

Reference behavior: after sessionization, keep sessions with
``session_sum >= 1_000_000`` (flink_stream_task2.py:81-83, a HAVING) and
emit each qualifying user at most once (the process-global ``printed_users``
set, flink_stream_task2.py:71-72,85-90). The reference's dedup is hidden
mutable state inside a map UDF; here it is a declarative first-per-user
pick, so it is distributed, restart-safe, and oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

#: Reference threshold (flink_stream_task2.py:82).
BIG_CUSTOMER_THRESHOLD = 1_000_000.0


def big_customer_alerts(sessions: DataFrame,
                        threshold: float = BIG_CUSTOMER_THRESHOLD,
                        key: str = "user_id") -> DataFrame:
    """First qualifying session per user, ordered by session start.

    Input is the output of ``sessionize``/``sessionize_dynamic``. The
    row_number window shuffles once on ``key`` — same partitioning the
    sessionization already produced, so Catalyst can reuse the exchange.
    """
    w = Window.partitionBy(key).orderBy("session_start", "session_end")
    return (
        sessions.where(F.col("session_sum") >= threshold)
        .withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_rn")
    )
