"""Synthetic event generator — S2 parity (generator1.py:14-51).

The reference produces 4 workload phases of CSV records
``"ts,userID,sessionID,payload"`` with ``payload = userID * 10``
(generator1.py:20-21), drawing users from per-phase tenant lists
(generator1.py:35-51). Phase 4 funnels 100 000 events into a single user —
a built-in hot-key skew test.

Design difference with a purpose: the reference draws from ``random``
sequentially, which no declarative engine can replay. This port is
**closed-form deterministic** — event *i* of a phase derives its user and
transaction id from an indexed LCG hash (``(a*i + b) mod 2^31``), and its
timestamp from ``phase_start + i/eps`` — so the identical event stream is
expressible as pure Spark column expressions AND as a DuckDB CTE. That
turns generator-driven pipelines into oracle-checkable queries (the
driver's hash gate covers them) instead of eyeball-only demos, and it
generates distributed: ``spark.range(n)`` partitions the index space, no
driver-side loop, no Python per event — 10^11 events would generate the
same way on 1000 executors.

Arrival-time model: events within a phase land ``1/events_per_second``
apart (the reference's effective inter-arrival spacing, generator1.py:29 —
its simulated +1-10min clock is parsed-and-ignored by the consumers, see
SURVEY.md §1.4); phases are spaced 1 hour apart so each phase's sessions
close before the next begins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: The 4 reference workload phases (generator1.py:35-51):
#: (events_per_second, total_events, tenant user ids).
PHASES: tuple[tuple[int, int, tuple[int, ...]], ...] = (
    (1000, 1000, (4, 1, 5, 8, 100, 101, 198, 212, 213, 214, 301, 1000, 1990, 9999)),
    (10, 100, (4,)),
    (100, 3000, (1, 198, 1990)),
    (100, 100_000, (4,)),  # hot-key skew phase (generator1.py:51)
)

#: Reference simulation start (generator1.py:16) as epoch microseconds UTC.
BASE_US = 1_724_659_200_000_000  # 2024-08-26 08:00:00 UTC

#: Inter-phase spacing (µs) — 1 hour, far beyond every session gap tier.
PHASE_SPACING_US = 3_600_000_000

# Indexed-LCG constants (numerical-recipes family); evaluated on the event
# index, not sequentially, so any engine reproduces the stream.
_LCG_A, _LCG_B, _LCG_M = 1103515245, 12345, 1 << 31
_TX_A, _TX_B = 69069, 1


def generated_events(spark: SparkSession,
                     phases=PHASES) -> DataFrame:
    """The full 4-phase event stream as a DataFrame:
    (phase, ts, user_id, transaction_id, value).

    ``value`` is the wire payload (= user_id * 10, generator1.py:20) in the
    driver's ``events``-table column naming so the sessionization operators
    apply unchanged.
    """
    frames = []
    for p, (eps, n, users) in enumerate(phases):
        step_us = 1_000_000 // eps
        base = BASE_US + p * PHASE_SPACING_US
        user_arr = F.array(*[F.lit(u).cast("bigint") for u in users])
        lcg = (F.lit(_LCG_A) * F.col("id") + F.lit(_LCG_B)) % F.lit(_LCG_M)
        tx = (F.lit(_TX_A) * F.col("id") + F.lit(_TX_B)) % F.lit(_LCG_M)
        frames.append(
            spark.range(n).select(
                F.lit(p).alias("phase"),
                F.timestamp_micros(F.lit(base) + F.col("id") * step_us).alias("ts"),
                F.element_at(user_arr, (lcg % len(users) + 1).cast("int")).alias("user_id"),
                (tx % 1_000_000 + 1).alias("transaction_id"),
            ).withColumn("value", (F.col("user_id") * 10).cast("double"))
        )
    out = frames[0]
    for f in frames[1:]:
        out = out.unionByName(f)
    return out


def generated_events_sql(phases=PHASES) -> str:
    """DuckDB CTE body producing the *identical* stream (same closed-form
    arithmetic); embed as ``WITH events_gen AS ({this})``."""
    selects = []
    for p, (eps, n, users) in enumerate(phases):
        step_us = 1_000_000 // eps
        base = BASE_US + p * PHASE_SPACING_US
        user_list = "list_value(" + ", ".join(str(u) for u in users) + ")"
        lcg = f"(({_LCG_A}::BIGINT * i + {_LCG_B}) % {_LCG_M})"
        tx = f"(({_TX_A}::BIGINT * i + {_TX_B}) % {_LCG_M})"
        selects.append(
            f"SELECT {p} AS phase, "
            f"make_timestamp({base} + i * {step_us}) AS ts, "
            f"{user_list}[({lcg} % {len(users)} + 1)::INT]::BIGINT AS user_id, "
            f"({tx} % 1000000 + 1) AS transaction_id, "
            f"(({user_list}[({lcg} % {len(users)} + 1)::INT]) * 10)::DOUBLE AS value "
            f"FROM range({n}) t(i)"
        )
    return " UNION ALL ".join(selects)


def write_events_csv(spark: SparkSession, path: str,
                     phases=PHASES) -> None:
    """Serialize the generated stream to the reference's CSV wire format
    (``"%Y-%m-%d %H:%M:%S",uid,sid,payload`` — generator1.py:17-21) for
    feeding the streaming CSV/Kafka front end."""
    generated_events(spark, phases).select(
        F.concat_ws(
            ",",
            F.date_format("ts", "yyyy-MM-dd HH:mm:ss"),
            F.col("user_id"),
            F.col("transaction_id"),
            F.col("value").cast("bigint"),
        ).alias("value")
    ).write.mode("overwrite").text(path)
