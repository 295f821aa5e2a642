"""Reusable distributed-operator patterns that aren't single queries.

These are the at-scale building blocks the query surface composes:
skew-handling joins here; bucketed co-located tables in
``sources.registry.register_bucketed``; the blocked dedup/ANN patterns in
``queries/dedup.py`` / ``queries/similarity.py``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join on ``on`` with the LEFT side's hot keys spread over
    ``n_salts`` shuffle partitions.

    When to use: the left side has a few keys carrying a large share of
    the rows AND the right side is too big to broadcast. A plain shuffle
    join sends every hot-key row to one task; salting appends a
    per-row salt to the left key and replicates each right row across all
    ``n_salts`` salt values, so a hot key's rows land on ``n_salts`` tasks
    instead of one. Cost: the right side is materialized ``n_salts``
    times in the shuffle — size n_salts to the skew factor, not higher.

    Prefer AQE's skew-join split (`spark.sql.adaptive.skewJoin.enabled`,
    on by default in this engine's sessions) when it applies — it reads
    runtime sizes and splits only the partitions that are actually skewed.
    Salting is the static fallback for the cases AQE can't rebalance
    (e.g. the skew appears AFTER a stage boundary AQE has already
    committed, or deterministic layout is required).

    The salt is random-uniform per left row; correctness doesn't depend
    on WHICH salt a row gets, only that the (key, salt) join covers every
    pair — the right-side explode guarantees that. Supports ``inner`` and
    ``left`` joins (right/full would need the salt on the other side).
    """
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner|left, got {how!r}")
    salted_l = left.withColumn(
        "__salt", (F.rand(seed=42) * n_salts).cast("int")
    )
    salted_r = right.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    return (
        salted_l.join(salted_r, [on, "__salt"], how)
        .drop("__salt")
    )
