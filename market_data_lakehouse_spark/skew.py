"""Skew mitigation for shuffle joins — the explicit-salting
counterpart to the session's AQE skew-join handling.

AQE (``spark.sql.adaptive.skewJoin.enabled``, on in ``session.py``)
splits oversized post-shuffle partitions at runtime, but it only
helps sort-merge joins and only after the skewed shuffle blocks have
been written. ``salted_join`` removes the hot spot BEFORE the
shuffle: the left (big, skewed) side spreads each key across
``salt`` sub-partitions via a deterministic hash of the whole row,
and the right side is replicated ``salt`` ways so every sub-partition
can still find its match. Shuffle keys become (key..., _salt) — a
hot key's rows land on ``salt`` reducers instead of one.

Cost model: replicating the right side multiplies its shuffle volume
by ``salt`` — use this when the right side is far smaller than the
hot key's row count (the usual shape: a big skewed fact against a
mid-size table too large to broadcast). With a broadcastable right
side, just broadcast; with balanced keys, just join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

_SALT = "_salt"


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    how: str = "inner",
    salt: int = 16,
) -> DataFrame:
    """Equi-join ``left`` (big, skewed) with ``right`` (small-ish,
    not broadcastable) on ``on``, spreading each join key over
    ``salt`` shuffle partitions.

    Only ``inner`` and ``left`` joins are supported: a right/full
    outer would surface one unmatched row PER REPLICA of the right
    side. Semantics are identical to ``left.join(right, on, how)`` —
    each left row carries exactly one salt value and meets exactly
    the one right replica tagged with it.
    """
    if how not in ("inner", "left", "left_outer", "leftouter"):
        raise ValueError(
            f"salted_join supports inner/left joins, got {how!r}: a "
            "right/full outer join would emit unmatched right rows "
            "once per salt replica"
        )
    if salt < 2:
        raise ValueError(f"salt must be >= 2, got {salt}")
    keys = [on] if isinstance(on, str) else list(on)
    for k in keys:
        if k == _SALT:
            raise ValueError(f"join key collides with {_SALT!r}")
    if _SALT in left.columns or _SALT in right.columns:
        raise ValueError(f"input already has a {_SALT!r} column")
    # Deterministic spread: hash of the WHOLE left row, so retries
    # re-derive the same salt (rand()/monotonically_increasing_id()
    # are retry-unstable) and a hot key's distinct payloads fan out.
    salted_left = left.withColumn(
        _SALT, F.pmod(F.xxhash64(*left.columns), F.lit(salt)).cast("int")
    )
    replicated_right = right.withColumn(
        _SALT, F.explode(F.array([F.lit(i) for i in range(salt)]))
    )
    return salted_left.join(
        replicated_right, keys + [_SALT], how
    ).drop(_SALT)
