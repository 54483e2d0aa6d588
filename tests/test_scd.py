"""SCD2: the incremental fold must equal the batch rebuild after any
in-order batch split, and no-op changes must never cut versions."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from market_data_lakehouse_spark.scd import scd2_apply, scd2_rebuild
from market_data_lakehouse_spark.txnlog import TransactionalLake

CHANGES = [
    # (key, val, ts, seq)
    ("A", "bronze", 100, 1),
    ("A", "bronze", 200, 2),   # no-op: must not cut a version
    ("A", "silver", 300, 3),
    ("A", "gold", 400, 4),
    ("B", "bronze", 150, 5),
    ("B", None, 250, 6),       # null value is a real change
    ("B", None, 350, 7),       # null -> null: no-op (null-safe)
    ("B", "silver", 450, 8),
    ("C", "gold", 500, 9),
]


def _df(spark, rows):
    # explicit schema: a slice whose tier values are all None must not
    # fail inference
    return spark.createDataFrame(
        rows, "k string, tier string, ts long, seq long"
    )


def _hist(df):
    return sorted(
        (
            (r.k, r.tier, r.valid_from, r.valid_to, r.is_current)
            for r in df.collect()
        ),
        key=lambda t: (t[0], t[2]),
    )


EXPECT = sorted(
    [
        ("A", "bronze", 100, 300, False),
        ("A", "silver", 300, 400, False),
        ("A", "gold", 400, None, True),
        ("B", "bronze", 150, 250, False),
        ("B", None, 250, 450, False),
        ("B", "silver", 450, None, True),
        ("C", "gold", 500, None, True),
    ],
    key=lambda t: (t[0], t[2]),
)


class TestRebuild:
    def test_rebuild_collapses_noops_and_handles_nulls(self, spark):
        hist = scd2_rebuild(
            _df(spark, CHANGES), ["k"], "ts", ["tier"], tiebreak="seq"
        )
        assert _hist(hist) == EXPECT


class TestApply:
    @pytest.mark.parametrize("split", [(3,), (4, 7), (1, 2, 5, 8)])
    def test_incremental_equals_rebuild(self, spark, tmp_path, split):
        lake = TransactionalLake(
            spark, str(tmp_path / "dim"), partition_by=()
        )
        bounds = [0, *split, len(CHANGES)]
        for lo, hi in zip(bounds, bounds[1:]):
            rows = sorted(CHANGES[lo:hi], key=lambda r: (r[2], r[3]))
            if rows:
                scd2_apply(
                    lake, _df(spark, rows), ["k"], "ts", ["tier"],
                    tiebreak="seq",
                )
        assert _hist(lake.snapshot()) == EXPECT

    def test_noop_batch_cuts_no_versions(self, spark, tmp_path):
        lake = TransactionalLake(
            spark, str(tmp_path / "dim"), partition_by=()
        )
        scd2_apply(
            lake, _df(spark, CHANGES[:1]), ["k"], "ts", ["tier"],
            tiebreak="seq",
        )
        scd2_apply(
            lake,
            _df(spark, [("A", "bronze", 999, 99)]),  # re-states value
            ["k"], "ts", ["tier"], tiebreak="seq",
        )
        hist = _hist(lake.snapshot())
        assert hist == [("A", "bronze", 100, None, True)]

    def test_out_of_order_raises(self, spark, tmp_path):
        lake = TransactionalLake(
            spark, str(tmp_path / "dim"), partition_by=()
        )
        scd2_apply(
            lake, _df(spark, [("A", "silver", 300, 1)]),
            ["k"], "ts", ["tier"], tiebreak="seq",
        )
        with pytest.raises(ValueError, match="out-of-order"):
            scd2_apply(
                lake, _df(spark, [("A", "gold", 300, 2)]),
                ["k"], "ts", ["tier"], tiebreak="seq",
            )

    def test_closed_versions_never_rewritten(self, spark, tmp_path):
        """The merge must only touch files holding affected keys'
        CURRENT rows — spot-checked via history: applying a change for
        one key commits exactly one merge."""
        lake = TransactionalLake(
            spark, str(tmp_path / "dim"), partition_by=()
        )
        scd2_apply(
            lake, _df(spark, CHANGES[:4]), ["k"], "ts", ["tier"],
            tiebreak="seq",
        )
        v = scd2_apply(
            lake, _df(spark, [("A", "platinum", 900, 10)]),
            ["k"], "ts", ["tier"], tiebreak="seq",
        )
        assert lake.version == v
        hist = _hist(lake.snapshot())
        assert ("A", "gold", 400, 900, False) in hist
        assert ("A", "platinum", 900, None, True) in hist


class TestStreamingScd2:
    def test_stream_scd2_equals_rebuild(self, spark, tmp_path):
        """Drain the change stream through the streaming SCD2 sink in
        several micro-batches; the dimension must equal the batch
        rebuild of the full log."""
        import os

        from market_data_lakehouse_spark.streaming import stream_scd2

        src_dir = str(tmp_path / "src")
        # 3 parquet files -> 3 micro-batches, each internally ordered;
        # file order tracks ts order per key (in-order feed contract)
        rows = sorted(CHANGES, key=lambda r: (r[2], r[3]))
        for i, lo in enumerate(range(0, 9, 3)):
            _df(spark, rows[lo : lo + 3]).coalesce(1).write.mode(
                "append"
            ).parquet(src_dir)
        lake = TransactionalLake(
            spark, str(tmp_path / "dim"), partition_by=()
        )
        static = spark.read.parquet(src_dir)
        stream = (
            spark.readStream.schema(static.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src_dir)
        )
        q = stream_scd2(
            stream,
            lake,
            keys="k",
            ts_col="ts",
            value_cols=("tier",),
            checkpoint_dir=str(tmp_path / "ckpt"),
            tiebreak="seq",
            available_now=True,
        )
        try:
            q.awaitTermination()
        finally:
            q.stop()
        assert _hist(lake.snapshot()) == EXPECT


from hypothesis import HealthCheck, given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402

change = st.tuples(
    st.sampled_from(["A", "B", "C"]),
    st.sampled_from(["bronze", "silver", "gold", None]),
)


@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    changes=st.lists(change, min_size=1, max_size=12),
    cuts=st.sets(st.integers(min_value=1, max_value=11), max_size=3),
)
def test_property_incremental_equals_rebuild(
    spark, tmp_path_factory, changes, cuts
):
    """For ANY change stream and ANY in-order batch split, the
    incrementally-applied dimension equals the batch rebuild."""
    rows = [
        (k, v, 100 + 10 * i, i) for i, (k, v) in enumerate(changes)
    ]
    lake = TransactionalLake(
        spark,
        str(tmp_path_factory.mktemp("scdprop") / "dim"),
        partition_by=(),
    )
    bounds = sorted({0, len(rows), *(c for c in cuts if c < len(rows))})
    for lo, hi in zip(bounds, bounds[1:]):
        if lo < hi:
            scd2_apply(
                lake, _df(spark, rows[lo:hi]), ["k"], "ts", ["tier"],
                tiebreak="seq",
            )
    want = _hist(
        scd2_rebuild(_df(spark, rows), ["k"], "ts", ["tier"], tiebreak="seq")
    )
    assert _hist(lake.snapshot()) == want, (changes, bounds)
