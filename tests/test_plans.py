"""Physical-plan audits: assert the plan Catalyst produces is the one
a 1000-executor / 100 TB deployment needs — not just that results are
right. Each assertion pins a scale property discussed in the query's
docstring."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from market_data_lakehouse_spark.queries.relational import (
    a2_vwap_top10,
    a14_big_orders,
    f2_time_range,
    j3_broadcast_join,
    j6_asof_join,
    j9_multiway_topk,
    j11_shipping_priority,
    j12_regional_revenue,
    o2_topk,
    s1_scan_project,
    w2_rank_topn,
    w6_sessionize,
    w10_rank_distributions,
)


def plan(df) -> str:
    jvm = df.sparkSession._jvm
    return jvm.org.apache.spark.sql.api.python.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def simple_plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


class TestPlans:
    def test_scan_pushdown_and_pruning(self, spark, sf_dir):
        """Filter reaches the parquet reader; only 4 of 11 columns
        are read (reference reads all 8 of its columns per row)."""
        p = plan(s1_scan_project(spark, sf_dir))
        assert "PushedFilters" in p and "l_returnflag" in p.split("PushedFilters")[1].split("\n")[0]
        read_schema = [ln for ln in p.splitlines() if "ReadSchema" in ln][0]
        assert "l_extendedprice" not in read_schema  # pruned
        assert "l_quantity" in read_schema

    def test_time_range_pushes_to_scan(self, spark, sf_dir):
        """The events time-range bounds must reach the parquet reader
        as raw-nanos long comparisons (row-group skipping) — filtering
        the converted timestamp column would read every row group."""
        p = plan(f2_time_range(spark, sf_dir))
        pushed = p.split("PushedFilters")[1].split("\n")[0]
        assert "GreaterThanOrEqual(ts" in pushed and "LessThanOrEqual(ts" in pushed

    def test_topk_is_take_ordered(self, spark, sf_dir):
        """ORDER BY ... LIMIT k must be TakeOrderedAndProject (per-
        partition heaps), never a global Sort + CollectLimit."""
        assert "TakeOrderedAndProject" in plan(o2_topk(spark, sf_dir))
        assert "TakeOrderedAndProject" in plan(a2_vwap_top10(spark, sf_dir))

    def test_vwap_has_partial_aggregation(self, spark, sf_dir):
        """Map-side combine: HashAggregate appears twice (partial +
        final) around the key exchange."""
        p = plan(a2_vwap_top10(spark, sf_dir))
        assert p.count("HashAggregate") >= 2

    def test_dim_join_broadcasts(self, spark, sf_dir):
        """Fact-dim join must broadcast the dim: no shuffle of the
        fact side."""
        assert "BroadcastHashJoin" in plan(j3_broadcast_join(spark, sf_dir))

    def test_window_topn_group_limit(self, spark, sf_dir):
        """rank<=k filter pushes a per-partition WindowGroupLimit
        below the shuffle (Spark 3.5+), bounding exchange volume."""
        p = plan(w2_rank_topn(spark, sf_dir))
        assert "WindowGroupLimit" in p

    def test_asof_join_single_shuffle(self, spark, sf_dir):
        """The union+window as-of join must shuffle exactly once (on
        the key) — no join-induced row explosion, no second
        exchange."""
        p = simple_plan(j6_asof_join(spark, sf_dir))
        # one Exchange for the window's partitionBy; AQE may add
        # AQEShuffleRead wrappers but no second hashpartitioning
        assert p.count("hashpartitioning") == 1, p

    def test_multiway_topk_broadcasts_dim_and_takes_ordered(
        self, spark, sf_dir
    ):
        """The Q3-shape composite must broadcast the filtered dim
        side and end in TakeOrderedAndProject — a global Sort or a
        shuffled customer join is the wrong plan at scale."""
        p = plan(j9_multiway_topk(spark, sf_dir))
        assert "TakeOrderedAndProject" in p
        assert "BroadcastHashJoin" in p
        # at test SF both joins broadcast; a shuffled customer join
        # (SMJ anywhere in this plan) is a planning regression
        assert "SortMergeJoin" not in p

    def test_sessionize_single_exchange(self, spark, sf_dir):
        """Both session windows and the per-session groupBy must
        reuse ONE user_id exchange: the lag-window, the cumulative-sum
        window, and the aggregate all hash-partition compatibly."""
        p = simple_plan(w6_sessionize(spark, sf_dir))
        assert p.count("hashpartitioning") == 1, p

    def test_similarity_ops_never_cartesian(self, spark, sf_dir):
        """Near-dup / LSH / ANN candidate generation must be bucketed
        equi-joins — an all-pairs CartesianProduct or BroadcastNested-
        LoopJoin is O(n^2) and disqualifying at 100 TB."""
        from market_data_lakehouse_spark.queries.dedup import (
            e2_minhash_lsh,
            e2_ngram_jaccard,
        )
        from market_data_lakehouse_spark.queries.similarity import (
            e2_embedding_neardup,
            e3_ann_lsh,
            e3_knn_bruteforce,
        )

        from market_data_lakehouse_spark.queries.dedup import (
            e2_lsh_verified_jaccard,
        )

        for fn in (
            e2_minhash_lsh,
            e2_ngram_jaccard,
            e2_lsh_verified_jaccard,
            e2_embedding_neardup,
            e3_ann_lsh,
            e3_knn_bruteforce,
        ):
            p = simple_plan(fn(spark, sf_dir))
            assert "CartesianProduct" not in p, fn.__name__
            assert "BroadcastNestedLoopJoin" not in p, fn.__name__

    def test_hash_split_prunes_and_partial_aggregates(self, spark, sf_dir):
        """The split reads only doc_id+text (projection reaches the
        parquet scan) and aggregates with map-side combine — one scan,
        one small exchange of per-split partials."""
        from market_data_lakehouse_spark.queries.sampling import e6_hash_split

        p = plan(e6_hash_split(spark, sf_dir))
        read_schema = [ln for ln in p.splitlines() if "ReadSchema" in ln][0]
        assert "doc_id" in read_schema and "text" in read_schema
        assert "n_chars" not in read_schema and "lang" not in read_schema
        assert p.count("HashAggregate") >= 2  # partial + final

    def test_token_shards_partitioned_never_single_task(self, spark, sf_dir):
        """The declared 100 TB sharding plan: the cumulative-sum
        window is keyed by source, so the pre-window exchange is
        hashpartitioning(source) — a SinglePartition exchange (the
        global variant's shape) must NOT appear anywhere."""
        from market_data_lakehouse_spark.queries.sampling import (
            e6_token_shards, e6_token_shards_partitioned,
        )

        p = simple_plan(e6_token_shards_partitioned(spark, sf_dir))
        assert "SinglePartition" not in p
        assert "hashpartitioning(source" in p
        # and the global kernel really is the shape being avoided
        assert "SinglePartition" in simple_plan(e6_token_shards(spark, sf_dir))

    def test_risk_stats_single_exchange(self, spark, sf_dir):
        """w7/w8: the lag/cumulative-max window and the final per-key
        aggregate share one instrument-key partitioning — exactly ONE
        exchange in each plan."""
        from market_data_lakehouse_spark.queries.relational import (
            w7_returns_vol, w8_max_drawdown,
        )

        for fn in (w7_returns_vol, w8_max_drawdown):
            p = simple_plan(fn(spark, sf_dir))
            assert p.count("Exchange") == 1, p
            assert "hashpartitioning(event_type" in p

    def test_repetition_score_combines_map_side(self, spark, sf_dir):
        """Both aggregates carry partial (map-side) combine and the
        second reuses the first's doc_id partitioning — one exchange,
        token rows never shuffle un-combined."""
        from market_data_lakehouse_spark.queries.textops import (
            e4_repetition_score,
        )

        p = simple_plan(e4_repetition_score(spark, sf_dir))
        assert p.count("Exchange") == 1, p
        assert p.count("HashAggregate") >= 3  # partial+final, then final

    def test_funnel_single_scan_single_user_shuffle(self, spark, sf_dir):
        """a13: ONE events scan and ONE user_id exchange serve all
        three chained step windows (same partition spec -> exchange
        reuse, the sessionize pattern); the only other exchange is
        the final scalar aggregate's single-partition reduce. The
        old per-step join chain planned 6 scans / 5 shuffles."""
        from market_data_lakehouse_spark.queries.relational import a13_funnel

        p = simple_plan(a13_funnel(spark, sf_dir))
        assert "CartesianProduct" not in p
        assert "BroadcastNestedLoopJoin" not in p
        assert p.count("Scan parquet") == 1, p
        assert p.count("hashpartitioning(user_id") == 1, p

    def test_ewma_reduces_before_python(self, spark, sf_dir):
        """w9: the Arrow-batched recurrence fold must sit ABOVE the
        daily reduction — the raw scan combines map-side down to
        instrument-day rows before any byte crosses into Python."""
        from market_data_lakehouse_spark.queries.relational import w9_ewma

        p = simple_plan(w9_ewma(spark, sf_dir))
        assert "FlatMapGroupsInPandas" in p
        # partial + final HashAggregate of the daily reduction feed it
        assert p.index("HashAggregate") > p.index("FlatMapGroupsInPandas")
        assert p.count("HashAggregate") >= 2

    def test_corr_matrix_hash_joins_on_date(self, spark, sf_dir):
        """a12: the all-pairs self-join must be a hash join keyed on
        the date with the upper-triangle predicate as a residual
        condition — never a nested-loop/cartesian over the corpus."""
        from market_data_lakehouse_spark.queries.relational import (
            a12_corr_matrix,
        )

        p = simple_plan(a12_corr_matrix(spark, sf_dir))
        assert "BroadcastHashJoin" in p or "SortMergeJoin" in p
        assert "CartesianProduct" not in p
        assert "BroadcastNestedLoopJoin" not in p

    def test_anomaly_zscore_broadcasts_stats(self, spark, sf_dir):
        """v4: the per-instrument (mu, sigma) table joins back onto
        the scan as a broadcast — the big side is never shuffled for
        the join."""
        from market_data_lakehouse_spark.queries.quality import (
            v4_anomaly_zscore,
        )

        p = simple_plan(v4_anomaly_zscore(spark, sf_dir))
        assert "BroadcastHashJoin" in p

    def test_bucketed_join_is_shuffle_free(self, spark, sf_dir, tmp_path):
        """Bucketing is THE co-located-join primitive at 100 TB: two
        tables bucketed by the join key on the same bucket count join
        with ZERO exchanges — the nightly-repeated fact-to-fact join
        pays its shuffle once at write time, never per query."""
        import uuid

        suffix = uuid.uuid4().hex[:8]
        li, od = f"li_b_{suffix}", f"od_b_{suffix}"
        lineitem = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
        try:
            # external tables under tmp_path: warehouse.dir is a
            # static conf, so pin each table's location explicitly
            (lineitem.write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
             .option("path", str(tmp_path / li))
             .format("parquet").saveAsTable(li))
            (orders.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
             .option("path", str(tmp_path / od))
             .format("parquet").saveAsTable(od))
            old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
            try:
                joined = spark.table(li).join(
                    spark.table(od),
                    F.col("l_orderkey") == F.col("o_orderkey"),
                ).select("l_orderkey", "o_totalprice", "l_quantity")
                p = simple_plan(joined)
                assert "SortMergeJoin" in p
                assert "Exchange" not in p, p
            finally:
                spark.conf.set(
                    "spark.sql.autoBroadcastJoinThreshold", old
                )
        finally:
            spark.sql(f"DROP TABLE IF EXISTS {li}")
            spark.sql(f"DROP TABLE IF EXISTS {od}")

    def test_ingest_write_rebalances_on_partition_key(self, spark, tmp_path):
        """The append plan must carry a REBALANCE on date: without it
        a T-task batch writes T files into every touched date dir
        (small-files pathology), and AQE can neither merge small
        dates nor split oversized ones."""
        from datetime import datetime

        from market_data_lakehouse_spark.lakehouse import DataLakehouse

        lake = DataLakehouse(spark, str(tmp_path / "lake"))
        lake.ingest_batch(
            [
                {
                    "symbol": "AAPL",
                    "timestamp": datetime(2024, 6, 14, 10, 0),
                    "open": 150.0,
                    "high": 155.0,
                    "low": 149.0,
                    "close": 153.0,
                    "volume": 100,
                    "asset_class": "equity",
                }
            ]
        )
        # one row -> exactly one file in one date dir (the rebalance
        # collapses the write to data-proportional tasks)
        files = [
            f
            for f in (tmp_path / "lake" / "date=2024-06-14").iterdir()
            if f.name.endswith(".parquet")
        ]
        assert len(files) == 1

    def test_lakehouse_query_prunes_partitions(self, spark, tmp_path):
        """Date-range predicates must prune at file-listing level:
        the scan's PartitionFilters carry the derived date bounds."""
        from datetime import datetime

        from market_data_lakehouse_spark.lakehouse import DataLakehouse

        lake = DataLakehouse(spark, str(tmp_path / "lake"))
        bars = [
            {
                "symbol": "AAPL",
                "timestamp": datetime(2024, 6, d, 10, 0),
                "open": 150.0,
                "high": 155.0,
                "low": 149.0,
                "close": 153.0,
                "volume": 100,
                "asset_class": "equity",
            }
            for d in (14, 15, 16)
        ]
        lake.ingest_batch(bars)
        r = lake.query(start="2024-06-15 00:00:00", end="2024-06-15 23:59:59")
        p = plan(r.df)
        part_line = [ln for ln in p.splitlines() if "PartitionFilters" in ln]
        assert part_line and "date" in part_line[0]
        assert r.df.count() == 1


class TestRuntimePruning:
    """Runtime filters — the two Catalyst features that cut a 100 TB
    scan down to the partitions/row-groups a selective join actually
    needs, without any hand-written predicate."""

    def test_dynamic_partition_pruning(self, spark, tmp_path):
        """Joining a date-partitioned fact against a filtered dim must
        inject a dynamicpruning subquery into the fact scan's
        PartitionFilters: only the dim's surviving dates are listed,
        even though no literal date predicate exists on the fact."""
        fact = spark.range(0, 1000).selectExpr(
            "id", "CAST(date_add(DATE '2024-01-01', CAST(id % 10 AS INT)) AS DATE) AS date"
        )
        fact.write.partitionBy("date").mode("overwrite").parquet(
            str(tmp_path / "fact")
        )
        fact_r = spark.read.parquet(str(tmp_path / "fact"))
        dim = spark.createDataFrame(
            [("2024-01-03", "keep")], "d string, tag string"
        ).selectExpr("CAST(d AS DATE) AS date", "tag")
        joined = fact_r.join(dim.filter(F.col("tag") == "keep"), "date")
        p = plan(joined)
        part = [ln for ln in p.splitlines() if "PartitionFilters" in ln]
        assert part and "dynamicpruning" in part[0], p
        assert joined.count() == 100

    def test_bloom_filter_runtime_join_pruning(self, spark, tmp_path):
        """With runtime Bloom filters on, a shuffle join whose build
        side is selectively filtered must inject BloomFilterMightContain
        onto the probe side — rows that cannot match are dropped
        before the shuffle, the difference between shuffling 100 TB
        and shuffling the ~1% that survives."""
        big = spark.range(0, 50_000).selectExpr("id AS k", "id * 2 AS v")
        big.write.mode("overwrite").parquet(str(tmp_path / "big"))
        small = spark.range(0, 5_000).selectExpr("id AS k", "id % 97 AS tag")
        small.write.mode("overwrite").parquet(str(tmp_path / "small"))
        conf = spark.conf
        saved = {
            "spark.sql.optimizer.runtime.bloomFilter.enabled":
                conf.get("spark.sql.optimizer.runtime.bloomFilter.enabled"),
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold":
                conf.get("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold"),
            "spark.sql.autoBroadcastJoinThreshold":
                conf.get("spark.sql.autoBroadcastJoinThreshold"),
        }
        try:
            conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
            conf.set(
                "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
                "0",
            )
            conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
            b = spark.read.parquet(str(tmp_path / "big"))
            s = spark.read.parquet(str(tmp_path / "small")).filter(
                F.col("tag") == 7
            )
            joined = b.join(s, "k")
            p = plan(joined)
            assert "bloom_filter" in p or "BloomFilter" in p, p
            assert joined.count() == 52  # ids 0..4999 with id%97==7
        finally:
            for key, val in saved.items():
                conf.set(key, val)


class TestSkewJoin:
    def test_salted_join_matches_plain_join(self, spark):
        """Equivalence on pathologically skewed data: one key holds
        90% of the left side. inner and left results must match the
        unsalted join exactly (including unmatched-left rows)."""
        from market_data_lakehouse_spark.skew import salted_join

        left = spark.createDataFrame(
            [("hot", i) for i in range(900)]
            + [(f"k{i}", i) for i in range(100)]
            + [("orphan", -1)],
            "k string, v int",
        )
        right = spark.createDataFrame(
            [("hot", "H")] + [(f"k{i}", f"R{i}") for i in range(100)],
            "k string, r string",
        )
        for how in ("inner", "left"):
            got = salted_join(left, right, "k", how=how, salt=8)
            want = left.join(right, "k", how)
            assert sorted(map(tuple, got.collect())) == sorted(
                map(tuple, want.collect())
            ), how

    def test_salted_join_spreads_shuffle_keys(self, spark):
        """The exchange under the join must hash on (key, _salt) —
        the hot key's rows land on `salt` reducers, not one."""
        from market_data_lakehouse_spark.skew import salted_join

        left = spark.createDataFrame([("a", 1)], "k string, v int")
        right = spark.createDataFrame([("a", "x")], "k string, r string")
        p = simple_plan(salted_join(left, right, "k", salt=4))
        assert "_salt" in p
        import re

        parts = re.findall(r"hashpartitioning\(([^)]*)\)", p)
        assert any("k" in x and "_salt" in x for x in parts), parts

    def test_salted_join_rejects_outer(self, spark):
        from market_data_lakehouse_spark.skew import salted_join

        left = spark.createDataFrame([("a", 1)], "k string, v int")
        with pytest.raises(ValueError, match="inner/left"):
            salted_join(left, left, "k", how="full")


class TestMultiJoinPlans:
    """Plan posture for the TPC-H Q3/Q5/Q18-shape composites."""

    def test_shipping_priority_pushes_filters_and_takes_ordered(
        self, spark, sf_dir
    ):
        """Each per-table predicate must reach its own scan as a
        PushedFilter (no post-join filtering), and the top-10 must be
        TakeOrderedAndProject, never a global Sort."""
        p = plan(j11_shipping_priority(spark, sf_dir))
        assert "TakeOrderedAndProject" in p
        pushed = [
            ln for ln in p.splitlines() if "PushedFilters" in ln
        ]
        joined = "\n".join(pushed)
        assert "c_mktsegment" in joined
        assert "o_orderdate" in joined
        assert "l_shipdate" in joined

    def test_regional_revenue_broadcasts_geo_dims(self, spark, sf_dir):
        """nation⨝region is explicitly broadcast; the plan must show
        a BroadcastHashJoin and no cartesian anywhere."""
        p = plan(j12_regional_revenue(spark, sf_dir))
        assert "BroadcastHashJoin" in p
        assert "CartesianProduct" not in p
        # revenue aggregate keeps map-side combine
        assert p.count("HashAggregate") >= 2

    def test_big_orders_semi_join_before_fact_join(self, spark, sf_dir):
        """The HAVING subquery must reduce to a semi-join of orders
        against the heavy-key aggregate (pass-1 output), and that
        aggregate must be partial+final (map-side combined)."""
        p = plan(a14_big_orders(spark, sf_dir))
        assert "LeftSemi" in p
        assert p.count("HashAggregate") >= 4  # heavy-key agg + final agg
        assert "TakeOrderedAndProject" in p

    def test_rank_distributions_single_window_sort(self, spark, sf_dir):
        """All four distribution functions share ONE window spec —
        exactly one user_id exchange, one Window node, and no global
        (no-partition) window anywhere."""
        p = simple_plan(w10_rank_distributions(spark, sf_dir))
        assert p.count("hashpartitioning") == 1, p
        assert "SinglePartition" not in p


class TestPackSequencesPlan:
    def test_pack_sequences_partitioned_window_no_global_sort(
        self, spark, sf_dir
    ):
        """The packing cumsum window is keyed by source — the plan
        must show hashpartitioning(source) and never a SinglePartition
        exchange (same 100 TB posture as token_shards_partitioned).
        The explode (Generate) sits above the window, so output
        growth never feeds back into the shuffle."""
        from market_data_lakehouse_spark.queries.sampling import (
            e7_pack_sequences,
        )

        p = simple_plan(e7_pack_sequences(spark, sf_dir))
        assert "SinglePartition" not in p
        assert "hashpartitioning(source" in p
        assert "Generate explode" in p


class TestSubqueryPlans:
    def test_scalar_subquery_decorrelates_to_aggregate_join(
        self, spark, sf_dir
    ):
        """The correlated MIN must become ONE aggregate over lineitem
        joined back on partkey — never a re-executed per-row subquery
        (no nested-loop join in the plan)."""
        from market_data_lakehouse_spark.queries.relational import (
            j13_scalar_subquery,
        )

        p = plan(j13_scalar_subquery(spark, sf_dir))
        assert "BroadcastNestedLoopJoin" not in p
        assert "CartesianProduct" not in p
        assert p.count("HashAggregate") >= 2  # partial+final min-per-key

    def test_nation_trade_prunes_dims_and_pushes_dates(self, spark, sf_dir):
        """Both nation dims arrive pre-filtered (the implied IN) and
        broadcast; the ship-date range reaches the lineitem scan."""
        from market_data_lakehouse_spark.queries.relational import (
            j14_nation_trade,
        )

        p = plan(j14_nation_trade(spark, sf_dir))
        assert p.count("BroadcastHashJoin") >= 2
        pushed = "\n".join(
            ln for ln in p.splitlines() if "PushedFilters" in ln
        )
        assert "l_shipdate" in pushed
        assert "n_name" in pushed  # implied IN reached the dim scans
        assert "CartesianProduct" not in p


class TestRound4bPlans:
    def test_bm25_broadcasts_stats_and_takes_ordered(self, spark, sf_dir):
        """BM25: df / (N, avgdl) are broadcast dim-sized sides, every
        aggregate map-side combined, top-20 via TakeOrderedAndProject
        — never a global sort of scored docs."""
        from market_data_lakehouse_spark.queries.textops import (
            e4_bm25_search,
        )

        p = plan(e4_bm25_search(spark, sf_dir))
        assert "TakeOrderedAndProject" in p
        assert p.count("HashAggregate") >= 4
        assert "SortMergeJoin" not in p  # all joins broadcast at SF

    def test_range_frame_single_user_exchange(self, spark, sf_dir):
        """The RANGE window must partition by user_id — one exchange,
        no SinglePartition global sort."""
        from market_data_lakehouse_spark.queries.relational import (
            w11_range_frame,
        )

        p = simple_plan(w11_range_frame(spark, sf_dir))
        assert p.count("hashpartitioning") == 1, p
        assert "SinglePartition" not in p

    def test_drift_psi_reduces_before_joining(self, spark, sf_dir):
        """PSI: the event scan reduces to per-(type, period, bin)
        counts FIRST (map-side combined); the grid/total joins happen
        on dim-sized aggregates only — broadcast, never a shuffle of
        rows."""
        from market_data_lakehouse_spark.queries.quality import v5_drift_psi

        p = plan(v5_drift_psi(spark, sf_dir))
        assert p.count("HashAggregate") >= 4
        assert "SortMergeJoin" not in p


class TestRound6Plans:
    def test_domain_quota_group_limit(self, spark, sf_dir):
        """The rn <= 50 quota must push a WindowGroupLimit below the
        window (partial per-source top-50 in the map side) — the
        corpus is never fully sorted."""
        from market_data_lakehouse_spark.queries.sampling import (
            e6_domain_quota,
        )

        p = simple_plan(e6_domain_quota(spark, sf_dir))
        assert "WindowGroupLimit" in p, p

    def test_waiting_suppliers_no_nested_loop(self, spark, sf_dir):
        """Q21's EXISTS/NOT-EXISTS pair must compile to hash
        semi/anti joins on l_orderkey — a per-row subquery or
        nested-loop plan is disqualifying."""
        from market_data_lakehouse_spark.queries.relational import (
            j17_waiting_suppliers,
        )

        p = simple_plan(j17_waiting_suppliers(spark, sf_dir))
        assert "CartesianProduct" not in p
        assert "BroadcastNestedLoopJoin" not in p
        assert "LeftSemi" in p and "LeftAnti" in p, p

    def test_idle_customers_threshold_broadcasts(self, spark, sf_dir):
        """Q22's scalar threshold is a 1-row broadcast; the orders
        probe is an anti join, and the only allowed nested-loop is
        the 1-row threshold cross join."""
        from market_data_lakehouse_spark.queries.relational import (
            j19_idle_customers,
        )

        p = simple_plan(j19_idle_customers(spark, sf_dir))
        assert "LeftAnti" in p, p
        assert "CartesianProduct" not in p


class TestTriangleBroadcastGate:
    """g2's closure-probe broadcast must be provably bounded: the
    hint applies only while the (exactly counted) edge set fits the
    session's autoBroadcastJoinThreshold; past the gate the closure
    join degrades to a shuffle join — never a nested loop."""

    def test_small_edges_broadcast(self, spark, sf_dir):
        from market_data_lakehouse_spark.queries.relational import (
            g2_triangle_count,
        )

        p = simple_plan(g2_triangle_count(spark, sf_dir))
        assert "BroadcastHashJoin" in p
        assert "NestedLoop" not in p and "CartesianProduct" not in p

    def test_gate_disables_broadcast_same_answer(self, spark, sf_dir):
        from market_data_lakehouse_spark.queries.relational import (
            g2_triangle_count,
        )

        base = g2_triangle_count(spark, sf_dir).collect()[0]
        old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "1KB")
        try:
            gated_df = g2_triangle_count(spark, sf_dir)
            p = simple_plan(gated_df)
            gated = gated_df.collect()[0]
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        assert "BroadcastHashJoin" not in p
        assert "NestedLoop" not in p and "CartesianProduct" not in p
        assert (base.n_edges, base.n_triangles) == (
            gated.n_edges,
            gated.n_triangles,
        )

    def test_size_parser(self):
        from market_data_lakehouse_spark.queries.relational import (
            _size_bytes,
        )

        assert _size_bytes("10MB") == 10 << 20
        assert _size_bytes("10485760b") == 10 << 20
        assert _size_bytes("-1") == -1
        assert _size_bytes(67108864) == 64 << 20
        assert _size_bytes("1k") == 1 << 10
        assert _size_bytes("2g") == 2 << 30


class TestLocalRelation:
    """r16 optimization: driver-side metadata rows plan a
    LocalTableScan (Arrow ingest) instead of a 32-slice pickled RDD
    whose every task boots a Python worker. Broadcast builds over a
    LocalRelation collect driver-side with zero jobs."""

    def test_local_df_plans_local_table_scan(self, spark):
        from market_data_lakehouse_spark.localrel import local_df

        df = local_df(
            spark,
            [("f1.parquet", 3), ("f2.parquet", None)],
            "_dv_file string, _dv_pos bigint",
        )
        assert "LocalTableScan" in simple_plan(df)

    def test_local_df_matches_stock_createdataframe(self, spark):
        from market_data_lakehouse_spark.localrel import local_df

        cases = [
            ([("a", 1), (None, None)], "s string, n bigint"),
            ([(1, [0.5, 1.25]), (2, [])], "k long, v array<double>"),
            ([("p", 10, ["x"], [], 3)],
             "path string, size_bytes long, stats_columns array<string>,"
             " bloom_columns array<string>, deleted_rows long"),
            ([(True, 0.5)], "b boolean, d double"),
            ([], "a string, b bigint"),
        ]
        for rows, ddl in cases:
            a = local_df(spark, rows, ddl)
            b = spark.createDataFrame(rows, ddl)
            assert a.schema == b.schema, ddl
            ka = sorted(map(str, a.collect()))
            kb = sorted(map(str, b.collect()))
            assert ka == kb, ddl

    def test_local_df_datetime_falls_back(self, spark):
        """Naive datetimes localize differently on the Arrow path
        (session tz) vs the pickle path (machine tz) — the helper
        must route them through the stock path."""
        import datetime

        from market_data_lakehouse_spark.localrel import local_df

        rows = [(datetime.datetime(2024, 1, 2, 3, 4, 5),)]
        a = local_df(spark, rows, "t timestamp")
        b = spark.createDataFrame(rows, "t timestamp")
        assert a.collect() == b.collect()

    def test_local_df_dict_rows_fall_back(self, spark):
        """Dict rows must route to the stock path: ``tuple(dict)``
        yields the KEYS, so the pandas conversion would silently
        ingest wrong data for an all-string schema (ADVICE r16)."""
        from market_data_lakehouse_spark.localrel import local_df

        rows = [{"a": "x", "b": "y"}, {"a": "p", "b": "q"}]
        a = local_df(spark, rows, "a string, b string")
        b = spark.createDataFrame(rows, "a string, b string")
        assert sorted(map(str, a.collect())) == sorted(map(str, b.collect()))
        assert {r.a for r in a.collect()} == {"x", "p"}

    def test_local_df_nested_datetime_falls_back(self, spark):
        """A datetime nested two levels deep (array<struct<ts>>)
        must also route to the stock path — the one-level scan
        missed it (ADVICE r16)."""
        import datetime

        from market_data_lakehouse_spark.localrel import local_df

        rows = [([(datetime.datetime(2024, 1, 2, 3, 4, 5),)],)]
        ddl = "arr array<struct<ts timestamp>>"
        a = local_df(spark, rows, ddl)
        b = spark.createDataFrame(rows, ddl)
        assert a.collect() == b.collect()

    def test_dv_anti_join_builds_from_local_relation(self, spark, tmp_path):
        """The dv positional anti-join's broadcast side is a
        LocalRelation: no pickled-RDD stage per DML statement."""
        from market_data_lakehouse_spark.txnlog import TransactionalLake

        lake = TransactionalLake(spark, str(tmp_path / "lk"), partition_by=())
        lake.append(spark.range(100).selectExpr("id", "id * 2 as v"))
        lake.delete_where("id % 10 = 0", mode="dv")
        snap = lake.snapshot()
        assert "LocalTableScan" in simple_plan(snap)
        assert "Scan ExistingRDD" not in simple_plan(snap)
        assert snap.count() == 90
