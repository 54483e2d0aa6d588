"""Declared query catalog — the driver-facing operator surface.

Every operator from SURVEY.md §2 that is implemented gets a named
entry here: a Spark callable ``(spark, sf_dir) -> DataFrame`` plus,
where ANSI-SQL-expressible, a DuckDB oracle string. The driver runs
both at sf=0.01 and compares row-count + schema + order-insensitive
value-hash (CORRECTNESS_r{N}.json).

Engine-parity rules applied throughout (so hashes match):

- Alias every computed column identically in Spark and SQL.
- Integer-valued computed columns are cast to BIGINT on both sides
  (DuckDB widens SUM(int)→HUGEINT, ROW_NUMBER→BIGINT, while Spark
  uses int for year()/row_number() — normalize to long).
- Float aggregates are ROUND()ed on both sides: double summation
  order differs between engines, so raw sums differ in the last
  ulps; rounding to a tolerance far above the error (but far below
  data resolution) makes the hash deterministic.
- Results that feed a LIMIT carry a unique-key tiebreaker in the
  ORDER BY so the selected set is deterministic in both engines.
- ``events.ts`` is parquet TIMESTAMP(NANOS): Spark reads it as a
  long (``legacy.parquet.nanosAsLong``) and we truncate to micros;
  DuckDB truncates to micros at read time — identical values.
"""

from market_data_lakehouse_spark.queries.catalog import (  # noqa: F401
    REGISTRY,
    QuerySpec,
    load,
    oracle_map,
    register,
    spark_queries,
)

# Import for side effect: each module registers its queries.
from market_data_lakehouse_spark.queries import (  # noqa: F401
    dedup,
    lakehouse_query,
    multimodal,
    quality,
    relational,
    sampling,
    similarity,
    textops,
)

# ---------------------------------------------------------------------------
# Driver-window ordering. The correctness driver checks the FIRST 50
# registered queries per round; registration order therefore decides
# which entries earn a hard oracle signal. Rounds 2+3 together greened
# every oracle-expressible entry except e4_corpus_clean (oracle dtype
# bug, fixed this round). The round-4 window front-loads (a) this
# round's new queries and the one never-driver-executed entry
# (e3_ivf_recall), (b) re-checks of every query whose code or oracle
# changed this round, (c) the rows-only sketches (kept in-window so
# their execution stays driver-exercised), and (d) one representative
# per operator family. Everything rotating past slot 50 has a green
# CORRECTNESS_r02 or _r03 row.
# ---------------------------------------------------------------------------
_DRIVER_WINDOW = [
    # (a) round-4 new queries + first-ever driver run — 35
    "w7_returns_vol", "w8_max_drawdown", "e1_decontaminate",
    "e1_contamination_ngram", "e4_repetition_score",
    "e6_temperature_mix", "e6_token_shards_partitioned", "e3_ivf_recall",
    "w9_ewma", "a12_corr_matrix", "v4_anomaly_zscore", "e3_kmeans",
    "j11_shipping_priority", "j12_regional_revenue", "a14_big_orders",
    "w10_rank_distributions", "e7_pack_sequences", "x8_bitwise_cond",
    "j13_scalar_subquery", "e3_pq_recall", "j14_nation_trade",
    "e2_semantic_dedup", "e4_bm25_search", "e4_normalize",
    "a15_filtered_agg", "v5_drift_psi", "w11_range_frame",
    "o4_null_ordering", "j15_market_share", "w12_ratio_to_report",
    "j16_recursive_reach", "x9_array_hof", "x10_variant",
    "a16_trimmed_mean", "e3_ivfpq_recall",
    # (b) round-4 re-checks: oracle fix (corpus_clean), view-name
    # change (j10), merge()-layer changes (merge_upsert, time_travel,
    # roundtrip), IVF probe change (ivf_knn) — 6
    "e4_corpus_clean", "j10_exists_subquery", "s8_merge_upsert",
    "s8_txn_time_travel", "lakehouse_roundtrip", "e3_ivf_knn",
    # (c) rows-only sketches kept executing in-window — 5
    # (e5_media_resize and a7_approx_distinct rotate out — both
    # rows-only, driver-executed green in r3, re-covered by their
    # oracle-checked family mates e5_frame_sample / a7_distinct)
    "e2_minhash_lsh", "e2_simhash",
    "e3_ann_lsh",
    "e3_ann_recall",
    # (d) family representatives (all driver-green r2/r3, plus the
    # new JSON + ORC roundtrips) — 17; further swapped for round-4b
    # additions: e2_dedup_clusters and e4_pii_redaction (both green
    # r3; E2 keeps neardup + lsh_verified, E4 keeps quality_score +
    # corpus_clean + repetition_score); rotated out as double-covered
    # and green in a previous round: s1_scan_project (subsumed by
    # lakehouse_roundtrip), e4_tfidf / e4_fingerprint / e4_ngram_freq
    # (E4 keeps quality_score + pii_redaction + corpus_clean +
    # repetition_score in-window), x7_map_funcs (X7 green r3 ×7;
    # x8_bitwise_cond holds the scalar-family slot), e6_token_shards
    # (global kernel, green r3; the partitioned variant holds the
    # in-window slot), a10_pivot (green r3; a11_unpivot represents
    # the reshape pair), and — swapped for this round's six new
    # queries — e1_exact_dedup + e1_dedup_by_hash (green r3; E1 is
    # represented by decontaminate + contamination_ngram),
    # e3_label_centroid_sim (E3 keeps knn/ivf/ann/kmeans),
    # e6_hash_split (E6 keeps stratified + temperature + shards +
    # packing), w1_lag_gaps (W keeps w6-w10), j9_multiway_topk (J
    # keeps j6/j10-j14; j3_broadcast_join green r3 + plan-asserted)
    "s2_json_roundtrip", "s3_orc_roundtrip",
    "a2_vwap_top10", "a13_funnel",
    "e2_lsh_verified_jaccard",
]


def _apply_driver_window() -> None:
    missing = [n for n in _DRIVER_WINDOW if n not in REGISTRY]
    if missing:
        raise ValueError(f"driver window names unknown: {missing}")
    if len(_DRIVER_WINDOW) != 50 or len(set(_DRIVER_WINDOW)) != 50:
        # the driver checks exactly the first 50 registered queries;
        # an off-by-one or duplicated name silently shifts which
        # queries earn an oracle signal — fail at import instead
        raise ValueError(
            f"driver window must be 50 unique names, got "
            f"{len(_DRIVER_WINDOW)} ({len(set(_DRIVER_WINDOW))} unique)"
        )
    ordered = {n: REGISTRY[n] for n in _DRIVER_WINDOW}
    ordered.update({n: s for n, s in REGISTRY.items() if n not in ordered})
    REGISTRY.clear()
    REGISTRY.update(ordered)


_apply_driver_window()
