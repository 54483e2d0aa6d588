"""Dataset assembly operators for training-data pipelines — E6.

The reference has no sampling surface at all; these are the standard
operations a 100 TB corpus pipeline runs between cleaning and
training, declared as first-class oracle-checked queries:

- deterministic train/val/test split (hash-gated, no RNG state —
  reproducible across runs, engines, and cluster sizes),
- stratified per-source downsampling (cap overrepresented sources),
- token-budget sharding (pack documents into fixed-token training
  shards via a cumulative sum).

Determinism is the design constraint: every gate derives from
``md5(cast(doc_id as string))``, which Spark and DuckDB compute
identically (verified hex-equal), so the oracle reproduces the exact
membership — not just the distribution. At 100 TB each operator is a
single scan plus one map-side-combined aggregate (split/sample) or
one window pass (sharding); nothing collects to the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from market_data_lakehouse_spark.queries.catalog import (
    doc_nibble,
    load,
    register,
)

# First hex nibble of md5(doc_id): 16 uniform buckets.
#   0-b (12/16 = 75%) -> train, c-d (2/16) -> val, e-f (2/16) -> test
_TRAIN_MAX = "b"
_VAL_MAX = "d"

# Stratified sample: keep docs whose SECOND nibble is in 0-3 (25%) —
# independent of the split nibble, so sampling composes with the
# split without correlation.
_SAMPLE_MAX = "3"

SHARD_TOKENS = 20_000  # token budget per training shard


# the shared membership-gate primitive (catalog.doc_nibble) under its
# historical local name
_nibble = doc_nibble


def _n_tokens() -> F.Column:
    """Whitespace token count; 0 for NULL/empty text (split('') yields
    [''], coalesce guards NULL)."""
    return F.when(
        F.coalesce(F.trim(F.col("text")), F.lit("")) == "", F.lit(0)
    ).otherwise(F.size(F.split(F.trim(F.col("text")), r"\s+"))).cast("long")


@register(
    "e6_hash_split",
    oracle=f"""
    WITH tagged AS (
      SELECT CASE WHEN substring(md5(CAST(doc_id AS VARCHAR)), 1, 1)
                       <= '{_TRAIN_MAX}' THEN 'train'
                  WHEN substring(md5(CAST(doc_id AS VARCHAR)), 1, 1)
                       <= '{_VAL_MAX}' THEN 'val'
                  ELSE 'test' END AS split,
             CASE WHEN trim(COALESCE(text, '')) = '' THEN 0
                  ELSE len(regexp_split_to_array(trim(text), '\\s+'))
             END AS n_tok
      FROM documents)
    SELECT split, COUNT(*) AS n_docs,
           CAST(SUM(n_tok) AS BIGINT) AS n_tokens
    FROM tagged GROUP BY split
    """,
)
def e6_hash_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 75/12.5/12.5 train/val/test split: the gate is
    the first hex nibble of md5(doc_id), so membership is a pure
    function of the row — stable under reruns, repartitioning, and
    engine choice (no RNG, no sample() seed coupling to partition
    layout, which Spark's sample() has). One scan, one
    map-side-combined aggregate; the split column itself is what a
    writer would partitionBy."""
    docs = load(spark, sf_dir, "documents")
    split = (
        F.when(_nibble(1) <= _TRAIN_MAX, "train")
        .when(_nibble(1) <= _VAL_MAX, "val")
        .otherwise("test")
    )
    return (
        docs.select(split.alias("split"), _n_tokens().alias("n_tok"))
        .groupBy("split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tok").alias("n_tokens"),
        )
    )


K_FOLDS = 5


@register(
    "e6_kfold",
    oracle=f"""
    WITH tagged AS (
      SELECT CAST(concat('0x', substring(md5(CAST(doc_id AS VARCHAR)),
                                         1, 8)) AS BIGINT)
               % {K_FOLDS} AS fold,
             CASE WHEN trim(COALESCE(text, '')) = '' THEN 0
                  ELSE len(regexp_split_to_array(trim(text), '\\s+'))
             END AS n_tok
      FROM documents)
    SELECT CAST(fold AS BIGINT) AS fold, COUNT(*) AS n_docs,
           CAST(SUM(n_tok) AS BIGINT) AS n_tokens
    FROM tagged GROUP BY fold ORDER BY fold
    """,
)
def e6_kfold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic K-fold assignment (K=5) (cross-validation / ablation
    splits): fold = first 32 md5 bits of the doc id modulo K — like
    e6_hash_split, membership is a pure function of the row, stable
    under reruns, repartitioning, and engine choice, and any fold's
    training set is simply ``fold != i`` with no coordination. One
    scan, one map-side-combined aggregate; both engines parse the
    same 8 hex chars so the fold ids hash-match exactly."""
    docs = load(spark, sf_dir, "documents")
    fold = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8),
               16, 10)
        .cast("long")
        % K_FOLDS
    )
    return (
        docs.select(fold.alias("fold"), _n_tokens().alias("n_tok"))
        .groupBy("fold")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tok").alias("n_tokens"),
        )
        .orderBy("fold")
    )


@register(
    "e6_stratified_sample",
    oracle=f"""
    WITH tagged AS (
      SELECT source,
             substring(md5(CAST(doc_id AS VARCHAR)), 2, 1)
               <= '{_SAMPLE_MAX}' AS kept
      FROM documents)
    SELECT source, COUNT(*) AS n_total,
           CAST(SUM(CASE WHEN kept THEN 1 ELSE 0 END) AS BIGINT)
             AS n_sampled
    FROM tagged GROUP BY source
    """,
)
def e6_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 25% per-source sample — the "cap overrepresented
    sources" mixture step. The gate nibble (position 2) is
    independent of e6_hash_split's (position 1), so sampling within a
    split keeps both distributions uniform. Reported as per-source
    sampled-vs-total counts; the sampled rows themselves are
    ``WHERE kept`` on the same expression."""
    docs = load(spark, sf_dir, "documents")
    kept = _nibble(2) <= _SAMPLE_MAX
    return (
        docs.select("source", kept.alias("kept"))
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_total"),
            F.sum(F.col("kept").cast("long")).alias("n_sampled"),
        )
    )


@register(
    "e6_token_shards",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id,
             CASE WHEN trim(COALESCE(text, '')) = '' THEN 0
                  ELSE len(regexp_split_to_array(trim(text), '\\s+'))
             END AS n_tok
      FROM documents),
    packed AS (
      SELECT doc_id, n_tok,
             CAST(FLOOR((SUM(n_tok) OVER (ORDER BY doc_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                   ) / {SHARD_TOKENS}) AS BIGINT) AS shard_id
      FROM toks)
    SELECT COALESCE(shard_id, 0) AS shard_id,
           COUNT(*) AS n_docs,
           CAST(SUM(n_tok) AS BIGINT) AS n_tokens
    FROM packed GROUP BY 1
    """,
)
def e6_token_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget sharding, GLOBAL variant — the oracle kernel, not
    the 100 TB plan: a single no-partition window funnels the whole
    corpus's cumulative sum through ONE task.
    ``e6_token_shards_partitioned`` below is the declared scale path
    (same packing semantics per source, parallel across sources);
    this entry exists because a globally-contiguous shard numbering
    is occasionally wanted at small scale and is the simplest
    cross-engine oracle of the packing rule."""
    docs = load(spark, sf_dir, "documents")
    toks = docs.select("doc_id", _n_tokens().alias("n_tok"))
    w = (
        Window.orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    shard = F.floor(
        F.coalesce(F.sum("n_tok").over(w), F.lit(0)) / SHARD_TOKENS
    )
    return (
        toks.withColumn("shard_id", shard)
        .groupBy("shard_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tok").alias("n_tokens"),
        )
    )


@register(
    "e6_token_shards_partitioned",
    oracle=f"""
    WITH toks AS (
      SELECT source, doc_id,
             CASE WHEN trim(COALESCE(text, '')) = '' THEN 0
                  ELSE len(regexp_split_to_array(trim(text), '\\s+'))
             END AS n_tok
      FROM documents),
    packed AS (
      SELECT source, doc_id, n_tok,
             CAST(FLOOR((SUM(n_tok) OVER (PARTITION BY source
                     ORDER BY doc_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                   ) / {SHARD_TOKENS}) AS BIGINT) AS shard_id
      FROM toks)
    SELECT source, COALESCE(shard_id, 0) AS shard_id,
           COUNT(*) AS n_docs,
           CAST(SUM(n_tok) AS BIGINT) AS n_tokens
    FROM packed GROUP BY 1, 2
    """,
)
def e6_token_shards_partitioned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget sharding, PARTITIONED — the declared 100 TB plan.
    The cumulative-sum window is keyed by ``source``: Spark hash-
    partitions on source and each task packs its sources' documents
    independently (shards stay contiguous within a source, shard ids
    are per-source). No single-task global sort appears anywhere in
    the plan — the pre-window exchange is hashpartitioning(source),
    never SinglePartition; ``test_plans`` pins that shape. At real
    scale the partition key would be (source, date) or any key whose
    groups fit a task; the plan shape is identical."""
    docs = load(spark, sf_dir, "documents")
    toks = docs.select("source", "doc_id", _n_tokens().alias("n_tok"))
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    shard = F.floor(
        F.coalesce(F.sum("n_tok").over(w), F.lit(0)) / SHARD_TOKENS
    )
    return (
        toks.withColumn("shard_id", shard)
        .groupBy("source", "shard_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tok").alias("n_tokens"),
        )
    )


@register(
    "e6_temperature_mix",
    oracle="""
    WITH counts AS (
      SELECT lang, COUNT(*) AS n FROM documents GROUP BY lang),
    rates AS (
      SELECT lang, n,
             LEAST(1.0, SQRT(CAST((SELECT MIN(n) FROM counts) AS DOUBLE)
                             / n)) AS rate
      FROM counts),
    gated AS (
      SELECT d.lang, r.n, r.rate,
             CAST(FLOOR(r.rate * 256) AS INT) AS k,
             substring(md5(CAST(d.doc_id AS VARCHAR)), 4, 2) AS gate
      FROM documents d JOIN rates r ON d.lang = r.lang)
    SELECT lang,
           CAST(MAX(n) AS BIGINT) AS n_total,
           ROUND(MAX(rate), 6) AS target_rate,
           CAST(SUM(CASE WHEN k >= 256
                         OR gate < lpad(lower(to_hex(k)), 2, '0')
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_kept
    FROM gated GROUP BY lang
    """,
)
def e6_temperature_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-based mixture rebalancing (alpha = 0.5): each
    language keeps rate = min(1, sqrt(N_min / N_lang)), flattening the
    mixture toward uniform without fully discarding the head — the
    standard rebalance between corpus stats and training sampling
    weights. Two-phase, all scale-safe: (1) per-group counts (tiny —
    one map-side-combined aggregate), (2) broadcast the rates back
    and gate each row on a deterministic 256-bucket md5 slice (hex
    chars 4-5 of md5(doc_id) — independent of the split/sample/eval
    nibbles at positions 1, 2, 3). Membership is engine-reproducible:
    the gate compares two lowercase hex chars lexicographically,
    which equals numeric comparison at fixed width. The kept set is
    exactly the rows a writer would emit; this query reports
    per-group totals/rates/kept so the mixture shift itself is the
    checked artifact."""
    docs = load(spark, sf_dir, "documents")
    counts = docs.groupBy("lang").agg(F.count(F.lit(1)).alias("n"))
    n_min = counts.agg(F.min("n").alias("n_min"))
    rates = counts.crossJoin(F.broadcast(n_min)).select(
        "lang",
        "n",
        F.least(
            F.lit(1.0), F.sqrt(F.col("n_min").cast("double") / F.col("n"))
        ).alias("rate"),
    )
    k = F.floor(F.col("rate") * 256).cast("int")
    gate = F.substring(
        F.md5(F.col("doc_id").cast("string").cast("binary")), 4, 2
    )
    gated = docs.join(F.broadcast(rates), "lang").select(
        "lang",
        "n",
        "rate",
        k.alias("k"),
        gate.alias("gate"),
    )
    kept = F.when(
        (F.col("k") >= 256)
        | (F.col("gate") < F.lpad(F.lower(F.hex(F.col("k"))), 2, "0")),
        F.lit(1),
    ).otherwise(F.lit(0))
    return gated.groupBy("lang").agg(
        F.max("n").cast("long").alias("n_total"),
        F.round(F.max("rate"), 6).alias("target_rate"),
        F.sum(kept).alias("n_kept"),
    )


# Context-window capacity per packed sequence. Real pretraining uses
# 2048-8192; the registered query uses 256 so driver-scale data
# (~1.4k tokens/source at sf0.01) actually crosses sequence
# boundaries and the split/offset algebra gets a non-degenerate
# oracle check. The plan is capacity-independent.
SEQ_LEN = 256


@register(
    "e7_pack_sequences",
    oracle=f"""
    WITH toks AS (
      SELECT source, doc_id,
             CASE WHEN trim(COALESCE(text, '')) = '' THEN 0
                  ELSE len(regexp_split_to_array(trim(text), '\\s+'))
             END AS n_tok
      FROM documents),
    c AS (
      SELECT source, doc_id, n_tok,
             CAST(SUM(n_tok) OVER (PARTITION BY source ORDER BY doc_id
                     ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_end
      FROM toks WHERE n_tok > 0),
    spans AS (
      SELECT source, doc_id, n_tok, cum_end,
             cum_end - n_tok AS cum_start,
             (cum_end - n_tok) // {SEQ_LEN} AS first_seq,
             (cum_end - 1) // {SEQ_LEN} AS last_seq,
             UNNEST(range((cum_end - n_tok) // {SEQ_LEN},
                          (cum_end - 1) // {SEQ_LEN} + 1)) AS seq_idx
      FROM c)
    SELECT source, doc_id,
           CAST(seq_idx AS BIGINT) AS seq_idx,
           CAST(LEAST(cum_end, (seq_idx + 1) * {SEQ_LEN})
                - GREATEST(cum_start, seq_idx * {SEQ_LEN}) AS BIGINT)
             AS tok_in_seq,
           first_seq <> last_seq AS is_split
    FROM spans
    """,
)
def e7_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing (concat-and-chunk, E7): lay every document's
    tokens end-to-end per source and cut the stream into fixed
    SEQ_LEN context windows — the GPT-style pretraining layout, where
    a document may SPAN sequence boundaries. Output is the packing
    manifest: one row per (doc, sequence) span with the token count
    the doc contributes to that sequence and whether the doc was
    split. Distinct from e6_token_shards (which ASSIGNS whole docs to
    budget-bounded shards); packing splits docs so every sequence is
    exactly full — the property the training loader needs.

    Plan: one cumulative-sum window partitioned by source (same
    scale-safe shape as e6_token_shards_partitioned — no global
    sort), then a per-row ``sequence()`` explode whose length is the
    doc's span count (almost always 1; never more than
    n_tok/SEQ_LEN + 1) — output grows by the split count, not
    n_docs × anything. Membership and offsets are pure functions of
    the ordered token stream, so the manifest is engine-reproducible.
    """
    docs = load(spark, sf_dir, "documents")
    toks = docs.select(
        "source", "doc_id", _n_tokens().alias("n_tok")
    ).filter(F.col("n_tok") > 0)
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    c = (
        toks.withColumn("cum_end", F.sum("n_tok").over(w))
        .withColumn("cum_start", F.col("cum_end") - F.col("n_tok"))
        .withColumn("first_seq", F.expr(f"cum_start div {SEQ_LEN}"))
        .withColumn("last_seq", F.expr(f"(cum_end - 1) div {SEQ_LEN}"))
    )
    out = c.withColumn(
        "seq_idx", F.explode(F.sequence("first_seq", "last_seq"))
    )
    tok_in_seq = F.least(
        F.col("cum_end"), (F.col("seq_idx") + 1) * SEQ_LEN
    ) - F.greatest(F.col("cum_start"), F.col("seq_idx") * SEQ_LEN)
    return out.select(
        "source",
        "doc_id",
        F.col("seq_idx").cast("long").alias("seq_idx"),
        tok_in_seq.cast("long").alias("tok_in_seq"),
        (F.col("first_seq") != F.col("last_seq")).alias("is_split"),
    )


@register(
    "e6_domain_quota",
    oracle="""
    WITH ranked AS (
      SELECT source, doc_id, n_chars, md5(text) AS h,
             ROW_NUMBER() OVER (PARTITION BY source
                                ORDER BY md5(text), doc_id) AS rn
      FROM documents
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_kept,
           CAST(SUM(n_chars) AS BIGINT) AS kept_chars,
           MIN(h) AS min_hash,
           MAX(h) AS max_hash
    FROM ranked WHERE rn <= 50
    GROUP BY source
    """,
)
def e6_domain_quota(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-domain quota sampling (corpus mixing's workhorse: cap any
    single source's contribution so one crawl domain cannot dominate
    the training mix): keep at most 50 docs per source, selected
    DETERMINISTICALLY by content hash — md5(text) orders identically
    in every engine and every run, so the kept set is a pure function
    of the data (no RNG, reproducible shards), with doc_id as the
    duplicate-text tiebreaker. Returns per-source audit stats of the
    kept set; the md5 min/max witnesses pin the exact membership.

    Scale: rank-within-group over a quota is the WindowGroupLimit
    pattern — Spark pushes the rn <= 50 limit into the shuffle
    (partial top-50 per map task, then per-source top-50), so the
    full corpus is never sorted; state per source is 50 rows."""
    docs = load(spark, sf_dir, "documents").select(
        "source", "doc_id", "n_chars", F.md5(F.col("text").cast("binary")).alias("h")
    )
    w = Window.partitionBy("source").orderBy("h", "doc_id")
    return (
        docs.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 50)
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_kept"),
            F.sum("n_chars").alias("kept_chars"),
            F.min("h").alias("min_hash"),
            F.max("h").alias("max_hash"),
        )
    )


@register(
    "e6_weighted_sample",
    oracle="""
    WITH pri AS (
      SELECT doc_id, source, length(text) AS w,
             CAST(CAST(concat('0x',
                    substring(md5(CAST(doc_id AS VARCHAR)), 1, 15))
                  AS BIGINT) AS DOUBLE) / length(text) AS priority
      FROM documents WHERE length(text) > 0)
    SELECT CAST(doc_id AS BIGINT) AS doc_id, source,
           CAST(w AS BIGINT) AS w
    FROM pri ORDER BY priority ASC, doc_id LIMIT 100
    """,
)
def e6_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic WEIGHTED sampling without replacement (E6): each
    doc gets priority ``hash(doc_id) / weight`` and the k SMALLEST
    priorities win — the hash plays the uniform variate of the
    A-Res/Efraimidis-Spirakis family, so doubling a doc's weight
    halves its priority and doubles its selection pressure, while the
    md5-derived variate keeps the draw reproducible across engines,
    runs and partitionings (the same determinism contract as the E6
    split/mixture gates).

    Cross-engine exactness without float ceremony: the priority is a
    SINGLE IEEE division of an integer hash by an integer weight —
    division is correctly rounded, so DuckDB and the JVM produce the
    bit-identical double and the top-k cut cannot straddle an ulp
    (the classic u^(1/w) formulation would put a libm `pow` between
    the engines). doc_id breaks exact ties.

    Scale: priority is a codegen'd per-row expression; the top-k is
    TakeOrderedAndProject (per-partition heaps + driver merge of k),
    never a full sort. Weight here = document length (favor long
    docs); any positive integer column works.

    NOTE the shared hash contract: Spark's ``hash()`` (Murmur3) and
    DuckDB's ``hash()`` differ, so both sides use the SAME derived
    variate — the low 61 bits of each engine's own hash would
    diverge. Instead both compute the variate from md5 hex (engine-
    independent), parsed to a long."""
    docs = load(spark, sf_dir, "documents").filter(F.length("text") > 0)
    # engine-independent variate: first 15 md5 hex chars -> 60-bit int
    h = F.conv(
        F.substring(F.md5(F.col("doc_id").cast("string").cast("binary")), 1, 15),
        16,
        10,
    ).cast("double")
    pri = h / F.length("text").cast("double")
    return (
        docs.select(
            F.col("doc_id").cast("bigint").alias("doc_id"),
            "source",
            F.length("text").cast("bigint").alias("w"),
            pri.alias("_pri"),
        )
        .orderBy("_pri", "doc_id")
        .limit(100)
        .drop("_pri")
    )
