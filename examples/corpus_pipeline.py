"""End-to-end LLM training-corpus pipeline on the lakehouse.

The composition story the individual operators add up to: raw
document drops land in an ACID lake, get quality-filtered,
exact- and near-deduplicated, decontaminated against an eval set,
split deterministically, capped per source, and packed into
token-budget shards — every stage a DataFrame plan over the same
transactional tables, with the corpus-level stats maintained
incrementally instead of recomputed.

Run: python examples/corpus_pipeline.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import tempfile
import uuid

from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from market_data_lakehouse_spark.mv import IncrementalAggView  # noqa: E402
from market_data_lakehouse_spark.queries.catalog import load  # noqa: E402
from market_data_lakehouse_spark.session import get_spark  # noqa: E402
from market_data_lakehouse_spark.txnlog import TransactionalLake  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("corpus_pipeline")
    root = os.path.join(
        tempfile.gettempdir(), f"corpus_{uuid.uuid4().hex[:8]}"
    )

    # --- 1. ingest: raw drops into an ACID corpus lake -----------------
    docs = load(spark, sf_dir, "documents")
    corpus = TransactionalLake(
        spark, f"{root}/corpus", partition_by=("source",)
    )
    for half in (0, 1):  # two "drops", each one atomic commit
        corpus.append(docs.filter(F.col("doc_id") % 2 == half))
    stats = IncrementalAggView(
        spark, corpus, f"{root}/corpus_stats",
        group_by=["source"], sum_cols=["n_chars"],
    )
    stats.refresh()
    print("ingested:", corpus.snapshot().count(), "docs in",
          corpus.version + 1, "commits")

    # --- 2. quality gate: drop junk, as logged DML ---------------------
    snap0 = corpus.snapshot()
    n_tokens = F.size(F.split(F.trim("text"), r"\s+"))
    alpha_ratio = F.length(F.regexp_replace("text", r"[^A-Za-z]", "")) / (
        F.greatest(F.length("text"), F.lit(1))
    )
    bad_ids = snap0.filter(
        (n_tokens < 5) | (alpha_ratio < 0.2)
    ).select("doc_id")
    n_bad = bad_ids.count()
    if n_bad:
        ids = [r.doc_id for r in bad_ids.collect()]
        corpus.delete_where(
            f"doc_id IN ({','.join(str(i) for i in ids)})"
        )
    stats.refresh()  # folds ONLY the delete commit
    print(f"quality gate: dropped {n_bad};",
          "per-source stats after:",
          sorted((r.source, r.n_rows) for r in stats.view().collect())[:3])

    # --- 3. exact + near dedup -----------------------------------------
    from market_data_lakehouse_spark.queries.dedup import simhash64

    snap = corpus.snapshot()
    exact_dups = (
        snap.groupBy(F.md5(F.col("text").cast("binary")).alias("h"))
        .agg(F.min("doc_id").alias("keep"), F.collect_list("doc_id").alias("ids"))
        .select(F.explode("ids").alias("doc_id"), "keep")
        .filter(F.col("doc_id") != F.col("keep"))
    )
    # near: identical 64-bit SimHash = same shingle profile
    sigs = simhash64(snap.select("doc_id", "text"))
    near = (
        sigs.groupBy("simhash")
        .agg(F.min("doc_id").alias("keep"), F.collect_list("doc_id").alias("ids"))
        .select(F.explode("ids").alias("doc_id"), "keep")
        .filter(F.col("doc_id") != F.col("keep"))
    )
    to_drop = (
        exact_dups.select("doc_id").union(near.select("doc_id")).distinct()
    )
    n_drop = to_drop.count()
    if n_drop:
        ids = [r.doc_id for r in to_drop.collect()]
        corpus.delete_where(
            f"doc_id IN ({','.join(str(i) for i in ids)})"
        )
    print(f"dedup: removed {n_drop} exact/near duplicates")

    # --- 4. decontaminate against a held-out eval set ------------------
    eval_set = docs.filter(F.col("doc_id") % 97 == 0).select(
        F.md5(F.col("text").cast("binary")).alias("h")
    )
    clean = corpus.snapshot().join(
        F.broadcast(eval_set),
        F.md5(F.col("text").cast("binary")) == F.col("h"),
        "left_anti",
    )

    # --- 5. deterministic split + per-source quota ---------------------
    bucket = F.pmod(F.xxhash64("doc_id"), F.lit(100))
    split = clean.withColumn(
        "split",
        F.when(bucket < 90, "train").when(bucket < 95, "val").otherwise(
            "test"
        ),
    )
    from pyspark.sql import Window

    w = Window.partitionBy("source", "split").orderBy(
        F.md5(F.col("text").cast("binary")), "doc_id"
    )
    capped = split.withColumn("rn", F.row_number().over(w)).filter(
        F.col("rn") <= 200
    )
    print("split sizes:", sorted(
        (r.split, r.n)
        for r in capped.groupBy("split").agg(F.count("*").alias("n")).collect()
    ))

    # --- 6. pack into token-budget shards ------------------------------
    n_tok = F.size(F.split(F.trim("text"), r"\s+"))
    shard_w = Window.partitionBy("split", "source").orderBy("doc_id")
    packed = (
        capped.withColumn("n_tok", n_tok)
        .withColumn(
            "shard",
            ((F.sum("n_tok").over(shard_w) - F.col("n_tok")) / 4096)
            .cast("long"),
        )
    )
    out = f"{root}/shards"
    packed.select("split", "source", "shard", "doc_id", "text").write.mode(
        "overwrite"
    ).partitionBy("split").parquet(out)
    n_shards = packed.select("split", "source", "shard").distinct().count()
    print(f"packed {packed.count()} docs into {n_shards} shards -> {out}")

    import shutil

    shutil.rmtree(root, ignore_errors=True)
    print("corpus pipeline OK")


if __name__ == "__main__":
    main()
