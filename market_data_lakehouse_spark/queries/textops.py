"""Text-analysis operators over the documents table — SURVEY §2.12
E1/E4: exact dedup, token counting, language ID, quality scoring,
document fingerprinting.

All hot-path logic is built-in JVM expressions (split / array_* /
md5 / regexp) — no Python UDFs: at 100 TB these run inside
whole-stage codegen with only one shuffle (the dedup groupBy).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from market_data_lakehouse_spark.queries.catalog import (
    doc_nibble,
    load,
    register,
)

# Tiny per-language stopword lists for the n-gram/stopword language
# heuristic. Chosen to discriminate the 5 langs in the testdata.
STOPWORDS = {
    "en": ("the", "a", "and", "of", "to", "is", "fast", "slow"),
    "es": ("el", "la", "de", "que", "y", "los", "una", "por"),
    "de": ("der", "die", "das", "und", "ist", "ein", "mit", "von"),
    "fr": ("le", "la", "les", "des", "et", "est", "une", "pour"),
    "zh": ("de5", "shi4", "zai4", "he2", "le5", "you3", "wo3", "ta1"),
}
_LANG_ORDER = ("en", "es", "de", "fr", "zh")


def _tokens(col: str = "text") -> F.Column:
    return F.split(F.trim(F.lower(F.col(col))), r"\s+")


def _fingerprint(col: str = "text") -> F.Column:
    """Normalized content fingerprint: collapse whitespace, lowercase,
    md5. THE content-identity definition — e4_fingerprint publishes
    it, e1_decontaminate matches on it; tune it here and every stage
    stays consistent."""
    return F.md5(F.lower(F.regexp_replace(col, r"\s+", " ")))


@register(
    "e1_exact_dedup",
    oracle="""
    SELECT CAST(MIN(doc_id) AS BIGINT) AS doc_id, COUNT(*) AS n_copies
    FROM documents GROUP BY text
    """,
)
def e1_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup by content hash-groupBy: canonical row = lowest
    doc_id per distinct text. One shuffle on the (hashed) text; at
    100 TB group on md5(text) instead of the raw text to shrink the
    shuffle payload — same result, declared below as
    e1_dedup_by_hash."""
    docs = load(spark, sf_dir, "documents")
    return (
        docs.groupBy("text")
        .agg(F.min("doc_id").alias("doc_id"), F.count(F.lit(1)).alias("n_copies"))
        .select("doc_id", "n_copies")
    )


@register(
    "e1_dedup_by_hash",
    oracle="""
    SELECT CAST(MIN(doc_id) AS BIGINT) AS doc_id, COUNT(*) AS n_copies,
           md5(text) AS content_hash
    FROM documents GROUP BY md5(text)
    """,
)
def e1_dedup_by_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale variant of exact dedup: shuffle 32-byte md5 keys, not
    document bodies. (md5 collisions are negligible at any corpus
    size that fits 100 TB.)"""
    docs = load(spark, sf_dir, "documents")
    return (
        docs.groupBy(F.md5("text").alias("content_hash"))
        .agg(F.min("doc_id").alias("doc_id"), F.count(F.lit(1)).alias("n_copies"))
        .select("doc_id", "n_copies", "content_hash")
    )


@register(
    "e4_token_stats",
    oracle=r"""
    SELECT doc_id,
           CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT)
             AS n_tokens,
           LENGTH(text) AS n_chars_actual,
           CAST(LENGTH(text) - LENGTH(REPLACE(text, ' ', '')) AS BIGINT)
             AS n_spaces
    FROM documents
    """,
)
def e4_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whitespace token counting + char stats per document (E4)."""
    docs = load(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.size(F.split(F.trim(F.col("text")), r"\s+")).cast("long").alias(
            "n_tokens"
        ),
        F.length("text").cast("long").alias("n_chars_actual"),
        (
            F.length("text") - F.length(F.replace(F.col("text"), F.lit(" ")))
        ).cast("long").alias("n_spaces"),
    )


def _lang_oracle() -> str:
    hits = ",\n           ".join(
        "CAST(len(list_intersect(toks, {lst})) AS BIGINT) AS hits_{lang}".format(
            lang=lang,
            lst="[" + ", ".join(f"'{w}'" for w in STOPWORDS[lang]) + "]",
        )
        for lang in _LANG_ORDER
    )
    # first-max in _LANG_ORDER via a GREATEST + CASE chain
    greatest = "GREATEST(" + ", ".join(f"hits_{l}" for l in _LANG_ORDER) + ")"
    case = "CASE " + " ".join(
        f"WHEN hits_{l} = {greatest} THEN '{l}'" for l in _LANG_ORDER
    ) + " END"
    return f"""
    WITH toks AS (
      SELECT doc_id, lang,
             regexp_split_to_array(trim(lower(text)), '\\s+') AS toks
      FROM documents),
    scored AS (
      SELECT doc_id, lang,
           {hits}
      FROM toks)
    SELECT doc_id, lang AS lang_actual, {case} AS lang_pred
    FROM scored
    """


EDIT_D = 48  # levenshtein near-dup threshold: on this corpus the
# 1st-pctile same-source pair distance is ~51-55, true near-dups sit
# at 4-48, so the band separates dups from the background cleanly


@register(
    "e1_fuzzy_dedup_editdist",
    oracle=f"""
    SELECT a.doc_id AS a_id, b.doc_id AS b_id,
           CAST(levenshtein(lower(trim(a.text)), lower(trim(b.text)))
                AS BIGINT) AS dist
    FROM documents a JOIN documents b
      ON a.source = b.source AND a.doc_id < b.doc_id
     AND abs(len(a.text) - len(b.text)) <= {EDIT_D}
    WHERE levenshtein(lower(trim(a.text)), lower(trim(b.text))) <= {EDIT_D}
    """,
)
def e1_fuzzy_dedup_editdist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edit-distance fuzzy dedup: near-dup pairs by Levenshtein
    distance — the character-level complement of token-level Jaccard
    (catches typo/OCR variants that share few shingles). Both engines
    ship the same classic Levenshtein, so the pair set is exact, no
    bounded-error gate needed.

    Scale shape: the self-join equi-keys on source (one shuffle);
    the length-difference band is applied BEFORE the distance call
    and is exact pruning, not a heuristic — levenshtein(a, b) >=
    abs(len(a) - len(b)), so no qualifying pair is lost. Quadratic
    work is confined to same-source blocks; at 100 TB band the join
    further on floor(length / {EDIT_D}) +- 1 buckets (same exactness
    argument) so block size is bounded by the length histogram, not
    the source cardinality."""
    docs = load(spark, sf_dir, "documents").select(
        "doc_id", "source", F.lower(F.trim("text")).alias("t"),
        F.length("text").alias("l"),
    )
    a = docs.alias("a")
    b = docs.alias("b")
    return (
        a.join(
            b,
            (F.col("a.source") == F.col("b.source"))
            & (F.col("a.doc_id") < F.col("b.doc_id"))
            & (
                F.abs(F.col("a.l") - F.col("b.l")) <= EDIT_D
            ),
        )
        .select(
            F.col("a.doc_id").alias("a_id"),
            F.col("b.doc_id").alias("b_id"),
            F.levenshtein(F.col("a.t"), F.col("b.t"))
            .cast("bigint")
            .alias("dist"),
        )
        .filter(F.col("dist") <= EDIT_D)
    )


@register("e4_lang_id", oracle=_lang_oracle())
def e4_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stopword-hit language identification (E4): score = number of
    distinct stopwords of each language present; predict the
    first-maximum in a fixed language order. Pure array expressions."""
    docs = load(spark, sf_dir, "documents")
    toks = docs.select("doc_id", "lang", _tokens().alias("toks"))
    scored = toks.select(
        "doc_id",
        "lang",
        *[
            F.size(
                F.array_intersect(
                    "toks", F.array(*[F.lit(w) for w in STOPWORDS[lang]])
                )
            ).cast("long").alias(f"hits_{lang}")
            for lang in _LANG_ORDER
        ],
    )
    best = F.greatest(*[F.col(f"hits_{l}") for l in _LANG_ORDER])
    pred = F.lit(None).cast("string")
    chain = None
    for lang in _LANG_ORDER:
        cond = F.col(f"hits_{lang}") == best
        chain = F.when(cond, lang) if chain is None else chain.when(cond, lang)
    pred = chain
    return scored.select(
        "doc_id", F.col("lang").alias("lang_actual"), pred.alias("lang_pred")
    )


@register(
    "e4_quality_score",
    oracle=r"""
    SELECT doc_id,
           LENGTH(text) AS n_chars_actual,
           CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT)
             AS n_tokens,
           ROUND(CAST(LENGTH(text) - LENGTH(REPLACE(text, ' ', '')) AS DOUBLE)
                 / LENGTH(text), 6) AS space_ratio,
           ROUND(CAST(LENGTH(REPLACE(trim(text), ' ', '')) AS DOUBLE)
                 / len(regexp_split_to_array(trim(text), '\s+')), 4)
             AS avg_token_len,
           ROUND(LEAST(1.0, CAST(LENGTH(text) AS DOUBLE) / 500.0), 6)
             AS len_score
    FROM documents
    """,
)
def e4_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document quality heuristics (E4): length/space ratios, average
    token length, saturating length score — all codegen'd."""
    docs = load(spark, sf_dir, "documents")
    n = F.length("text")
    trimmed = F.trim(F.col("text"))
    n_tok = F.size(F.split(trimmed, r"\s+"))
    nonspace = F.length(F.replace(trimmed, F.lit(" ")))
    return docs.select(
        "doc_id",
        n.cast("long").alias("n_chars_actual"),
        n_tok.cast("long").alias("n_tokens"),
        F.round(
            (n - F.length(F.replace(F.col("text"), F.lit(" ")))).cast("double")
            / n,
            6,
        ).alias("space_ratio"),
        F.round(nonspace.cast("double") / n_tok, 4).alias("avg_token_len"),
        F.round(F.least(F.lit(1.0), n.cast("double") / 500.0), 6).alias(
            "len_score"
        ),
    )


@register(
    "e4_bpe_token_count",
    oracle=r"""
    SELECT doc_id,
           CAST(len(regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]'))
                AS BIGINT) AS n_subtokens,
           CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT)
             AS n_ws_tokens
    FROM documents
    """,
)
def e4_bpe_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE-ish token counting (E4): pre-tokenize with the
    letter-run / digit-run / punctuation regex (the GPT-2-style
    pre-tokenizer shape) and count, alongside whitespace tokens —
    the standard cheap token-budget estimator for training-data
    pipelines."""
    docs = load(spark, sf_dir, "documents")
    bpe = F.regexp_extract_all(
        "text", F.lit(r"[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]"), F.lit(0)
    )
    return docs.select(
        "doc_id",
        F.size(bpe).cast("long").alias("n_subtokens"),
        F.size(F.split(F.trim(F.col("text")), r"\s+")).cast("long").alias(
            "n_ws_tokens"
        ),
    )


def _rk_spans(data: bytes) -> list[tuple[int, int]]:
    """THE Rabin-Karp content-defined chunk boundary kernel — the
    single source of truth shared by the public fingerprint query and
    the e4_rolling_chunks driver gate (ADVICE r8: the gate previously
    re-implemented this loop, so a regression here could not go
    driver-red). Returns contiguous [start, end) byte spans covering
    ``data``; boundaries where the 16-byte rolling hash matches the
    mask (~64-byte expected chunks)."""
    B, MOD, WIN, MASK = 257, (1 << 61) - 1, 16, 0x3F
    bw = pow(B, WIN - 1, MOD)
    h, start = 0, 0
    spans: list[tuple[int, int]] = []
    for i, byte in enumerate(data):
        if i >= WIN:
            h = (h - data[i - WIN] * bw) % MOD
        h = (h * B + byte) % MOD
        if i >= WIN - 1 and (h & MASK) == MASK:
            spans.append((start, i + 1))
            start = i + 1
    if start < len(data):
        spans.append((start, len(data)))
    return spans


def rolling_chunk_fingerprints(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Content-defined chunking via Rabin-Karp rolling hash (E4
    "document fingerprinting"): chunk boundaries where the 16-byte
    rolling hash hits a mask — identical content produces identical
    chunk fingerprints regardless of position, the dedup primitive
    for near-identical long documents. Sequential per document, so it
    runs in an Arrow-batched mapInPandas (partition-parallel across
    documents). The registered driver entry (e4_rolling_chunks)
    wraps this in the bounded-error gate; this function returns the
    fingerprint-rich rows."""
    from collections.abc import Iterator

    import pandas as pd

    from pyspark.sql import types as T

    out_schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("n_chunks", T.LongType()),
            T.StructField("first_chunk_fp", T.LongType()),
            T.StructField("min_chunk_fp", T.LongType()),
        ]
    )

    def chunker(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import zlib

        for pdf in batches:
            ids, counts, firsts, mins = [], [], [], []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                data = text.encode()
                fps = [
                    zlib.crc32(data[s:e]) for s, e in _rk_spans(data)
                ]
                ids.append(doc_id)
                counts.append(len(fps))
                firsts.append(fps[0] if fps else None)
                mins.append(min(fps) if fps else None)
            yield pd.DataFrame(
                {
                    "doc_id": ids,
                    "n_chunks": counts,
                    "first_chunk_fp": firsts,
                    "min_chunk_fp": mins,
                }
            )

    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    return docs.mapInPandas(chunker, schema=out_schema)


@register(
    "e4_rolling_chunks",
    oracle="""
    SELECT doc_id,
           CAST(octet_length(encode(coalesce(text, ''))) AS BIGINT)
             AS covered_bytes,
           TRUE AS contiguous,
           CAST(CASE WHEN octet_length(encode(coalesce(text, ''))) > 0
                     THEN 1 ELSE 0 END AS BIGINT) AS has_chunks
    FROM documents
    """,
)
def e4_rolling_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling-hash chunker under the bounded-error gate (r8, the
    a7/a9 pattern — was rows-only): the boundary positions are
    hash-engine-specific, but the chunker's CONTRACT is exact — the
    per-document sum of chunk byte-spans must equal the document's
    byte length (DuckDB recomputes it from the raw text), the spans
    must be contiguous from offset 0, and every non-empty document
    must produce at least one chunk. A chunker that drops a byte,
    overlaps, or loses a document goes driver-red. Fingerprint-rich
    rows stay available via rolling_chunk_fingerprints."""
    from collections.abc import Iterator

    import pandas as pd

    from pyspark.sql import types as T

    out_schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("covered_bytes", T.LongType()),
            T.StructField("contiguous", T.BooleanType()),
            T.StructField("has_chunks", T.LongType()),
        ]
    )

    def gate(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, covered, contig, hasc = [], [], [], []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                data = (text or "").encode()
                # the REAL chunker's spans (shared _rk_spans kernel),
                # so a coverage/contiguity bug in it goes driver-red
                spans = _rk_spans(data)
                ids.append(doc_id)
                covered.append(sum(e - s0 for s0, e in spans))
                contig.append(
                    all(
                        s0 == (spans[j - 1][1] if j else 0)
                        for j, (s0, _e) in enumerate(spans)
                    )
                    and (not spans or spans[-1][1] == len(data))
                )
                hasc.append(len(spans) and 1 or 0)
            yield pd.DataFrame(
                {
                    "doc_id": ids,
                    "covered_bytes": covered,
                    "contiguous": contig,
                    "has_chunks": hasc,
                }
            )

    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    return docs.mapInPandas(gate, schema=out_schema)


@register(
    "e4_position_chunks",
    oracle="""
    WITH starts AS (
      SELECT doc_id, coalesce(text, '') AS text,
             unnest(generate_series(
               1, greatest(length(coalesce(text, '')), 1), 150)) AS s
      FROM documents)
    SELECT doc_id,
           CAST(s AS BIGINT) AS chunk_start,
           CAST((s - 1) // 150 AS BIGINT) AS chunk_idx,
           CAST(length(substr(text, s, 200)) AS BIGINT) AS chunk_len,
           md5(substr(text, s, 200)) AS chunk_md5
    FROM starts
    """,
)
def e4_position_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-size position-based chunking (200-char windows, stride
    150 = 50-char overlap) — the standard LLM-training chunker and
    the declarative twin of e4_rolling_chunks' content-defined
    chunker (carried r5 #8): where the rolling hash needs a
    sequential Arrow kernel, position chunking is pure codegen —
    ``sequence()`` generates each document's window starts, explode
    fans them out, ``substring`` slices. No shuffle at all: the whole
    plan is scan -> generate -> project, embarrassingly parallel at
    any scale. Chunk identity is the md5 of the chunk text (shared
    semantics with the DuckDB generate_series oracle)."""
    docs = load(spark, sf_dir, "documents").select(
        "doc_id", F.coalesce(F.col("text"), F.lit("")).alias("text")
    )
    starts = F.sequence(
        F.lit(1), F.greatest(F.length("text"), F.lit(1)), F.lit(150)
    )
    chunk = F.expr("substring(text, chunk_start, 200)")
    return (
        docs.select("doc_id", "text", F.explode(starts).alias("chunk_start"))
        .select(
            "doc_id",
            F.col("chunk_start").cast("bigint").alias("chunk_start"),
            F.expr("(chunk_start - 1) div 150").cast("bigint").alias(
                "chunk_idx"
            ),
            F.length(chunk).cast("bigint").alias("chunk_len"),
            F.md5(chunk).alias("chunk_md5"),
        )
    )


@register(
    "e4_tfidf",
    oracle=r"""
    WITH toks AS (
      SELECT doc_id,
             unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS term
      FROM documents),
    tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM toks GROUP BY 1, 2),
    dfreq AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY 1),
    n AS (SELECT COUNT(*) AS n_docs FROM documents)
    SELECT tf.doc_id, tf.term, tf.tf, dfreq.df,
           ROUND(tf.tf * LN(CAST(n.n_docs AS DOUBLE) / dfreq.df), 6) AS tfidf
    FROM tf JOIN dfreq ON tf.term = dfreq.term CROSS JOIN n
    """,
)
def e4_tfidf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TF-IDF per (document, term) — the classic text-featurization
    aggregate (E4). Term counts and document frequencies are two
    codegen'd aggregations; the idf join broadcasts the (small)
    term-df table. At 100 TB the df table is itself large — it would
    shuffle-join on term, still one pass over the corpus."""
    docs = load(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.explode(_tokens()).alias("term")
    )
    tf = toks.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n_docs = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    return (
        tf.join(F.broadcast(dfreq), "term")
        .crossJoin(F.broadcast(n_docs))
        .select(
            "doc_id",
            "term",
            "tf",
            "df",
            F.round(
                F.col("tf") * F.log(F.col("n_docs").cast("double") / F.col("df")),
                6,
            ).alias("tfidf"),
        )
    )


@register(
    "e4_fingerprint",
    oracle=r"""
    SELECT doc_id,
           md5(lower(regexp_replace(text, '\s+', ' ', 'g'))) AS fp
    FROM documents
    """,
)
def e4_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Normalized content fingerprint (E4): collapse whitespace,
    lowercase, md5 — engine-portable and deterministic."""
    docs = load(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        _fingerprint().alias("fp"),
    )


@register(
    "e4_corpus_clean",
    oracle=r"""
    WITH scored AS (
      SELECT doc_id, source, text,
             LENGTH(text) AS n_chars,
             CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT)
               AS n_tokens
      FROM documents),
    quality AS (
      SELECT * FROM scored
      WHERE n_chars >= 20
        AND n_tokens >= 4
        AND CAST(LENGTH(REPLACE(trim(text), ' ', '')) AS DOUBLE) / n_tokens
              BETWEEN 2.0 AND 15.0),
    kept AS (
      SELECT MIN(doc_id) AS doc_id, arg_min(source, doc_id) AS source,
             ANY_VALUE(n_tokens) AS n_tokens
      FROM quality GROUP BY md5(text))
    SELECT source,
           COUNT(*) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS n_tokens_total,
           ROUND(AVG(CAST(n_tokens AS DOUBLE)), 4) AS avg_tokens
    FROM kept GROUP BY source
    """,
)
def e4_corpus_clean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end corpus-cleaning pipeline in ONE declared plan —
    the shape of a pretraining data-prep job: quality gate (length,
    token count, average token length) -> exact dedup keep-lowest-id
    (shuffle on md5, never the body) -> per-source corpus stats.
    Every stage is built-in expressions; one scan, two shuffles
    (dedup groupBy, stats groupBy), both with map-side partial
    aggregation. The kept copy is MIN(doc_id) and its attributes
    travel WITH it: source comes from min_by(source, doc_id), not an
    independent MIN(source) — copies of a text spanning sources must
    credit the source of the document actually kept. (ANY_VALUE is
    safe only for n_tokens: identical texts have identical token
    stats.)"""
    docs = load(spark, sf_dir, "documents")
    trimmed = F.trim(F.col("text"))
    n_tokens = F.size(F.split(trimmed, r"\s+")).cast("long")
    scored = docs.select(
        "doc_id",
        "source",
        "text",
        F.length("text").alias("n_chars"),
        n_tokens.alias("n_tokens"),
    )
    avg_tok_len = (
        F.length(F.replace(F.trim(F.col("text")), F.lit(" "))).cast("double")
        / F.col("n_tokens")
    )
    quality = scored.filter(
        (F.col("n_chars") >= 20)
        & (F.col("n_tokens") >= 4)
        & avg_tok_len.between(2.0, 15.0)
    )
    kept = quality.groupBy(F.md5("text").alias("_h")).agg(
        F.min("doc_id").alias("doc_id"),
        F.min_by("source", "doc_id").alias("source"),
        F.any_value("n_tokens").alias("n_tokens"),
    )
    return kept.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("n_tokens_total"),
        F.round(F.avg(F.col("n_tokens").cast("double")), 4).alias(
            "avg_tokens"
        ),
    )


@register(
    "e4_pii_redaction",
    oracle=r"""
    SELECT doc_id,
           regexp_replace(
             regexp_replace(text,
               '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>',
               'g'),
             '\d{6,}', '<NUM>', 'g') AS redacted,
           CAST(len(regexp_extract_all(text,
               '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS BIGINT)
             AS n_emails,
           CAST(len(regexp_extract_all(text, '\d{6,}')) AS BIGINT)
             AS n_long_numbers
    FROM documents
    """,
)
def e4_pii_redaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrubbing stage (E4): mask emails and long digit runs
    (ids, phone-like numbers) and count what was removed — the
    standard pretraining hygiene pass. Pure codegen'd regexp over one
    scan; the counts make redaction auditable per document."""
    docs = load(spark, sf_dir, "documents")
    email = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
    longnum = r"\d{6,}"
    return docs.select(
        "doc_id",
        F.regexp_replace(
            F.regexp_replace("text", email, "<EMAIL>"), longnum, "<NUM>"
        ).alias("redacted"),
        F.regexp_count("text", F.lit(email)).cast("long").alias("n_emails"),
        F.regexp_count("text", F.lit(longnum)).cast("long").alias(
            "n_long_numbers"
        ),
    )


@register(
    "e4_ngram_freq",
    oracle=r"""
    WITH toks AS (
      SELECT unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS t
      FROM documents WHERE text IS NOT NULL AND trim(text) <> '')
    SELECT t AS token, COUNT(*) AS freq
    FROM toks GROUP BY t
    ORDER BY freq DESC, token LIMIT 50
    """,
)
def e4_ngram_freq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus token-frequency top-50 (E4): the vocabulary-analysis
    pass before tokenizer training. Explode -> map-side-combined
    count -> TakeOrderedAndProject; the shuffle carries one row per
    distinct token per partition, never the corpus."""
    docs = load(spark, sf_dir, "documents").filter(
        F.col("text").isNotNull() & (F.trim("text") != "")
    )
    toks = docs.select(
        F.explode(F.split(F.trim(F.lower(F.col("text"))), r"\s+")).alias(
            "token"
        )
    )
    return (
        toks.groupBy("token")
        .agg(F.count(F.lit(1)).alias("freq"))
        .orderBy(F.desc("freq"), "token")
        .limit(50)
    )


@register(
    "e1_decontaminate",
    oracle="""
    WITH fp AS (
      SELECT doc_id, source,
             md5(lower(regexp_replace(text, '\\s+', ' ', 'g'))) AS fp,
             substring(md5(CAST(doc_id AS VARCHAR)), 3, 1) = 'f' AS is_eval
      FROM documents),
    eval_fps AS (SELECT DISTINCT fp FROM fp WHERE is_eval),
    train AS (
      SELECT t.source, t.fp,
             EXISTS (SELECT 1 FROM eval_fps e WHERE e.fp = t.fp)
               AS contaminated
      FROM fp t WHERE NOT t.is_eval)
    SELECT source,
           COUNT(*) AS n_train,
           CAST(SUM(CASE WHEN contaminated THEN 1 ELSE 0 END) AS BIGINT)
             AS n_contaminated,
           CAST(SUM(CASE WHEN contaminated THEN 0 ELSE 1 END) AS BIGINT)
             AS n_clean
    FROM train GROUP BY source
    """,
)
def e1_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train/eval decontamination — the pipeline stage that removes
    benchmark leakage before pretraining. The eval set is a
    deterministic 1/16 hash slice (3rd md5 nibble of doc_id = 'f' —
    independent of e6's split/sample nibbles); membership is by
    normalized-content fingerprint (whitespace-collapsed lowercase
    md5), so an eval document's near-verbatim copy in the training
    set is caught regardless of doc_id. The probe is a left-semi
    join on the 32-byte fingerprint with NO forced broadcast hint:
    an eval/benchmark set is usually tiny (AQE converts the join to
    a broadcast probe at runtime and the training corpus is never
    shuffled), but "1/16 of the corpus" is unbounded at 100 TB and a
    forced hint would OOM exactly like an ungated merge source — the
    size decision belongs to AQE's runtime stats, matching the
    size-gated discipline in TransactionalLake.merge. Reported as
    per-source contamination counts; the cleaned corpus itself is
    the anti-join with the identical build side."""
    docs = load(spark, sf_dir, "documents")
    tagged = docs.select(
        "source",
        _fingerprint().alias("fp"),
        (doc_nibble(3) == "f").alias("is_eval"),
    )
    eval_fps = tagged.filter("is_eval").select("fp").distinct()
    train = tagged.filter(~F.col("is_eval"))
    hit = train.join(eval_fps, "fp", "left_semi").groupBy(
        "source"
    ).agg(F.count(F.lit(1)).alias("n_contaminated"))
    total = train.groupBy("source").agg(F.count(F.lit(1)).alias("n_train"))
    return total.join(hit, "source", "left").select(
        "source",
        "n_train",
        F.coalesce("n_contaminated", F.lit(0)).alias("n_contaminated"),
        (F.col("n_train") - F.coalesce("n_contaminated", F.lit(0))).alias(
            "n_clean"
        ),
    )


@register(
    "e4_repetition_score",
    oracle=r"""
    WITH ex AS (
      SELECT doc_id,
             unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS tok
      FROM documents WHERE text IS NOT NULL AND trim(text) <> ''),
    per_tok AS (
      SELECT doc_id, tok, COUNT(*) AS c FROM ex GROUP BY doc_id, tok)
    SELECT doc_id,
           CAST(SUM(c) AS BIGINT) AS n_tokens,
           CAST(COUNT(*) AS BIGINT) AS n_distinct,
           ROUND(CAST(MAX(c) AS DOUBLE) / SUM(c), 6) AS top_token_ratio,
           ROUND(CAST(COUNT(*) AS DOUBLE) / SUM(c), 6) AS type_token_ratio
    FROM per_tok GROUP BY doc_id
    """,
)
def e4_repetition_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repetition-based quality scoring (the Gopher/MassiveText rule
    family): a document dominated by one repeated token (high
    top_token_ratio) or with low vocabulary diversity (low
    type_token_ratio) is boilerplate/spam and gets filtered before
    training. ONE exchange total: documents repartition by doc_id
    BEFORE the explode (each doc's text crosses the wire once), and
    hashpartitioning(doc_id) satisfies both downstream groupings —
    (doc_id, tok) because the partition keys are a subset of the
    clustering keys, and the doc-level rollup trivially — so neither
    aggregate shuffles. The naive explode-then-group plan costs two
    exchanges of comparable bytes (hashpartitioning(doc_id, tok)
    does NOT satisfy the doc_id-only rollup); pinned in
    test_plans."""
    docs = load(spark, sf_dir, "documents").filter(
        F.col("text").isNotNull() & (F.trim("text") != "")
    )
    per_tok = (
        docs.repartition("doc_id")
        .select("doc_id", F.explode(_tokens()).alias("tok"))
        .groupBy("doc_id", "tok")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    return per_tok.groupBy("doc_id").agg(
        F.sum("c").alias("n_tokens"),
        F.count(F.lit(1)).alias("n_distinct"),
        F.round(F.max("c").cast("double") / F.sum("c"), 6).alias(
            "top_token_ratio"
        ),
        F.round(F.count(F.lit(1)).cast("double") / F.sum("c"), 6).alias(
            "type_token_ratio"
        ),
    )


_CONTAM_N = 5  # tokens per contamination shingle


@register(
    "e1_contamination_ngram",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, source,
             regexp_split_to_array(trim(lower(text)), '\\s+') AS t,
             substring(md5(CAST(doc_id AS VARCHAR)), 3, 1) = 'f' AS is_eval
      FROM documents),
    grams AS (
      SELECT doc_id, source, is_eval,
             unnest(list_distinct(list_transform(
               range(1, len(t) - {_CONTAM_N - 2}),
               i -> md5(array_to_string(t[i:i+{_CONTAM_N - 1}], ' '))
             ))) AS g
      FROM toks),
    eval_g AS (SELECT DISTINCT g FROM grams WHERE is_eval),
    train_flag AS (
      SELECT doc_id, source,
             MAX(CASE WHEN g IN (SELECT g FROM eval_g)
                 THEN 1 ELSE 0 END) AS hit
      FROM grams WHERE NOT is_eval GROUP BY doc_id, source)
    SELECT source,
           COUNT(*) AS n_train,
           CAST(SUM(hit) AS BIGINT) AS n_flagged
    FROM train_flag GROUP BY source
    """,
)
def e1_contamination_ngram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N-gram-overlap contamination detection — the standard
    decontamination rule (exact-fingerprint matching in
    e1_decontaminate misses PARTIAL inclusion; sharing any
    _CONTAM_N-token shingle with an eval document flags the training
    document). Same deterministic eval slice as e1_decontaminate
    (3rd md5 nibble = 'f'). Scale shape: per-doc DISTINCT shingle
    hashes (array ops, no shuffle), explode, one shuffle on the
    32-byte gram hash for the semi-join probe, then a doc-keyed
    aggregate — the corpus text itself is never shuffled. Documents
    shorter than _CONTAM_N tokens produce no shingles: they are
    filtered out up front (F.sequence with stop < start generates a
    DESCENDING sequence, not an empty one, and would crash in
    F.slice) and are out of scope for the report (a production run
    unions them in as trivially clean)."""
    t = _tokens()
    # the gate on >= N tokens must precede gram construction; it also
    # keeps per_doc's n_train consistent with the oracle (docs with
    # no shingles are not counted)
    docs = load(spark, sf_dir, "documents").filter(
        F.size(t) >= _CONTAM_N
    )
    is_eval = doc_nibble(3) == "f"
    grams_arr = F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), F.size(t) - (_CONTAM_N - 1)),
            lambda i: F.md5(
                F.array_join(F.slice(t, i, _CONTAM_N), " ").cast("binary")
            ),
        )
    )
    grams = docs.select(
        "doc_id",
        "source",
        is_eval.alias("is_eval"),
        F.explode(grams_arr).alias("g"),
    )
    eval_g = grams.filter("is_eval").select("g").distinct()
    train = grams.filter(~F.col("is_eval"))
    hits = (
        train.join(eval_g, "g", "left_semi")
        .select("doc_id")
        .distinct()
        .withColumn("hit", F.lit(1))
    )
    # (doc_id, source) comes from the pre-explode scan — recovering
    # it from the exploded gram rows would re-run the whole
    # tokenize->hash pipeline a third time at corpus scale
    per_doc = (
        docs.filter(~is_eval)
        .select("doc_id", "source")
        .join(hits, "doc_id", "left")
    )
    return per_doc.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_train"),
        F.sum(F.coalesce("hit", F.lit(0))).cast("long").alias("n_flagged"),
    )


@register(
    "e4_bm25_search",
    oracle="""
    WITH toks AS (
      SELECT doc_id, UNNEST(string_split_regex(trim(lower(text)), '\\s+'))
               AS term
      FROM documents),
    dl AS (SELECT doc_id, COUNT(*) AS dlen FROM toks GROUP BY doc_id),
    stats AS (SELECT COUNT(*) AS n_docs, AVG(CAST(dlen AS DOUBLE)) AS avgdl
              FROM dl),
    tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM toks
           WHERE term IN ('data', 'fast', 'window') GROUP BY doc_id, term),
    df AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
    scored AS (
      SELECT tf.doc_id,
             SUM(
               LN(1 + (s.n_docs - df.df + 0.5) / (df.df + 0.5))
               * tf.tf * 2.2
               / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dlen / s.avgdl))
             ) AS score,
             COUNT(*) AS n_terms
      FROM tf JOIN df ON tf.term = df.term
              JOIN dl ON tf.doc_id = dl.doc_id
              CROSS JOIN stats s
      GROUP BY tf.doc_id)
    SELECT doc_id, ROUND(score, 4) AS score,
           CAST(n_terms AS BIGINT) AS n_terms
    FROM scored
    ORDER BY score DESC, doc_id LIMIT 20
    """,
)
def e4_bm25_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 keyword search over the corpus (k1=1.2, b=0.75, the
    Robertson defaults; query = a fixed 3-term set): the ranking
    primitive behind corpus exploration and retrieval-based data
    curation, one level above e4_tfidf's raw weights. Shape: one
    tokenize-explode scan -> per-doc lengths (map-side combined) ->
    tiny per-term document frequencies and global (N, avgdl) scalars
    (broadcast) -> per-doc score sum -> TakeOrderedAndProject top-20.
    The only shuffles key on doc_id/term; the explode never re-joins
    the document bodies. Both engines evaluate the identical double
    expression tree, so ROUND(4) is far above any ulp drift."""
    terms = ("data", "fast", "window")
    k1, b = 1.2, 0.75
    docs = load(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        F.explode(F.split(F.trim(F.lower("text")), r"\s+")).alias("term"),
    )
    dl = toks.groupBy("doc_id").agg(F.count(F.lit(1)).alias("dlen"))
    stats = dl.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.avg(F.col("dlen").cast("double")).alias("avgdl"),
    )
    tf = (
        toks.filter(F.col("term").isin(*terms))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    idf = F.log(
        1
        + (F.col("n_docs") - F.col("df") + F.lit(0.5))
        / (F.col("df") + F.lit(0.5))
    )
    contrib = (
        idf
        * F.col("tf")
        * (k1 + 1)
        / (
            F.col("tf")
            + k1 * (1 - b + b * F.col("dlen") / F.col("avgdl"))
        )
    )
    scored = (
        tf.join(F.broadcast(dfreq), "term")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .groupBy("doc_id")
        .agg(
            F.sum(contrib).alias("score"),
            F.count(F.lit(1)).alias("n_terms"),
        )
    )
    return (
        scored.select(
            "doc_id",
            F.round("score", 4).alias("score"),
            F.col("n_terms").cast("long").alias("n_terms"),
        )
        .orderBy(F.desc("score"), "doc_id")
        .limit(20)
    )


@register(
    "e4_normalize",
    oracle="""
    SELECT doc_id,
           regexp_replace(trim(lower(text)), '\\s+', ' ', 'g') AS norm_text,
           md5(regexp_replace(trim(lower(text)), '\\s+', ' ', 'g'))
             AS norm_hash,
           CAST(length(text)
                - length(regexp_replace(trim(lower(text)), '\\s+', ' ', 'g'))
             AS BIGINT) AS n_chars_removed
    FROM documents
    """,
)
def e4_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonical text normalization (the pass every dedup fingerprint
    should agree on): lowercase, trim, collapse internal whitespace
    runs — emitted with the md5 of the normal form (the join key for
    cross-source exact dedup) and the per-doc byte delta as an audit
    column. One scan, all codegen'd string expressions, no shuffle at
    all."""
    docs = load(spark, sf_dir, "documents")
    norm = F.regexp_replace(F.trim(F.lower("text")), r"\s+", " ")
    return docs.select(
        "doc_id",
        norm.alias("norm_text"),
        F.md5(norm).alias("norm_hash"),
        (F.length("text") - F.length(norm)).cast("long").alias(
            "n_chars_removed"
        ),
    )


@register(
    "e4_cms_heavy_hitters",
    oracle=r"""
    WITH toks AS (
      SELECT unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS term
      FROM documents),
    t AS (SELECT term FROM toks WHERE term <> '')
    SELECT term, CAST(COUNT(*) AS BIGINT) AS n,
           TRUE AS est_ge_true, TRUE AS est_within_bound
    FROM t GROUP BY term
    ORDER BY n DESC, term LIMIT 20
    """,
)
def e4_cms_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min-sketch heavy hitters with a bounded-error oracle
    (the a7/a9 pattern applied to a FREQUENCY sketch): a d=4 x w=1024
    CMS is built as an ordinary (row, position) hash-aggregate — 4096
    cells total, each token contributing one count per row via
    xxhash64(term, row) — and the top-20 exact tokens (the anchors,
    which must match DuckDB's exact GROUP BY bit-for-bit) probe it
    with min-over-rows. The emitted booleans assert the CMS
    guarantees: the estimate never undercounts (structural), and
    overshoot stays within 8N/w (measured 0 at every test SF). The
    8x margin is chosen so a NEW scale factor cannot flip the gate
    without a real bug: per CMS analysis each row's overshoot exceeds
    kN/w with Markov probability <= 1/k, the min over d=4 independent
    rows exceeds it with probability <= k^-4, so at k=8 a single term
    false-fails with odds 1/4096 and the union over the 20 probed
    terms stays under 0.5% (the previous 3N/w bound was ~1/81 per
    term — a ~22% union risk, flagged by the r7 advisor). The oracle
    pins the anchors and asserts both bounds as literal TRUE — a
    broken sketch still goes driver-red.

    Scale: the sketch is w x d cells regardless of corpus size (THE
    point of a sketch — at 100 TB the cells still fit in one
    broadcast); the only corpus-sized work is the token explode and
    two map-side-combined aggregates."""
    D, W = 4, 1024
    docs = load(spark, sf_dir, "documents")
    toks = (
        docs.select(
            F.explode(
                F.split(F.trim(F.lower(F.col("text"))), r"\s+")
            ).alias("term")
        )
        .filter(F.col("term") != "")
        # one materialization feeds N, the cells, and the exact top-k
        # (exchange reuse does not fire across these branches)
        .localCheckpoint(eager=False)
    )
    positions = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(i).alias("i"),
                    F.pmod(F.xxhash64("term", F.lit(i)), F.lit(W)).alias(
                        "pos"
                    ),
                )
                for i in range(D)
            ]
        )
    ).alias("s")
    cells = (
        toks.select(positions)
        .select("s.i", "s.pos")
        .groupBy("i", "pos")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    n_total = toks.count()  # scalar: the bound's N
    top = (
        toks.groupBy("term")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), "term")
        .limit(20)
    )
    est = (
        top.select("term", "n", positions)
        .select("term", "n", "s.i", "s.pos")
        .join(F.broadcast(cells), ["i", "pos"])
        .groupBy("term", "n")
        .agg(F.min("c").alias("est"))
    )
    bound = F.lit(8 * n_total) / F.lit(W)
    return (
        est.select(
            "term",
            F.col("n").cast("bigint").alias("n"),
            (F.col("est") >= F.col("n")).alias("est_ge_true"),
            ((F.col("est") - F.col("n")) <= bound).alias("est_within_bound"),
        )
        .orderBy(F.desc("n"), "term")
    )
