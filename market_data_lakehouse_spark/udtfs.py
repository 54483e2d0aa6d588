"""Python UDTFs (Spark 4 user-defined table functions) — the
row-to-rows extension surface.

One production-shaped example: a token-window text chunker usable
straight from SQL via LATERAL. This tier is for FLEXIBILITY, not
throughput: UDTFs execute row-at-a-time in Python, so the hot-path
equivalent of this exact computation is the codegen'd
slice/sequence-based ``e4_rolling_chunks`` (queries/textops.py) — a
user reaches for the UDTF form when the per-row logic outgrows what
column expressions can say (custom tokenizers, stateful splitters,
external parsers)."""

from __future__ import annotations

from pyspark.sql.functions import udtf


@udtf(returnType="chunk_idx int, chunk string, n_tokens int")
class ChunkText:
    """Overlapping whitespace-token windows: yields ceil((n-overlap)/
    (size-overlap)) chunks; the final chunk may be short, empty/NULL
    text yields nothing. Pure function of its arguments —
    deterministic under retries."""

    def eval(self, text: str, size: int, overlap: int):
        if not text:
            return
        if size <= 0 or overlap < 0 or overlap >= size:
            raise ValueError(
                f"need size > 0 and 0 <= overlap < size, got "
                f"({size}, {overlap})"
            )
        toks = text.split()
        step = size - overlap
        idx = 0
        for start in range(0, max(len(toks) - overlap, 1), step):
            window = toks[start : start + size]
            if not window:
                break
            yield idx, " ".join(window), len(window)
            idx += 1


def register_udtfs(spark) -> None:
    """Register every UDTF on the session (idempotent)."""
    spark.udtf.register("chunk_text", ChunkText)
