"""Python UDTF surface (SURVEY §2.11): row-to-rows functions
callable from SQL, LATERAL-joinable against tables."""

from __future__ import annotations


class TestChunkText:
    def test_lateral_chunking_over_documents(self, spark):
        from market_data_lakehouse_spark.sql_catalog import (
            register_tables,
            unregister,
        )
        from market_data_lakehouse_spark.udtfs import register_udtfs

        register_udtfs(spark)
        t = register_tables(spark, "/root/testdata/sf0.001")
        out = spark.sql(
            """
            SELECT d.doc_id, c.chunk_idx, c.n_tokens
            FROM documents d, LATERAL chunk_text(d.text, 16, 4) c
            """
        ).collect()
        unregister(spark, t)
        assert len(out) > 0
        by_doc: dict = {}
        for r in out:
            by_doc.setdefault(r.doc_id, []).append(r)
        for doc_id, rows in by_doc.items():
            idxs = sorted(r.chunk_idx for r in rows)
            assert idxs == list(range(len(rows)))  # contiguous indices
            assert all(r.n_tokens <= 16 for r in rows)
            # all but the last chunk are full
            assert all(
                r.n_tokens == 16 for r in rows if r.chunk_idx < len(rows) - 1
            )

    def test_overlap_reconstructs_token_stream(self, spark):
        from market_data_lakehouse_spark.udtfs import ChunkText

        text = " ".join(f"t{i}" for i in range(50))
        rows = list(ChunkText.func().eval(text, 16, 4))
        # stitching chunks minus their 4-token overlap rebuilds the doc
        stitched = rows[0][1].split()
        for _, chunk, _n in rows[1:]:
            stitched += chunk.split()[4:]
        assert stitched == text.split()

    def test_empty_and_invalid_args(self, spark):
        import pytest

        from market_data_lakehouse_spark.udtfs import ChunkText

        assert list(ChunkText.func().eval("", 8, 2)) == []
        assert list(ChunkText.func().eval(None, 8, 2)) == []
        with pytest.raises(ValueError):
            list(ChunkText.func().eval("a b c", 4, 4))
