"""The runnable tour must keep working as the API evolves —
examples rot silently otherwise. Runs the whole quickstart main()
against the smallest driver dataset."""

from __future__ import annotations

import sys


def test_quickstart_runs_end_to_end(spark, monkeypatch):
    sys.path.insert(0, "/root/repo/examples")
    import quickstart

    monkeypatch.setattr(sys, "argv", ["quickstart.py", "/root/testdata/sf0.001"])
    quickstart.main()  # raises on any API drift / broken operator


def test_corpus_pipeline_runs_end_to_end(spark, monkeypatch):
    """The composed LLM-corpus pipeline (ingest -> quality gate ->
    dedup -> decontaminate -> split/quota -> shard) must keep working
    as the APIs evolve."""
    sys.path.insert(0, "/root/repo/examples")
    import corpus_pipeline

    monkeypatch.setattr(
        sys, "argv", ["corpus_pipeline.py", "/root/testdata/sf0.001"]
    )
    corpus_pipeline.main()


def test_table_evolution_runs_end_to_end(spark, monkeypatch):
    """The table-evolution tour (identity, metadata count, checksum
    verify, manifest export, rename/drop/purge under column mapping)
    must keep working as the APIs evolve."""
    sys.path.insert(0, "/root/repo/examples")
    import table_evolution

    monkeypatch.setattr(sys, "argv", ["table_evolution.py"])
    table_evolution.main()


def test_warehouse_pipeline_runs_end_to_end(spark, monkeypatch):
    """The warehouse pipeline example must keep working as the APIs
    evolve."""
    sys.path.insert(0, "/root/repo/examples")
    import warehouse_pipeline

    monkeypatch.setattr(
        sys, "argv", ["warehouse_pipeline.py", "/root/testdata/sf0.001"]
    )
    warehouse_pipeline.main()


def test_sql_interface_runs_end_to_end(spark, monkeypatch):
    """The SQL-only tour (r12): CTAS -> evolve -> DML -> maintain ->
    CDF TVF -> time travel, all through LakeSQL statements."""
    sys.path.insert(0, "/root/repo/examples")
    import sql_interface

    monkeypatch.setattr(
        sys, "argv", ["sql_interface.py", "/root/testdata/sf0.001"]
    )
    sql_interface.main()
