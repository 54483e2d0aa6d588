"""Model-based ACID check: a random sequence of table operations
against a pure-Python model of the live row set. Every intermediate
version must remain readable with exactly its historical contents
(snapshot isolation + time-travel), regardless of operation order."""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from market_data_lakehouse_spark.txnlog import TransactionalLake

op = st.sampled_from(
    ["append", "overwrite", "delete_low", "delete_low_dv", "compact",
     "restore", "update_dv", "merge_dv", "replace_where",
     "merge_by_source", "reorg_purge", "vacuum_lite", "truncate"]
)


@settings(
    max_examples=4,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(ops=st.lists(op, min_size=1, max_size=6))
def test_random_op_sequences_match_model(spark, tmp_path_factory, ops):
    lake = TransactionalLake(
        spark, str(tmp_path_factory.mktemp("model") / "tx"),
        partition_by=("date",),
    )
    model: list[set[int]] = []  # live ids per version
    live: set[int] = set()
    next_id = 0

    def df_for(ids):
        return spark.createDataFrame(
            [(i, "2024-06-15") for i in sorted(ids)], "id long, date string"
        )

    for o in ops:
        if o == "append":
            batch = {next_id, next_id + 1}
            next_id += 2
            lake.append(df_for(batch))
            live = live | batch
        elif o == "overwrite":
            batch = {next_id}
            next_id += 1
            lake.overwrite(df_for(batch))
            live = set(batch)
        elif o == "delete_low":
            if not live:
                continue
            cutoff = min(live) + 1
            lake.delete_where(f"id < {cutoff}")
            live = {i for i in live if i >= cutoff}
        elif o == "delete_low_dv":
            # merge-on-read: same visible semantics, zero rewrites —
            # the model cannot tell the strategies apart, which is
            # exactly the property under test
            if not live:
                continue
            cutoff = min(live) + 1
            lake.delete_where(f"id < {cutoff}", mode="dv")
            live = {i for i in live if i >= cutoff}
        elif o == "update_dv":
            # dv UPDATE keeps the id set identical (assignment touches
            # a non-key column the model ignores) but exercises the
            # vector+postimage commit path mid-sequence
            if not live:
                continue
            pivot = min(live)
            lake.update_where(f"id = {pivot}", {"id": f"{pivot}"},
                              mode="dv")
            live = set(live)
        elif o == "merge_dv":
            # upsert one existing id (postimage replaces preimage) and
            # one brand-new id through the positional merge
            if not live:
                continue
            hit = max(live)
            new = next_id
            next_id += 1
            lake.merge(df_for({hit, new}), on="id", mode="dv")
            live = live | {new}
        elif o == "replace_where":
            # swap the top id for a fresh one atomically
            if not live:
                continue
            top = max(live)
            new = next_id
            next_id += 1
            lake.overwrite_where(df_for({new}), f"id = {top} OR id = {new}")
            live = (live - {top}) | {new}
        elif o == "merge_by_source":
            # r12: source-mirrors-target — keep the bottom half,
            # update them in place, insert one new id, delete the rest
            if not live:
                continue
            keep = set(sorted(live)[: max(1, len(live) // 2)])
            new = next_id
            next_id += 1
            lake.merge(df_for(keep | {new}), on="id",
                       when_not_matched_by_source="delete")
            live = keep | {new}
        elif o == "reorg_purge":
            # r12: materializes any live deletion vectors, scoped to
            # the dv-carrying files; visible rows never change. A
            # table with nothing reclaimable is a version-free no-op
            # the model must not record.
            before = lake.version
            lake.reorg_purge()
            if lake.version == before:
                continue
            live = set(live)
        elif o == "vacuum_lite":
            # r12: physical-only cleanup of logged removes — commits
            # nothing, so the model records nothing; every historical
            # version that survives retention must stay readable
            # (retention floor keeps just-removed files, so it does)
            lake.vacuum(lite=True)
            continue
        elif o == "truncate":
            # r12: metadata-only remove-all; commits even when the
            # live set is already empty — but a table with NO commits
            # yet has no state to truncate (snapshot's own contract)
            if lake.version < 0:
                continue
            lake.truncate()
            live = set()
        elif o == "compact":
            if not live:
                continue
            before = lake.version
            lake.optimize()
            if lake.version == before:
                # r8: a scope of <2 vector-free files is a no-op that
                # burns no version — the model must not record one
                continue
            live = set(live)
        elif o == "restore":
            # roll halfway back; model[i] is the live set at version i
            # (every executed op commits exactly one version)
            if not model:
                continue
            v = len(model) // 2
            if v == lake.version:
                continue  # same-version restore is a no-commit no-op
            # r8: restore works with deletion vectors active on
            # either side of the jump (dv_reset reconciliation)
            lake.restore(version=v)
            live = set(model[v])
        model.append(set(live))

    # every historical version readable with exactly its contents
    for v, want in enumerate(model):
        got = {r["id"] for r in lake.snapshot(version=v).collect()}
        assert got == want, f"version {v}: {got} != {want} (ops={ops})"


def test_streaming_transactional_sink(spark, tmp_path):
    """Each micro-batch = one atomic commit; CDC history reflects the
    batch sequence."""
    import json
    import os

    from market_data_lakehouse_spark.streaming import (
        read_bar_stream,
        stream_ingest_transactional,
    )

    src = str(tmp_path / "src")
    os.makedirs(src)
    rows = [
        {
            "symbol": "AAPL",
            "timestamp": f"2024-06-15T10:0{i}:00",
            "open": 150.0,
            "high": 155.0,
            "low": 149.0,
            "close": 153.0,
            "volume": 100 + i,
            "asset_class": "equity",
        }
        for i in range(4)
    ]
    with open(src + "/b0.json", "w") as fh:
        for r in rows[:2]:
            fh.write(json.dumps(r) + "\n")
    tx = TransactionalLake(spark, str(tmp_path / "tx"), partition_by=("date",))
    q = stream_ingest_transactional(
        read_bar_stream(spark, src), tx, str(tmp_path / "ck"), available_now=True
    )
    q.awaitTermination(120)
    assert tx.snapshot().count() == 2
    v_first = tx.version

    with open(src + "/b1.json", "w") as fh:
        for r in rows[2:]:
            fh.write(json.dumps(r) + "\n")
    q = stream_ingest_transactional(
        read_bar_stream(spark, src), tx, str(tmp_path / "ck"), available_now=True
    )
    q.awaitTermination(120)
    assert tx.snapshot().count() == 4
    # first batch's snapshot unchanged (time-travel over the stream)
    assert tx.snapshot(version=v_first).count() == 2
    assert tx.read_changes(starting_version=v_first + 1).count() == 2


op_cp = st.sampled_from(
    ["append", "append", "overwrite", "delete_low", "delete_low_dv",
     "compact", "vacuum_log", "restore", "truncate"]
)


@settings(
    max_examples=4,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(ops=st.lists(op_cp, min_size=3, max_size=10))
def test_random_ops_with_checkpoints_and_retention(
    spark, tmp_path_factory, ops
):
    """Same model discipline with aggressive checkpointing
    (every 2 commits) and interleaved log vacuums: every version the
    log can still resolve must read EXACTLY its historical contents;
    versions behind the retention boundary must raise the retention
    error — never silently-partial data — and resolvability must be
    a suffix (no holes: if v resolves, every newer version does)."""
    lake = TransactionalLake(
        spark, str(tmp_path_factory.mktemp("modelcp") / "tx"),
        partition_by=("date",), checkpoint_every=2,
    )
    model: list[set[int]] = []
    live: set[int] = set()
    next_id = 0
    vacuumed = False

    def df_for(ids):
        return spark.createDataFrame(
            [(i, "2024-06-15") for i in sorted(ids)], "id long, date string"
        )

    for o in ops:
        if o == "append":
            batch = {next_id, next_id + 1}
            next_id += 2
            lake.append(df_for(batch))
            live = live | batch
        elif o == "overwrite":
            batch = {next_id}
            next_id += 1
            lake.overwrite(df_for(batch))
            live = set(batch)
        elif o == "delete_low":
            if not live:
                continue
            cutoff = min(live) + 1
            lake.delete_where(f"id < {cutoff}")
            live = {i for i in live if i >= cutoff}
        elif o == "delete_low_dv":
            # vectors must fold through checkpoints and survive log
            # vacuum exactly like file-level state
            if not live:
                continue
            cutoff = min(live) + 1
            lake.delete_where(f"id < {cutoff}", mode="dv")
            live = {i for i in live if i >= cutoff}
        elif o == "merge_by_source":
            # r12: source-mirrors-target — keep the bottom half,
            # update them in place, insert one new id, delete the rest
            if not live:
                continue
            keep = set(sorted(live)[: max(1, len(live) // 2)])
            new = next_id
            next_id += 1
            lake.merge(df_for(keep | {new}), on="id",
                       when_not_matched_by_source="delete")
            live = keep | {new}
        elif o == "reorg_purge":
            # r12: materializes any live deletion vectors, scoped to
            # the dv-carrying files; visible rows never change. A
            # table with nothing reclaimable is a version-free no-op
            # the model must not record.
            before = lake.version
            lake.reorg_purge()
            if lake.version == before:
                continue
            live = set(live)
        elif o == "vacuum_lite":
            # r12: physical-only cleanup of logged removes — commits
            # nothing, so the model records nothing; every historical
            # version that survives retention must stay readable
            # (retention floor keeps just-removed files, so it does)
            lake.vacuum(lite=True)
            continue
        elif o == "truncate":
            # r12: metadata-only remove-all must fold through
            # checkpoints and log retention like any remove commit
            if lake.version < 0:
                continue
            lake.truncate()
            live = set()
        elif o == "compact":
            if not live:
                continue
            before = lake.version
            lake.optimize()
            if lake.version == before:
                # r8: a scope of <2 vector-free files is a no-op that
                # burns no version — the model must not record one
                continue
            live = set(live)
        elif o == "vacuum_log":
            if lake.vacuum_log(retain_last=1):
                vacuumed = True
            continue  # no commit, no model version
        elif o == "restore":
            if not model:
                continue
            v = len(model) // 2
            if v == lake.version:
                continue
            try:
                lake.restore(version=v)
            except ValueError as e:
                if "deletion vectors" in str(e):
                    continue  # active vectors: correctly refused
                assert "retention" in str(e) and vacuumed
                continue  # pre-retention target: correctly refused
            live = set(model[v])
        model.append(set(live))

    resolvable: list[bool] = []
    for v, want in enumerate(model):
        try:
            got = {r["id"] for r in lake.snapshot(version=v).collect()}
        except ValueError as e:
            assert "retention" in str(e), e
            assert vacuumed, f"retention error without a vacuum (v{v})"
            resolvable.append(False)
            continue
        assert got == want, f"version {v}: {got} != {want} (ops={ops})"
        resolvable.append(True)
    # resolvability is a suffix: no holes
    first_ok = resolvable.index(True) if True in resolvable else len(
        resolvable
    )
    assert all(resolvable[first_ok:]), (resolvable, ops)
    # head always readable — unless the sequence was all no-ops (e.g.
    # deletes against an empty table commit nothing), leaving zero
    # versions to resolve
    if model:
        assert resolvable and resolvable[-1]


colmap_op = st.sampled_from(
    ["append", "rename", "delete_low_dv", "restore", "xcycle",
     "checkpoint_vacuum", "purge"]
)


@settings(
    max_examples=4,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(ops=st.lists(colmap_op, min_size=2, max_size=8))
def test_random_column_mapping_sequences_match_model(
    spark, tmp_path_factory, ops
):
    """r10: the column-mapping model check. The MODEL is purely
    logical — per version: (live ids, payload column's logical name,
    extra-column presence + its per-id values). The engine must
    reproduce it at every resolvable historical version through any
    interleaving of renames, drops, re-adds (fresh physical slots —
    dead bytes must never resurrect), dv deletes, restores across
    renames, aggressive checkpoint+vacuum, and purge rewrites."""
    lake = TransactionalLake(
        spark, str(tmp_path_factory.mktemp("modelcm") / "tx"),
        partition_by=(), checkpoint_every=3,
    )
    # model[v] = (frozenset ids, payload_name, has_x, x_map{id: val|None})
    model: list[tuple] = []
    live: set[int] = set()
    payload = "val"
    has_x = False
    x_map: dict[int, int | None] = {}
    next_id, n_renames, vacuumed = 0, 0, False

    def df_for(ids, with_x=False):
        if with_x:
            return spark.createDataFrame(
                [(i, i * 10, i + 1) for i in sorted(ids)],
                f"id long, {payload} long, x long",
            )
        return spark.createDataFrame(
            [(i, i * 10) for i in sorted(ids)],
            f"id long, {payload} long",
        )

    for o in ops:
        if o == "append":
            batch = {next_id, next_id + 1}
            next_id += 2
            lake.append(df_for(batch), merge_schema=True)
            live = live | batch
            if has_x:
                x_map = {**x_map, **{i: None for i in batch}}
        elif o == "rename":
            if lake.version < 0:
                continue  # engine (correctly) refuses: no schema yet
            n_renames += 1
            new = f"val{n_renames}"
            lake.rename_column(payload, new)
            payload = new
        elif o == "delete_low_dv":
            if not live:
                continue
            cutoff = min(live) + 1
            # predicate through the CURRENT logical payload name —
            # must translate to the physical slot
            lake.delete_where(
                f"{payload} < {cutoff * 10}", mode="dv"
            )
            live = {i for i in live if i * 10 >= cutoff * 10}
            x_map = {i: v for i, v in x_map.items() if i in live}
        elif o == "xcycle":
            if has_x:
                lake.drop_column("x")
                has_x, x_map = False, {}
            else:
                batch = {next_id, next_id + 1}
                next_id += 2
                lake.append(df_for(batch, with_x=True),
                            merge_schema=True)
                live = live | batch
                # re-add binds a FRESH physical slot: only the new
                # batch carries values, every older id must be null
                x_map = {i: None for i in live}
                x_map.update({i: i + 1 for i in batch})
                has_x = True
        elif o == "restore":
            if not model:
                continue
            v = len(model) // 2
            if v == lake.version:
                continue
            try:
                lake.restore(version=v)
            except ValueError as e:
                assert "retention" in str(e) and vacuumed, e
                continue
            live, payload, has_x, x_map = (
                set(model[v][0]), model[v][1], model[v][2],
                dict(model[v][3]),
            )
        elif o == "checkpoint_vacuum":
            if lake.version < 0:
                continue
            lake._write_checkpoint(lake.version)
            if lake.vacuum_log(retain_last=1):
                vacuumed = True
            continue  # no commit, no model version
        elif o == "purge":
            before = lake.version
            lake.reorg_purge()
            if lake.version == before:
                continue  # nothing dropped: no-op, no version
            # live set and logical schema unchanged; dead bytes gone
        model.append(
            (frozenset(live), payload, has_x, dict(x_map))
        )

    for v, (want_ids, want_payload, want_x, want_xmap) in enumerate(model):
        try:
            snap = lake.snapshot(version=v)
        except ValueError as e:
            assert "retention" in str(e) and vacuumed, e
            continue
        want_cols = ["id", want_payload] + (["x"] if want_x else [])
        assert sorted(snap.columns) == sorted(want_cols), (
            f"v{v}: {snap.columns} != {want_cols} (ops={ops})"
        )
        rows = snap.collect()
        got_ids = {r["id"] for r in rows}
        assert got_ids == set(want_ids), (
            f"v{v}: ids {got_ids} != {set(want_ids)} (ops={ops})"
        )
        for r in rows:
            assert r[want_payload] == r["id"] * 10, (v, dict(r.asDict()), ops)
            if want_x:
                assert r["x"] == want_xmap[r["id"]], (
                    f"v{v} id={r['id']}: x={r['x']} != "
                    f"{want_xmap[r['id']]} — dead bytes resurrected? "
                    f"(ops={ops})"
                )
