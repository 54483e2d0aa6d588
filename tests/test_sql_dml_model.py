"""Model-based check of the SQL subquery-DML surface (r14).

A random sequence of IN / [NOT] EXISTS / scalar-subquery DML
statements runs through LakeSQL against a live table while a pure-
Python model mirrors the expected row set. Every statement's scope
derives from a FIXED source table, so the model computes the exact
effect; after each statement the table must equal the model. This is
the test class that caught the r13 cast-back bug — the randomized
sequencing exercises interleavings (delete-all then merge, update on
empty, repeated scopes) no example-based test enumerates.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from market_data_lakehouse_spark.sqlfront import LakeSQL
from market_data_lakehouse_spark.txnlog import TransactionalLake

# fixed source: keys with a flag bit (flag = k % 2)
SRC = {2: 0, 3: 1, 5: 1, 7: 1, 11: 1, 13: 1, 4: 0, 8: 0}

sql_op = st.sampled_from(
    [
        "append",
        "in_delete",
        "exists_delete",
        "not_exists_delete",
        "in_update",
        "exists_update",
        "not_exists_update",
        "scalar_delete",
        "scalar_update",
        # r15: correlated scalar subqueries (decorrelated onto the
        # merge engine). COUNT shapes are chosen so the model never
        # sees NULL: COUNT over an unmatched key is 0, and the
        # MAX-keyed delete leaves unmatched rows via NULL-comparison
        "corr_set_count",
        "corr_set_count_filtered",
        "corr_where_delete_max",
        "corr_where_update_count0",
    ]
)


@settings(
    max_examples=4,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(ops=st.lists(sql_op, min_size=2, max_size=6))
def test_random_sql_subquery_dml_matches_model(
    spark, tmp_path_factory, ops
):
    root = tmp_path_factory.mktemp("sqlmodel")
    lake = TransactionalLake(spark, str(root / "t"), partition_by=())
    lake.append(
        spark.createDataFrame(
            [(k, float(k)) for k in range(12)], "k long, v double"
        )
    )
    src = TransactionalLake(spark, str(root / "s"), partition_by=())
    src.append(
        spark.createDataFrame(
            sorted(SRC.items()), "sk long, flag long"
        )
    )
    fr = LakeSQL(spark)
    fr.register("mt", lake)
    fr.register("ms", src)

    model: dict[int, float] = {k: float(k) for k in range(12)}
    next_id = 100
    flag1 = {k for k, f in SRC.items() if f == 1}
    flag0 = {k for k, f in SRC.items() if f == 0}
    max_sk, min_sk = max(SRC), min(SRC)

    for o in ops:
        if o == "append":
            fr.sql(
                f"INSERT INTO mt VALUES ({next_id}, {float(next_id)}), "
                f"({next_id + 1}, {float(next_id + 1)})"
            )
            model[next_id] = float(next_id)
            model[next_id + 1] = float(next_id + 1)
            next_id += 2
        elif o == "in_delete":
            fr.sql(
                "DELETE FROM mt WHERE k IN "
                "(SELECT sk FROM ms WHERE flag = 1) AND v < 1000000"
            )
            model = {
                k: v
                for k, v in model.items()
                if not (k in flag1 and v < 1_000_000)
            }
        elif o == "exists_delete":
            fr.sql(
                "DELETE FROM mt WHERE EXISTS (SELECT 1 FROM ms s "
                "WHERE s.sk = mt.k AND s.flag = 0)"
            )
            model = {k: v for k, v in model.items() if k not in flag0}
        elif o == "not_exists_delete":
            fr.sql(
                "DELETE FROM mt WHERE NOT EXISTS (SELECT 1 FROM ms s "
                "WHERE s.sk = mt.k) AND k % 3 = 0"
            )
            model = {
                k: v
                for k, v in model.items()
                if not (k not in SRC and k % 3 == 0)
            }
        elif o == "in_update":
            fr.sql(
                "UPDATE mt SET v = v + 10 WHERE k IN "
                "(SELECT sk FROM ms WHERE flag = 0)"
            )
            model = {
                k: (v + 10 if k in flag0 else v)
                for k, v in model.items()
            }
        elif o == "exists_update":
            fr.sql(
                "UPDATE mt SET v = v + 100 WHERE EXISTS "
                "(SELECT 1 FROM ms s WHERE s.sk = mt.k AND s.flag = 1)"
            )
            model = {
                k: (v + 100 if k in flag1 else v)
                for k, v in model.items()
            }
        elif o == "not_exists_update":
            fr.sql(
                "UPDATE mt SET v = v + 1000 WHERE NOT EXISTS "
                "(SELECT 1 FROM ms s WHERE s.sk = mt.k) AND k % 2 = 0"
            )
            model = {
                k: (v + 1000 if k not in SRC and k % 2 == 0 else v)
                for k, v in model.items()
            }
        elif o == "scalar_delete":
            fr.sql(
                "DELETE FROM mt WHERE k > (SELECT max(sk) FROM ms) "
                "AND v < (SELECT min(sk) FROM ms) + 100000"
            )
            model = {
                k: v
                for k, v in model.items()
                if not (k > max_sk and v < min_sk + 100_000)
            }
        elif o == "scalar_update":
            fr.sql(
                "UPDATE mt SET v = v + (SELECT min(sk) FROM ms) "
                "WHERE k % 2 = 0"
            )
            model = {
                k: (v + min_sk if k % 2 == 0 else v)
                for k, v in model.items()
            }
        elif o == "corr_set_count":
            # SET-position correlated scalar: matched keys add 10
            # (one source row per sk), unmatched add COUNT's
            # empty-input 0 via the BY SOURCE arm
            fr.sql(
                "UPDATE mt SET v = v + 10 * (SELECT count(*) "
                "FROM ms s WHERE s.sk = mt.k)"
            )
            model = {
                k: (v + 10 if k in SRC else v)
                for k, v in model.items()
            }
        elif o == "corr_set_count_filtered":
            # source-side filter INSIDE the subquery scopes the
            # per-key aggregate, not the statement
            fr.sql(
                "UPDATE mt SET v = v + 3 * (SELECT count(*) FROM ms "
                "s WHERE s.sk = mt.k AND s.flag = 1) WHERE k < 1000"
            )
            model = {
                k: (v + 3 if k in flag1 and k < 1000 else v)
                for k, v in model.items()
            }
        elif o == "corr_where_delete_max":
            # max(s.sk) per matched key k is k itself; unmatched
            # keys compare v < NULL -> kept (the dv-eligible
            # NULL-skip shape)
            fr.sql(
                "DELETE FROM mt WHERE v < (SELECT max(s.sk) "
                "FROM ms s WHERE s.sk = mt.k) + 1"
            )
            model = {
                k: v
                for k, v in model.items()
                if not (k in SRC and v < k + 1)
            }
        elif o == "corr_where_update_count0":
            # COUNT = 0 is TRUE for unmatched keys: the BY SOURCE
            # arm must apply the empty-input value, the classic
            # decorrelation bug class
            fr.sql(
                "UPDATE mt SET v = v + 7 WHERE (SELECT count(*) "
                "FROM ms s WHERE s.sk = mt.k AND s.flag = 1) = 0 "
                "AND k % 2 = 1"
            )
            model = {
                k: (v + 7 if k not in flag1 and k % 2 == 1 else v)
                for k, v in model.items()
            }
        got = {
            r["k"]: r["v"]
            for r in fr.sql("SELECT k, v FROM mt").collect()
        }
        assert got == model, (o, ops, got, model)
