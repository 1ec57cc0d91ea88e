"""Property-based tests (SURVEY.md §5 item 4): invariants of the quality
checks under generated inputs. Hypothesis drives small row sets; one
shared SparkSession keeps runtime sane (max_examples kept low — each
example is a Spark job)."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from _data_engineering_pipeline_project_spark.operators import quality as Q

rows_strategy = st.lists(
    st.tuples(
        st.one_of(st.none(), st.integers(min_value=0, max_value=5)),  # pk (collisions!)
        st.integers(min_value=-3, max_value=3),  # payload
    ),
    min_size=0,
    max_size=12,
)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(rows=rows_strategy)
def test_pk_check_invariants(spark, rows):
    df = spark.createDataFrame(rows, "pk int, v int") if rows else (
        spark.createDataFrame([], "pk int, v int")
    )
    res = Q.validate_primary_keys(df, ["pk"], order_by=["v"])
    cleaned = res.cleaned.collect()
    viol = res.violations.collect()
    # 1. cleaned PKs are unique and non-null
    pks = [r["pk"] for r in cleaned]
    assert None not in pks
    assert len(pks) == len(set(pks))
    # 2. conservation: every input row lands exactly once in cleaned ∪ violations
    assert len(cleaned) + len(viol) == len(rows)
    # 3. cleaned ⊆ input (as multiset of (pk, v)); None-safe sort key
    def key(t):
        return tuple((x is None, 0 if x is None else x) for x in t)

    inp = sorted(((r[0], r[1]) for r in rows), key=key)
    out = sorted(
        [(r["pk"], r["v"]) for r in cleaned] + [(r["pk"], r["v"]) for r in viol],
        key=key,
    )
    assert out == inp


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    child_fks=st.lists(
        st.one_of(st.none(), st.integers(min_value=0, max_value=8)),
        min_size=0,
        max_size=10,
    ),
    parent_pks=st.sets(st.integers(min_value=0, max_value=8), max_size=6),
)
def test_fk_check_invariants(spark, child_fks, parent_pks):
    child = spark.createDataFrame(
        [(i, fk) for i, fk in enumerate(child_fks)], "id int, fk int"
    ) if child_fks else spark.createDataFrame([], "id int, fk int")
    parent = spark.createDataFrame(
        [(p,) for p in parent_pks], "pk int"
    ) if parent_pks else spark.createDataFrame([], "pk int")
    res = Q.validate_foreign_keys(child, ["fk"], parent, ["pk"])
    kept = res.cleaned.collect()
    viol = res.violations.collect()
    # conservation
    assert len(kept) + len(viol) == len(child_fks)
    # kept rows: fk is NULL or ∈ parent; violations: fk ∉ parent and not null
    for r in kept:
        assert r["fk"] is None or r["fk"] in parent_pks
    for r in viol:
        assert r["fk"] is not None and r["fk"] not in parent_pks
