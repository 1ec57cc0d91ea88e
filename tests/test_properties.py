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


text_strategy = st.lists(
    st.text(
        alphabet=st.characters(min_codepoint=32, max_codepoint=126),
        min_size=0,
        max_size=600,
    ),
    min_size=1,
    max_size=6,
)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(texts=text_strategy, chunk=st.integers(80, 200), overlap=st.integers(0, 60))
def test_chunking_reconstructs_original(spark, texts, chunk, overlap):
    """Invariant: dropping each chunk's leading `overlap` chars (except
    chunk 0) and concatenating in index order reproduces the document."""
    from _data_engineering_pipeline_project_spark.operators.curation import (
        chunk_documents,
    )

    df = spark.createDataFrame(list(enumerate(texts)), "doc_id long, text string")
    out = {}
    for r in chunk_documents(df, chunk_chars=chunk, overlap=overlap).collect():
        out.setdefault(r["doc_id"], []).append((r["chunk_idx"], r["chunk"]))
    for doc_id, text in enumerate(texts):
        if not text:
            assert doc_id not in out  # empty docs yield no chunks
            continue
        parts = [c for _, c in sorted(out[doc_id])]
        rebuilt = parts[0] + "".join(p[overlap:] for p in parts[1:])
        assert rebuilt == text, (doc_id, chunk, overlap)
        # every chunk within size bound
        assert all(len(p) <= chunk for p in parts)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    rows=st.lists(
        st.tuples(st.integers(-100, 100), st.floats(allow_nan=False, width=32)),
        min_size=0,
        max_size=8,
    )
)
def test_conform_is_idempotent(spark, rows):
    """conform(conform(df)) == conform(df): once a batch matches the
    target schema, a second pass is the identity with no actions."""
    from pyspark.sql import types as T

    from _data_engineering_pipeline_project_spark.operators.evolution import (
        conform_to_schema,
    )

    target = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("price", T.DoubleType()),
            T.StructField("note", T.StringType()),
        ]
    )
    src = (
        spark.createDataFrame(rows, "id int, price float")
        if rows
        else spark.createDataFrame([], "id int, price float")
    )
    once, acts1 = conform_to_schema(src, target)
    twice, acts2 = conform_to_schema(once, target)
    assert acts1 and not acts2  # first pass acts, second is identity
    assert once.schema == twice.schema == target
    assert sorted(map(tuple, once.collect())) == sorted(map(tuple, twice.collect()))


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    corpus=st.lists(
        st.text(alphabet="ab ", min_size=0, max_size=60), min_size=1, max_size=5
    ),
    bench=st.lists(
        st.text(alphabet="ab ", min_size=0, max_size=60), min_size=1, max_size=3
    ),
)
def test_decontaminate_partitions_the_corpus(spark, corpus, bench):
    """clean ∪ contaminated == corpus, disjointly — no doc lost or
    double-counted regardless of generated text overlap."""
    from _data_engineering_pipeline_project_spark.operators.curation import (
        decontaminate,
    )

    cdf = spark.createDataFrame(list(enumerate(corpus)), "doc_id long, text string")
    bdf = spark.createDataFrame(
        [(i + 1000, t) for i, t in enumerate(bench)], "doc_id long, text string"
    )
    clean, contaminated = decontaminate(cdf, bdf, n=2)
    clean_ids = {r["doc_id"] for r in clean.collect()}
    cont_ids = {r["doc_id"] for r in contaminated.collect()}
    assert clean_ids.isdisjoint(cont_ids)
    assert clean_ids | cont_ids == set(range(len(corpus)))


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    texts=st.lists(
        st.text(alphabet="xy z", min_size=1, max_size=80), min_size=1, max_size=4
    )
)
def test_repetition_ratio_bounds(spark, texts):
    """0 <= repeat_ratio < 1 always; all-distinct n-grams give exactly 0;
    total >= distinct by construction."""
    from _data_engineering_pipeline_project_spark.operators.curation import (
        repeated_ngram_ratio,
    )

    df = spark.createDataFrame(list(enumerate(texts)), "doc_id long, text string")
    for r in repeated_ngram_ratio(df, n=2).collect():
        assert 0 <= r["repeat_ratio"] < 1
        assert r["total_ngrams"] >= r["distinct_ngrams"] >= 1
        if r["total_ngrams"] == r["distinct_ngrams"]:
            assert r["repeat_ratio"] == 0.0


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    rows=st.lists(
        st.tuples(
            st.one_of(st.none(), st.integers(0, 5)),    # group key (+None)
            st.one_of(st.none(), st.integers(-9, 9)),   # ts tie-break (+None)
            st.integers(0, 10**6),                      # unique payload id
        ),
        min_size=1,
        max_size=40,
    )
)
def test_keep_first_agg_equals_window_form(spark, rows):
    """Property: the min_by-struct hash aggregate (keep_first_agg) picks
    the SAME surviving row per key as the window row_number form, for
    any mix of NULL keys and NULL tie-break values — the (ts, payload)
    pair is unique per row, so both forms are deterministic and must
    agree exactly."""
    from _data_engineering_pipeline_project_spark.functions.expressions import (
        keep_first,
        keep_first_agg,
    )

    # make payload unique (the determinism precondition both forms share)
    data = [(k, ts, i) for i, (k, ts, _) in enumerate(rows)]
    df = spark.createDataFrame(data, "k int, ts int, pid int")
    win = {
        (r["k"], r["ts"], r["pid"])
        for r in keep_first(df, ["k"], ["ts", "pid"])[0].collect()
    }
    agg = {
        (r["k"], r["ts"], r["pid"])
        for r in keep_first_agg(df, ["k"], ["ts", "pid"]).collect()
    }
    assert agg == win
