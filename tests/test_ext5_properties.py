"""Property tests for the round-3 wave: the Spark operators are compared
against brute-force pure-Python references on Hypothesis-generated
corpora — the contract is exact output equality, not just invariants.
max_examples kept low (each example is a Spark job)."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import Row

# tiny vocab forces duplicate spans / shared grams to actually occur
word = st.sampled_from(["a", "b", "c", "d"])
doc = st.lists(word, min_size=0, max_size=14).map(" ".join)
corpus = st.lists(doc, min_size=1, max_size=5)


def _ref_remove_spans(texts: list[str], k: int) -> dict:
    """Pure-Python reference for remove_duplicate_spans: first occurrence
    (global (doc, start) order) of each k-gram keeps its tokens; every
    other occurrence covers its span for removal."""
    toks = {i + 1: t.split() for i, t in enumerate(texts)}
    toks = {d: [w for w in ws if w] for d, ws in toks.items()}
    first: dict = {}
    covered: dict = {d: set() for d in toks}
    occs = []
    for d in sorted(toks):
        ws = toks[d]
        for s in range(len(ws) - k + 1):
            occs.append((d, s + 1, " ".join(ws[s : s + k])))
    for d, s, g in sorted(occs):
        if g not in first:
            first[g] = (d, s)
        elif (d, s) != first[g]:
            covered[d].update(range(s, s + k))
    out = {}
    for d, ws in toks.items():
        kept = [w for i, w in enumerate(ws, start=1) if i not in covered[d]]
        out[d] = (" ".join(kept), len(ws), len(ws) - len(kept))
    return out


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(texts=corpus)
def test_remove_duplicate_spans_matches_reference(spark, texts):
    from _data_engineering_pipeline_project_spark.operators.curation import (
        remove_duplicate_spans,
    )

    k = 3
    docs = spark.createDataFrame(
        [Row(doc_id=i + 1, text=t) for i, t in enumerate(texts)]
    )
    got = {
        r["doc_id"]: (r["text_clean"], r["n_tokens"], r["n_removed"])
        for r in remove_duplicate_spans(docs, k=k).collect()
    }
    assert got == _ref_remove_spans(texts, k)


def _ref_cdc_chunks(text: str, div: int = 16) -> list[tuple[int, str]]:
    """Pure-Python reference for content-defined chunking (trailing
    3-gram md5 hash % div == 0 cuts AFTER the token)."""
    import hashlib

    ws = [w for w in text.lower().split() if w]
    chunk_no, out, cur = 0, [], []
    for i, w in enumerate(ws):
        cur.append(w)
        if i >= 2:
            gram = " ".join(ws[i - 2 : i + 1])
            h = int(hashlib.md5(gram.encode()).hexdigest()[:15], 16)
            if h % div == 0:
                out.append((chunk_no, " ".join(cur)))
                chunk_no += 1
                cur = []
    if cur:
        out.append((chunk_no, " ".join(cur)))
    return out


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    text=st.lists(
        st.sampled_from(["aa", "bb", "cc", "dd", "ee", "ff"]),
        min_size=0,
        max_size=60,
    ).map(" ".join)
)
def test_cdc_chunks_match_reference(spark, text):
    import _data_engineering_pipeline_project_spark.queries_ext5 as q5

    docs = spark.createDataFrame(
        [Row(doc_id=1, text=text, lang="en", source="s", n_chars=len(text))]
    )
    orig = q5.table
    try:
        q5.table = lambda sp, sf, name: docs
        rows = q5.content_defined_chunks_documents(spark, "unused").collect()
    finally:
        q5.table = orig
    got = sorted((r["chunk_no"], r["chunk_text"]) for r in rows)
    assert got == _ref_cdc_chunks(text)


def _ref_funnel(events: list[tuple[int, int, str, int]]) -> dict[int, int]:
    """Reference windowFunnel: per user, max level over view anchors
    (first click in (t0, t0+60], then first purchase in (t1, t0+60])."""
    from collections import defaultdict

    by_user = defaultdict(lambda: defaultdict(list))
    for _, u, typ, t in events:
        by_user[u][typ].append(t)
    levels = {}
    for u, tt in by_user.items():
        best = 0
        for t0 in tt.get("view", []):
            lvl = 1
            clicks = sorted(c for c in tt.get("click", []) if t0 < c <= t0 + 60)
            if clicks:
                lvl = 2
                t1 = clicks[0]
                if any(t1 < p <= t0 + 60 for p in tt.get("purchase", [])):
                    lvl = 3
            best = max(best, lvl)
        if best:
            levels[u] = best
    out: dict[int, int] = {}
    for lvl in levels.values():
        out[lvl] = out.get(lvl, 0) + 1
    return out


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    evs=st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=3),  # user
            st.sampled_from(["view", "click", "purchase"]),
            st.integers(min_value=0, max_value=150),  # minute offset
        ),
        min_size=0,
        max_size=15,
    )
)
def test_windowed_funnel_matches_reference(spark, evs):
    from datetime import datetime, timedelta

    import _data_engineering_pipeline_project_spark.queries_ext5 as q5

    base = datetime(2024, 1, 1, 0, 0, 0)
    rows = [
        Row(
            event_id=i + 1,
            ts=base + timedelta(minutes=t),
            user_id=u,
            event_type=typ,
            value=1.0,
            props="{}",
        )
        for i, (u, typ, t) in enumerate(evs)
    ]
    if not rows:
        return
    ev = spark.createDataFrame(rows)
    orig = q5.table
    try:
        q5.table = lambda sp, sf, name: ev
        got = {
            r["funnel_level"]: r["n_users"]
            for r in q5.windowed_funnel_events(spark, "unused").collect()
        }
    finally:
        q5.table = orig
    ref = _ref_funnel([(i, u, typ, t) for i, (u, typ, t) in enumerate(evs)])
    assert got == ref
