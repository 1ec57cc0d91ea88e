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


def _ref_clamped(rows):
    """Reference clamped balance: fold max(0, s+delta) over moves sorted
    by (shipdate, orderkey, linenumber, delta)."""
    from collections import defaultdict

    per = defaultdict(list)
    for pk, d, sd, ok, ln in rows:
        per[pk].append((sd, ok, ln, d))
    out = {}
    for pk, moves in per.items():
        s = 0
        for _, _, _, d in sorted(moves):
            s = max(0, s + d)
        out[pk] = (len(moves), s)
    return out


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    moves=st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=3),    # part
            st.integers(min_value=1, max_value=9),    # qty
            st.booleans(),                            # receipt?
            st.integers(min_value=1, max_value=5),    # day
            st.integers(min_value=1, max_value=4),    # orderkey
        ),
        min_size=1,
        max_size=12,
    )
)
def test_clamped_balance_matches_reference(spark, moves):
    from datetime import datetime

    import _data_engineering_pipeline_project_spark.queries_ext5 as q5

    rows = [
        Row(
            l_partkey=pk,
            l_quantity=float(q),
            l_returnflag="N" if rec else "R",
            l_shipdate=datetime(2024, 1, day),
            l_orderkey=ok,
            l_linenumber=i + 1,
        )
        for i, (pk, q, rec, day, ok) in enumerate(moves)
    ]
    li = spark.createDataFrame(rows)
    orig = q5.table
    try:
        q5.table = lambda sp, sf, name: li
        got = {
            r["l_partkey"]: (r["n_moves"], r["final_balance"])
            for r in q5.clamped_running_balance_parts(spark, "unused").collect()
        }
    finally:
        q5.table = orig
    ref_rows = [
        (pk, q if rec else -q, datetime(2024, 1, day), ok, i + 1)
        for i, (pk, q, rec, day, ok) in enumerate(moves)
    ]
    from datetime import datetime

    assert got == _ref_clamped(ref_rows)


def _ref_kmv_ops(sets, k=64):
    """Reference KMV set algebra from exact per-element md5 hashes."""
    import hashlib

    def h(u):
        return int(hashlib.md5(str(u).encode()).hexdigest()[:15], 16)

    sk = {t: sorted({h(u) for u in us})[:k] for t, us in sets.items()}
    out = {}
    for a in sorted(sk):
        for b in sorted(sk):
            if a >= b:
                continue
            union = sorted(set(sk[a]) | set(sk[b]))[:k]
            ni = sum(1 for x in union if x in set(sk[a]) and x in set(sk[b]))
            nu = len(union)
            eu = float(nu) if nu < k else (k - 1) * float(1 << 60) / union[-1]
            jac = ni / nu
            out[(a, b)] = (ni, round(eu, 4), round(jac, 4), round(jac * eu, 4))
    return out


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    spec=st.dictionaries(
        st.sampled_from(["A", "B", "C"]),
        st.sets(st.integers(min_value=1, max_value=200), min_size=1, max_size=80),
        min_size=2,
        max_size=3,
    )
)
def test_kmv_set_ops_match_reference(spark, spec):
    from datetime import datetime

    import _data_engineering_pipeline_project_spark.queries_ext5 as q5

    rows, i = [], 0
    for t, us in spec.items():
        for u in us:
            i += 1
            rows.append(Row(event_id=i, ts=datetime(2024, 1, 1), user_id=u,
                            event_type=t, value=1.0, props="{}"))
    ev = spark.createDataFrame(rows)
    orig = q5.table
    try:
        q5.table = lambda sp, sf, name: ev
        got = {
            (r["type_a"], r["type_b"]): (
                r["n_inter_sketch"],
                r["est_union"],
                r["jaccard_est"],
                r["est_inter"],
            )
            for r in q5.kmv_set_ops_event_types(spark, "unused").collect()
        }
    finally:
        q5.table = orig
    assert got == _ref_kmv_ops(spec)


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    orders=st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=20),   # start day
            st.integers(min_value=0, max_value=10),   # duration days
            st.integers(min_value=0, max_value=3),    # n lineitems
        ),
        min_size=1,
        max_size=10,
    )
)
def test_sweepline_concurrency_matches_bruteforce(spark, orders):
    from datetime import datetime, timedelta

    import _data_engineering_pipeline_project_spark.queries_ext5 as q5

    base = datetime(2024, 1, 1)
    orows, lrows = [], []
    for i, (s, dur, nl) in enumerate(orders, start=1):
        orows.append(
            Row(o_orderkey=i, o_orderdate=base + timedelta(days=s),
                o_custkey=1, o_orderstatus="O", o_totalprice=1.0,
                o_orderpriority="1-X")
        )
        for j in range(nl):
            lrows.append(
                Row(l_orderkey=i, l_linenumber=j + 1,
                    l_shipdate=base + timedelta(days=s + dur))
            )
    odf = spark.createDataFrame(orows)
    ldf = (
        spark.createDataFrame(lrows)
        if lrows
        else spark.createDataFrame([], "l_orderkey long, l_linenumber int, l_shipdate timestamp")
    )
    orig = q5.table
    try:
        q5.table = lambda sp, sf, name: odf if name == "orders" else ldf
        got = {
            r["day"]: r["n_open"]
            for r in q5.concurrent_open_orders_daily(spark, "unused").collect()
        }
    finally:
        q5.table = orig
    # brute force: an order with lineitems is open [start, start+dur];
    # without lineitems, open on its start day only
    import datetime as dtmod

    intervals = []
    for i, (s, dur, nl) in enumerate(orders, start=1):
        end = s + dur if nl else s
        intervals.append((s, end))
    for day, n_open in got.items():
        d = (datetime(day.year, day.month, day.day) - base).days
        expected = sum(1 for (s, e) in intervals if s <= d <= e)
        assert n_open == expected, (day, n_open, expected)
