"""Property-based SCD2 fuzzing: arbitrary batch sequences are merged by
the Spark operator and replayed against a trivial in-memory model; the
final snapshot must match exactly and core invariants must hold."""

from __future__ import annotations

from datetime import datetime, timedelta

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from _data_engineering_pipeline_project_spark.operators.scd2 import scd2_merge

# a batch: dict key → value (small spaces force collisions/updates/deletes)
batch_strategy = st.dictionaries(
    st.integers(min_value=1, max_value=4),
    st.sampled_from(["a", "b", "c"]),
    max_size=4,
)


def model_replay(batches):
    """Reference semantics in 10 lines of Python: the current snapshot is
    (value, updated_at, is_deleted) per key."""
    state: dict[int, tuple[str, int, bool]] = {}
    for t, batch in enumerate(batches):
        live = {k for k, (_, _, d) in state.items() if not d}
        for k, v in batch.items():
            if k not in state or state[k][2]:  # new or resurrected
                state[k] = (v, t, False)
            elif state[k][0] != v:  # changed
                state[k] = (v, t, False)
        for k in live - set(batch):  # deleted
            v, _, _ = state[k]
            state[k] = (v, t, True)
    return state


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(batches=st.lists(batch_strategy, min_size=1, max_size=3))
def test_scd2_matches_model(spark, batches):
    t0 = datetime(2024, 1, 1)
    snapshot = None
    for i, batch in enumerate(batches):
        inc = (
            spark.createDataFrame(
                [(k, v) for k, v in batch.items()], "id int, v string"
            )
            if batch
            else spark.createDataFrame([], "id int, v string")
        )
        res = scd2_merge(inc, snapshot, ["id"], t0 + timedelta(days=i))
        snapshot = res.snapshot

    got = {
        r["id"]: (r["v"], (r["updated_at"] - t0).days, r["is_deleted"])
        for r in snapshot.collect()
    }
    want = model_replay(batches)
    assert got == want
    # invariant: snapshot PKs unique
    assert len(got) == snapshot.count()
