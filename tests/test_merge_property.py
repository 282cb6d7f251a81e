"""Property-based check: vectorized LWW == sequential oracle for ANY log."""

import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

from ton_etl_ray.core.merge import compact, oracle_apply


def _table(events):
    # events: list of (key:int, op, payload:int); lsn = position
    return pa.table(
        {
            "lsn": pa.array(range(len(events)), pa.int64()),
            "op": pa.array([op for _, op, _ in events], pa.string()),
            "doc_id": pa.array([f"k{k}" for k, _, _ in events], pa.string()),
            "tokens": pa.array(
                [None if op == "d" else [p] for _, op, p in events], pa.list_(pa.int32())
            ),
        }
    )


@settings(max_examples=60, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=8),
            st.sampled_from(["c", "u", "d"]),
            st.integers(min_value=0, max_value=1000),
        ),
        min_size=0,
        max_size=60,
    ),
    st.randoms(use_true_random=False),
)
def test_compact_equals_oracle_any_log(events, rnd):
    t = _table(events)
    # at-least-once delivery: append exact duplicates of random rows
    if len(events):
        dup_idx = [rnd.randrange(len(events)) for _ in range(min(5, len(events)))]
        t = pa.concat_tables([t, t.take(pa.array(dup_idx))])
    got = {
        r["doc_id"]: (r["lsn"], tuple(r["tokens"]))
        for r in compact(t, keep_tombstones=False).to_pylist()
    }
    want = {
        r["doc_id"]: (r["lsn"], tuple(r["tokens"]))
        for r in oracle_apply(t).to_pylist()
    }
    assert got == want
