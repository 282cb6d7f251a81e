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


def test_portable_shuffle_join_matches_pandas_merge():
    """Property: the union-tag-bucket join equals a plain pandas merge
    for random key distributions (incl. duplicate keys on both sides,
    keys present on only one side, and list-typed payload columns)."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from hypothesis import given, settings, strategies as st

    from ton_etl_ray.ops.relational import _portable_shuffle_join

    @settings(max_examples=5, deadline=None)
    @given(
        lkeys=st.lists(st.integers(0, 12), min_size=0, max_size=30),
        rkeys=st.lists(st.integers(0, 12), min_size=0, max_size=30),
        seed=st.integers(0, 10_000),
    )
    def check(lkeys, rkeys, seed):
        rng = np.random.default_rng(seed)
        lt = pa.table({
            "k": pa.array(lkeys, pa.int64()),
            "lv": pa.array(rng.integers(0, 100, len(lkeys)), pa.int64()),
            "feats": pa.array([[int(x)] * (i % 3) for i, x in enumerate(lkeys)],
                              pa.list_(pa.int64())),
        })
        rt = pa.table({
            "k": pa.array(rkeys, pa.int64()),
            "rv": pa.array(rng.integers(0, 100, len(rkeys)), pa.int64()),
        })
        got = _portable_shuffle_join(
            rd.from_arrow(lt), rd.from_arrow(rt), "k", num_partitions=4,
            left_schema=lt.schema, right_schema=rt.schema,
        ).to_pandas()
        want = lt.to_pandas().merge(rt.to_pandas(), on="k", how="inner")

        def norm(df):
            if df.empty:
                return []
            return sorted(
                (int(k), int(lv), tuple(f), int(rv))
                for k, lv, f, rv in zip(df["k"], df["lv"], df["feats"], df["rv"])
            )

        assert norm(got) == norm(want)

    check()
