"""Unit tests for the pure LWW merge kernels (no Ray needed).

Mirrors the reference's pure-function test style
(tests/parser/message/test_swap_volume.py in /root/reference)."""

import pyarrow as pa
import pytest

from ton_etl_ray.core.merge import compact, merge_state, oracle_apply
from ton_etl_ray.gen import make_adversarial_log, make_change_batch


def _chg(rows):
    cols = {
        "lsn": pa.array([r[0] for r in rows], pa.int64()),
        "op": pa.array([r[1] for r in rows], pa.string()),
        "doc_id": pa.array([r[2] for r in rows], pa.string()),
        "tokens": pa.array([r[3] for r in rows], pa.list_(pa.int32())),
    }
    return pa.table(cols)


def test_lww_max_lsn_wins():
    t = _chg([(1, "c", "a", [1]), (3, "u", "a", [3]), (2, "u", "a", [2])])
    out = compact(t, keep_tombstones=False)
    assert out.num_rows == 1
    assert out["lsn"][0].as_py() == 3
    assert out["tokens"][0].as_py() == [3]


def test_tombstone_drops_key():
    t = _chg([(1, "c", "a", [1]), (2, "d", "a", None), (1, "c", "b", [9])])
    out = compact(t, keep_tombstones=False)
    assert out["doc_id"].to_pylist() == ["b"]


def test_tombstone_kept_for_partials():
    t = _chg([(1, "c", "a", [1]), (2, "d", "a", None)])
    out = compact(t, keep_tombstones=True)
    assert out.num_rows == 1 and out["op"][0].as_py() == "d"


def test_delete_then_recreate():
    t = _chg([(1, "c", "a", [1]), (2, "d", "a", None), (3, "c", "a", [7])])
    out = compact(t, keep_tombstones=False)
    assert out["tokens"][0].as_py() == [7]


def test_duplicate_lsn_applies_once():
    # exact duplicates: analogue of ON CONFLICT DO NOTHING (db.py:279-282)
    t = _chg([(5, "c", "a", [5]), (5, "c", "a", [5])])
    out = compact(t, keep_tombstones=False)
    assert out.num_rows == 1


def test_stale_update_loses():
    t = _chg([(9, "u", "a", [9]), (4, "u", "a", [4])])
    out = compact(t, keep_tombstones=False)
    assert out["lsn"][0].as_py() == 9


def test_merge_state_incremental_equals_oneshot():
    log = make_change_batch(num_events=4000, num_keys=250, seed=11)
    half = log.num_rows // 2
    s1 = merge_state(None, log.slice(0, half))
    s2 = merge_state(s1, log.slice(half))
    oneshot = merge_state(None, log)
    a = {r["doc_id"]: (r["lsn"], r["tokens"]) for r in s2.to_pylist()}
    b = {r["doc_id"]: (r["lsn"], r["tokens"]) for r in oneshot.to_pylist()}
    assert a == b


@pytest.mark.parametrize("seed", [1, 2, 3])
def test_compact_matches_sequential_oracle(seed):
    log = make_change_batch(num_events=3000, num_keys=200, seed=seed)
    got = {r["doc_id"]: r["tokens"] for r in compact(log, keep_tombstones=False).to_pylist()}
    want = {r["doc_id"]: r["tokens"] for r in oracle_apply(log).to_pylist()}
    assert got == want


def test_adversarial_corpus_matches_oracle():
    log = make_adversarial_log()
    got = {r["doc_id"]: (r["lsn"], r["tokens"]) for r in compact(log, keep_tombstones=False).to_pylist()}
    want = {r["doc_id"]: (r["lsn"], r["tokens"]) for r in oracle_apply(log).to_pylist()}
    assert got == want
    assert "doc-hot" in got  # deleted at lsn 2000, re-created at 2001


def test_order_insensitivity():
    log = make_change_batch(num_events=2000, num_keys=100, seed=5)
    shuffled = log.take(pa.array(list(reversed(range(log.num_rows)))))
    a = compact(log, keep_tombstones=False).sort_by("doc_id")
    b = compact(shuffled, keep_tombstones=False).sort_by("doc_id")
    assert a.equals(b)


def test_compact_refuses_null_doc_id():
    """Null keys must fail LOUD: the first-of-run mask coerces null
    comparisons to False, so null-key rows used to vanish silently."""
    import pytest

    t = pa.table({
        "doc_id": pa.array(["a", None, "b"], pa.string()),
        "lsn": pa.array([1, 2, 3], pa.int64()),
        "op": pa.array(["c", "c", "c"], pa.string()),
    })
    with pytest.raises(ValueError, match="null doc_id"):
        compact(t)
