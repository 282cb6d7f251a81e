"""Transform protocol + registry tests (the §2.10 extension surface).

Transforms must be pure over Arrow batches → unit-testable with no
cluster (first tests), and runnable through the registry's actor-pool
fan-out (last test)."""

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

import ray.data as rd

from ton_etl_ray.registry import REGISTRY, Transform, TransformRegistry, register
from ton_etl_ray.transforms import BigErrorAlert, PurchaseEnrich

SF = "/root/testdata/sf0.001"


def _events():
    return pq.read_table(f"{SF}/events.parquet")


def test_transform_pure_no_cluster():
    t = PurchaseEnrich()
    out = t(_events())
    assert out.column_names == ["event_id", "user_id", "amount", "fee"]
    assert out.num_rows > 0
    ev = _events()
    n_purchase = ev.filter(pa.compute.equal(ev["event_type"], "purchase")).num_rows
    assert out.num_rows == n_purchase


def test_prepare_runs_before_apply():
    t = BigErrorAlert(threshold=0.0)
    t.prepare()
    out = t(_events())
    assert "is_vip" in out.column_names
    assert out.num_rows > 0


def test_registry_filtering_by_name():
    sub = REGISTRY.select({"PurchaseEnrich"})
    assert len(sub.transforms_for("events")) == 1
    assert len(REGISTRY.transforms_for("events")) >= 3


def test_register_requires_source():
    r = TransformRegistry()

    class Bad(Transform):
        pass

    with pytest.raises(ValueError):
        r.register(Bad)


def test_registry_run_fans_out():
    sources = {"events": rd.read_parquet(f"{SF}/events.parquet")}
    outputs = REGISTRY.run(sources, concurrency=2)
    assert {"trades", "signups", "alerts"} <= set(outputs)
    trades = outputs["trades"].to_pandas()
    ev = _events()
    n_purchase = ev.filter(pa.compute.equal(ev["event_type"], "purchase")).num_rows
    assert len(trades) == n_purchase
    assert (trades["fee"] > 0).all()


def test_metadata_enrich_transform():
    """P30-shaped transform: prepared fetcher state, predicate gating,
    enrichment columns on the side output."""
    import pyarrow as pa
    import ray.data as rd

    import ton_etl_ray.transforms  # noqa: F401
    from ton_etl_ray.registry import REGISTRY

    sources = {"events": rd.read_parquet("/root/testdata/sf0.001/events.parquet")}
    out = REGISTRY.select({"MetadataEnrich"}).run(sources)["enriched_signups"]
    df = out.to_pandas()
    assert (df["event_type"] == "signup").all()
    assert df["fetch_ok"].all()
    assert (df["enrichment"] == '{"u": "SIGNUP"}').all()


def test_boc_parsers_pure_no_cluster():
    """Real P-family parsers: opcode predicate on the typed column, BOC
    body decode of the claimed rows — values recomputable from the event
    row (the same arithmetic the DuckDB oracle uses)."""
    import hashlib

    import numpy as np

    from ton_etl_ray.functions import opcode_signed
    from ton_etl_ray.ops.messages import OP_BY_TYPE, encode_event_body
    from ton_etl_ray.transforms import JettonTransferParse, SnakeCommentDecode

    rows = [(10, 3, "purchase"), (11, 4, "click"), (12, 5, "view")]
    batch = pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "opcode": pa.array(
                opcode_signed(np.array([OP_BY_TYPE[r[2]] for r in rows], np.uint32)),
                pa.int32(),
            ),
            "body_boc": pa.array(
                [encode_event_body(*r) for r in rows], pa.binary()
            ),
        }
    )

    jt = JettonTransferParse()(batch)
    assert jt.num_rows == 1
    h = hashlib.md5(b"user-3").hexdigest()
    rh = hashlib.md5(b"resp-3").hexdigest()
    assert jt.to_pylist() == [
        {"event_id": 10, "query_id": 10, "amount_nano": 10 * 1000 + 7,
         "dest_addr": f"0:{(h + h).upper()}",
         "resp_addr": f"0:{(rh + rh).upper()}",
         "has_custom_payload": True,  # 10 % 5 == 0
         "fwd_ton_amount": 10 % 997,
         "fwd_comment": "fwd 10"}
    ]

    cm = SnakeCommentDecode()(batch)
    assert cm.to_pylist() == [{"event_id": 11, "comment": "evt 11"}]


def test_jetton_parser_addr_none():
    """TEP-74 bodies may carry addr_none destinations (common for
    response_destination) — the parser must emit NULL, not crash."""
    import numpy as np

    from ton_etl_ray.boc import Builder, serialize_boc
    from ton_etl_ray.functions import opcode_signed
    from ton_etl_ray.transforms import JettonTransferParse

    b = (
        Builder().store_uint(0x0F8A7EA5, 32).store_uint(9, 64)
        .store_coins(42).store_address(None).store_address(None)
        .store_bit(0).store_coins(0).store_bit(0)
    )
    batch = pa.table(
        {
            "event_id": pa.array([1], pa.int64()),
            "opcode": pa.array(
                np.array([opcode_signed(0x0F8A7EA5)], np.int32), pa.int32()
            ),
            "body_boc": pa.array([serialize_boc(b.end_cell())], pa.binary()),
        }
    )
    out = JettonTransferParse()(batch).to_pylist()
    assert out == [{"event_id": 1, "query_id": 9, "amount_nano": 42,
                    "dest_addr": None, "resp_addr": None,
                    "has_custom_payload": False, "fwd_ton_amount": 0,
                    "fwd_comment": None}]


def test_batch_mint_one_to_many():
    """P17-family 1→many: one view message with k items fans out to k
    typed rows via the registry's flat-map apply hook."""
    import numpy as np

    from ton_etl_ray.functions import opcode_signed
    from ton_etl_ray.ops.messages import OP_BY_TYPE, encode_event_body
    from ton_etl_ray.transforms import BatchMintParse

    rows = [(5, 1, "view"), (6, 2, "click"), (7, 3, "view")]
    batch = pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "opcode": pa.array(
                opcode_signed(np.array([OP_BY_TYPE[r[2]] for r in rows], np.uint32)),
                pa.int32(),
            ),
            "body_boc": pa.array([encode_event_body(*r) for r in rows], pa.binary()),
        }
    )
    out = BatchMintParse()(batch).to_pylist()
    # event 5 → 5 % 3 + 1 = 3 items; event 7 → 2 items; click filtered out
    assert out == [
        {"event_id": 5, "item_idx": 0, "item_amount": 50},
        {"event_id": 5, "item_idx": 1, "item_amount": 51},
        {"event_id": 5, "item_idx": 2, "item_amount": 52},
        {"event_id": 7, "item_idx": 0, "item_amount": 70},
        {"event_id": 7, "item_idx": 1, "item_amount": 71},
    ]


def test_worker_cache_token_unique_across_registries(ray_session):
    """Two registries whose FIRST registration is the same class (with
    different kwargs) must not share a worker-cache token — the old
    per-instance counter gave both `id(cls).0`, so whichever registry
    ran first had its prepared instance (with ITS kwargs) served to the
    other registry's batches."""

    class Scaled(Transform):
        source = "events"
        emits = "scaled"

        def __init__(self, factor=1):
            self.factor = factor

        def apply(self, batch: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            return pa.table({
                "event_id": batch["event_id"],
                "scaled": pc.multiply(batch["event_id"], self.factor),
            })

    reg_a, reg_b = TransformRegistry(), TransformRegistry()
    reg_a.register(Scaled, factor=2)
    reg_b.register(Scaled, factor=5)

    src = {"events": rd.read_parquet(f"{SF}/events.parquet",
                                     columns=["event_id"])}
    # task path (worker-process cache): run A first so its instance is
    # warm in the cache, then B — B must still see factor=5
    a = reg_a.run(src)["scaled"].to_pandas().sort_values("event_id")
    b = reg_b.run(src)["scaled"].to_pandas().sort_values("event_id")
    assert (a["scaled"] == a["event_id"] * 2).all()
    assert (b["scaled"] == b["event_id"] * 5).all()
