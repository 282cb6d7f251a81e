"""S5/K5 analogue: operators are source-format-agnostic (CSV replay)."""

import os

import pyarrow.compute as pc
import pyarrow.parquet as pq

from ton_etl_ray.sources import read_table, write_table
from ton_etl_ray.transforms import PurchaseEnrich

SF = "/root/testdata/sf0.001"


def test_csv_roundtrip_same_transform_result(tmp_path):
    # export events to CSV, replay the same transform over both sources
    ev = pq.read_table(f"{SF}/events.parquet").drop_columns(["props"])
    csv_path = str(tmp_path / "events.csv")
    import pyarrow.csv as pacsv

    pacsv.write_csv(ev, csv_path)

    from_parquet = read_table(f"{SF}/events.parquet").map_batches(
        PurchaseEnrich(), batch_format="pyarrow"
    ).to_pandas().sort_values("event_id").reset_index(drop=True)
    from_csv = read_table(csv_path).map_batches(
        PurchaseEnrich(), batch_format="pyarrow"
    ).to_pandas().sort_values("event_id").reset_index(drop=True)

    assert (from_parquet["event_id"] == from_csv["event_id"]).all()
    assert (from_parquet["amount"] == from_csv["amount"]).all()


def test_csv_sink(tmp_path):
    ds = read_table(f"{SF}/events.parquet", columns=["event_id", "value"])
    out = str(tmp_path / "out_csv")
    write_table(ds, out, fmt="csv")
    import ray.data as rd

    back = rd.read_csv(out)  # directory of part files
    assert back.count() == ds.count()
