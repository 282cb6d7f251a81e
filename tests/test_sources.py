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


def test_pipeline_build_lock_single_builder(tmp_path):
    """Two processes racing a missing cache marker: exactly one builds,
    the other waits and sees the finished artifact (the lock exists so
    a waiter never rmtree's a half-built tree)."""
    import subprocess
    import sys
    import textwrap

    script = textwrap.dedent("""
        import os, sys, time
        sys.path.insert(0, %r)
        from ton_etl_ray.pipelines import _build_lock
        base = sys.argv[1]
        with _build_lock(base):
            marker = base + "/_DONE"
            if os.path.exists(marker):
                print("SKIP")  # other process built it
            else:
                os.makedirs(base, exist_ok=True)
                time.sleep(0.5)  # long enough for the race to matter
                open(marker, "w").write("ok")
                print("BUILT")
    """) % ("/root/repo",)
    base = str(tmp_path / "cache")
    procs = [
        subprocess.Popen([sys.executable, "-c", script, base],
                         stdout=subprocess.PIPE, text=True)
        for _ in range(2)
    ]
    outs = sorted(p.communicate()[0].strip() for p in procs)
    assert all(p.returncode == 0 for p in procs)
    assert outs == ["BUILT", "SKIP"]


def test_pipeline_build_lock_reclaims_dead_holder(tmp_path):
    """A lock left by a crashed (dead-pid) builder is reclaimed instead
    of stalling the waiter."""
    import os

    from ton_etl_ray.pipelines import _build_lock

    base = str(tmp_path / "cache")
    lock = base + ".lock"
    os.makedirs(lock)
    with open(os.path.join(lock, "pid"), "w") as f:
        f.write("999999999")  # certainly dead
    with _build_lock(base, timeout=10):
        pass  # acquiring at all proves the reclaim worked


def test_pipeline_build_lock_unreadable_holder_times_out_cleanly(tmp_path):
    """A lock with no readable pid and young age: the waiter raises a
    clean TimeoutError (not UnboundLocalError) after the deadline."""
    import os

    import pytest

    from ton_etl_ray.pipelines import _build_lock

    base = str(tmp_path / "cache")
    os.makedirs(base + ".lock")  # no pid file inside
    with pytest.raises(TimeoutError, match="unreadable holder"):
        with _build_lock(base, timeout=0.5):
            pass


def test_mixed_avro_csv_dir_refused(tmp_path):
    """A directory mixing .avro with ANY other data format is ambiguous
    — the check used to look only for .parquet and silently dropped a
    stray .csv part."""
    import pyarrow as pa
    import pytest

    from ton_etl_ray.sources import read_table
    from ton_etl_ray.sources_avro import write_avro

    d = tmp_path / "mixed"
    d.mkdir()
    write_avro(pa.table({"x": pa.array([1], pa.int64())}), str(d / "a.avro"))
    (d / "b.csv").write_text("x\n2\n")
    with pytest.raises(ValueError, match="mixes .avro"):
        read_table(str(d))
