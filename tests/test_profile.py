"""profile_table: per-column rows/nulls/exact-distinct, checked against
DuckDB on both a null-bearing synthetic table and the real events table."""

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq


def test_profile_synthetic_nulls(ray_session, tmp_path):
    from ton_etl_ray.ops.profile import profile_table

    t = pa.table(
        {
            "a": pa.array([1, 1, 2, None, None], pa.int64()),
            "b": pa.array(["x", None, "x", "y", "z"], pa.string()),
            "c": pa.array([1.5, float("nan"), 1.5, None, 2.5], pa.float64()),
        }
    )
    pq.write_table(t, tmp_path / "mini.parquet")
    out = profile_table(str(tmp_path), table="mini").to_pydict()
    assert out["column"] == ["a", "b", "c"]
    assert out["n_rows"] == [5, 5, 5]
    assert out["n_nulls"] == [2, 1, 1]
    # count(DISTINCT ...) semantics: nulls excluded, NaN is a value
    assert out["n_distinct"] == [2, 3, 3]


def test_profile_all_null_column(ray_session, tmp_path):
    """An all-NULL column must still appear in the profile with
    n_distinct=0 / n_nulls=n_rows (ADVICE r3: the inner merge silently
    dropped exactly the degenerate column a publish gate must report)."""
    from ton_etl_ray.ops.profile import profile_table

    t = pa.table(
        {
            "a": pa.array([1, 2, 3], pa.int64()),
            "z": pa.array([None, None, None], pa.string()),
        }
    )
    pq.write_table(t, tmp_path / "mini.parquet")
    out = profile_table(str(tmp_path), table="mini").to_pydict()
    assert out["column"] == ["a", "z"]
    assert out["n_rows"] == [3, 3]
    assert out["n_nulls"] == [0, 3]
    assert out["n_distinct"] == [3, 0]


def test_profile_events_matches_duckdb(ray_session):
    from ton_etl_ray.ops.profile import profile_table

    sf = "/root/testdata/sf0.001"
    got = profile_table(sf, table="events").to_pandas()
    want = duckdb.sql(
        f"""
        SELECT 'event_id' AS column, count(*) AS n_rows,
               count(*) - count(event_id) AS n_nulls,
               count(DISTINCT event_id) AS n_distinct FROM '{sf}/events.parquet'
        UNION ALL SELECT 'event_type', count(*), count(*) - count(event_type),
               count(DISTINCT event_type) FROM '{sf}/events.parquet'
        UNION ALL SELECT 'props', count(*), count(*) - count(props),
               count(DISTINCT props) FROM '{sf}/events.parquet'
        UNION ALL SELECT 'ts', count(*), count(*) - count(ts),
               count(DISTINCT ts) FROM '{sf}/events.parquet'
        UNION ALL SELECT 'user_id', count(*), count(*) - count(user_id),
               count(DISTINCT user_id) FROM '{sf}/events.parquet'
        UNION ALL SELECT 'value', count(*), count(*) - count(value),
               count(DISTINCT value) FROM '{sf}/events.parquet'
        ORDER BY 1
        """
    ).df()
    for c in ("column", "n_rows", "n_nulls", "n_distinct"):
        assert (got[c].to_numpy() == want[c].to_numpy()).all(), c


def test_fk_orphans_planted(ray_session, tmp_path):
    """Planted orphans are found with exact per-key row counts; a clean
    FK yields an empty result."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from ton_etl_ray.ops.profile import fk_orphans

    d = tmp_path
    pq.write_table(
        pa.table({"o_custkey": pa.array([1, 1, 2, 3, 99, 99, 99], pa.int64())}),
        d / "orders.parquet",
    )
    pq.write_table(
        pa.table({"c_custkey": pa.array([1, 2, 3], pa.int64())}),
        d / "customer.parquet",
    )
    out = fk_orphans(str(d)).to_pandas()
    assert out.to_dict("records") == [{"orphan_key": 99, "n_rows": 3}]

    # clean FK (parent covers every child key) → empty violation set
    pq.write_table(
        pa.table({"c_custkey": pa.array([1, 2, 3, 99], pa.int64())}),
        d / "customer.parquet",
    )
    assert fk_orphans(str(d)).count() == 0


def test_fk_orphans_matches_duckdb_with_erasures(ray_session):
    import numpy as np
    import pyarrow as pa

    from ton_etl_ray.ops.profile import fk_orphans

    sf = "/root/testdata/sf0.001"

    def erased(t):
        k = t["c_custkey"].to_numpy(zero_copy_only=False)
        return pa.array((k % 7) != 0)

    got = (
        fk_orphans(sf, parent_filter=erased)
        .to_pandas().sort_values("orphan_key").reset_index(drop=True)
    )
    want = duckdb.sql(
        f"""
        SELECT o_custkey AS orphan_key, count(*) AS n_rows
        FROM '{sf}/orders.parquet'
        LEFT JOIN (SELECT c_custkey FROM '{sf}/customer.parquet'
                   WHERE c_custkey % 7 <> 0) p ON o_custkey = p.c_custkey
        WHERE p.c_custkey IS NULL GROUP BY 1 ORDER BY 1
        """
    ).df()
    assert len(got) == len(want) > 0
    assert (got["orphan_key"].to_numpy() == want["orphan_key"].to_numpy()).all()
    assert (got["n_rows"].to_numpy() == want["n_rows"].to_numpy()).all()


def test_fk_orphans_null_and_type_semantics(ray_session, tmp_path):
    """Null child keys report as one NULL orphan group (SQL LEFT JOIN:
    NULL matches nothing); null parent keys match nothing; non-integer
    keys fail fast with a clear error."""
    import pytest

    from ton_etl_ray.ops.profile import fk_orphans

    pq.write_table(
        pa.table({"o_custkey": pa.array([1, None, None, 7], pa.int64())}),
        tmp_path / "orders.parquet",
    )
    pq.write_table(
        pa.table({"c_custkey": pa.array([1, None], pa.int64())}),
        tmp_path / "customer.parquet",
    )
    out = fk_orphans(str(tmp_path)).to_pandas()
    rows = {(None if pa.compute.is_null(pa.scalar(k)).as_py() or k != k else int(k)): int(n)
            for k, n in zip(out["orphan_key"], out["n_rows"])}
    # key 7 is orphaned; the two NULL-keyed rows form the NULL group;
    # key 1 resolves (parent NULL matches nothing and harms nothing)
    assert rows == {7: 1, None: 2}

    d2 = tmp_path / "s"
    d2.mkdir()
    pq.write_table(
        pa.table({"o_custkey": pa.array(["a"], pa.string())}),
        d2 / "orders.parquet",
    )
    pq.write_table(
        pa.table({"c_custkey": pa.array([1], pa.int64())}),
        d2 / "customer.parquet",
    )
    with pytest.raises(Exception, match="integer"):
        fk_orphans(str(d2)).take_all()
