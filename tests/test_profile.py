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
