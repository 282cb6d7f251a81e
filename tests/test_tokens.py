"""Token-payload analytics over the committed lake, checked against
DuckDB unnest(tokens) on the lake parquet itself (token values are
PRNG-derived in the change log, so the driver's input-table views can't
express these — the lake IS the oracle surface)."""

import glob
import os

import duckdb

SF = "/root/testdata/sf0.001"


def _lake_files(tag_dir: str) -> list[str]:
    files = glob.glob(os.path.join(tag_dir, "**", "*.parquet"), recursive=True)
    assert files
    return files


def test_lake_token_histogram_matches_duckdb_over_lake():
    from ton_etl_ray.ops.tokens import lake_token_histogram
    from ton_etl_ray.pipelines import flagship  # noqa: F401

    got = lake_token_histogram(SF, k=25).to_pandas()
    # the query's own flagship() call just rebuilt the lake for SF
    import hashlib

    tag = hashlib.sha256(SF.encode()).hexdigest()[:12]
    lake_dir = f"/tmp/tonray_flagship_{tag}/lake"
    files = _lake_files(lake_dir)
    want = duckdb.sql(
        f"""
        SELECT CAST(t AS INT) AS token, CAST(count(*) AS BIGINT) AS n_occurrences
        FROM (SELECT unnest(tokens) AS t FROM read_parquet({files}))
        GROUP BY 1 ORDER BY 2 DESC, 1 LIMIT 25
        """
    ).df()
    assert got["token"].tolist() == want["token"].tolist()
    assert got["n_occurrences"].tolist() == want["n_occurrences"].tolist()


def test_source_token_budget_matches_duckdb_over_lake():
    import hashlib

    from ton_etl_ray.ops.tokens import source_token_budget

    got = (
        source_token_budget(SF).to_pandas()
        .sort_values("source").reset_index(drop=True)
    )
    tag = hashlib.sha256(SF.encode()).hexdigest()[:12]
    files = _lake_files(f"/tmp/tonray_flagship_{tag}/lake")
    want = duckdb.sql(
        f"""
        SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(n_tok) AS BIGINT) AS total_tokens,
               round(CAST(sum(n_tok) AS DOUBLE) / count(*), 4) AS mean_tokens
        FROM read_parquet({files}) GROUP BY 1 ORDER BY 1
        """
    ).df()
    assert got["source"].tolist() == want["source"].tolist()
    for c in ("n_docs", "total_tokens", "mean_tokens"):
        assert (got[c].to_numpy() == want[c].to_numpy()).all(), c
