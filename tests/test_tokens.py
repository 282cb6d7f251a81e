"""Token-payload analytics over the committed lake, checked against
DuckDB unnest(tokens) on the lake parquet itself — independent of the
analytic md5/LCG derivation the driver oracle uses, so a generator bug
and an operator bug can't cancel out."""

import duckdb

SF = "/root/testdata/sf0.001"


def _lake_files(sf_dir: str) -> list[str]:
    # the SAME committed lake the queries read (never a stale glob of a
    # different cache path)
    from ton_etl_ray.cdc import sink
    from ton_etl_ray.pipelines import ensure_flagship_lake

    files = sink.lake_files(ensure_flagship_lake(sf_dir))
    assert files
    return files


def test_lake_token_histogram_matches_duckdb_over_lake():
    from ton_etl_ray.ops.tokens import lake_token_histogram

    got = lake_token_histogram(SF, k=25).to_pandas()
    files = _lake_files(SF)
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
    from ton_etl_ray.ops.tokens import source_token_budget

    got = (
        source_token_budget(SF).to_pandas()
        .sort_values("source").reset_index(drop=True)
    )
    files = _lake_files(SF)
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
