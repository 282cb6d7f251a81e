"""Text-analysis operators for training-data pipelines over ``documents``.

Stateful stages (compiled regexes, stopword tables) are actor pools:
setup in ``__init__`` once per actor, vectorized work per batch —
the reference's parser-prepare() pattern (parser/model/parser.py:52-80)
re-expressed as ``map_batches(Cls, concurrency=N)``.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd

from .._pickle import ensure_portable
from ._util import pool as _pool, read_table


def doc_token_stats(sf_dir: str):
    """Token counting + simple quality counters, oracle-matched semantics:
    n_words = number of single-space-separated pieces (== DuckDB
    len(string_split(text,' '))), punct_count via the same regex class."""
    ensure_portable()
    ds = read_table(sf_dir, "documents", columns=["doc_id", "text", "n_chars"])

    def fn(t: pa.Table) -> pa.Table:
        pieces = pc.split_pattern(t["text"], pattern=" ")
        n_words = pc.list_value_length(pieces).cast(pa.int64())
        punct = pc.count_substring_regex(t["text"], pattern=r"[.!?,;:]").cast(pa.int64())
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "n_words": n_words,
                "n_chars": t["n_chars"],
                "punct_count": punct,
            }
        )

    return ds.map_batches(fn, batch_format="pyarrow")


BPE_PATTERN = r"'s|'t|'re|'ve|'m|'ll|'d| ?[A-Za-z]+| ?[0-9]+| ?[^\sA-Za-z0-9]+|\s+"


class BpeTokenCount:
    """BPE-ish regex tokenizer count (GPT-2-style contraction/word/number/
    punct split, ASCII-simplified so Python re and DuckDB RE2 agree).
    Pattern compiled once per actor."""

    def __init__(self):
        self.pat = re.compile(BPE_PATTERN)

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        counts = [len(self.pat.findall(t)) for t in batch["text"]]
        return pd.DataFrame(
            {"doc_id": batch["doc_id"], "bpe_tokens": pd.array(counts, dtype="int64")}
        )


def bpe_token_count(sf_dir: str):
    ensure_portable()
    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    return ds.map_batches(BpeTokenCount, batch_format="pandas", batch_size=4096, concurrency=_pool())


# tiny per-language stopword tables for the n-gram/stopword heuristic
_STOPWORDS = {
    "en": {"the", "and", "of", "a", "to", "in", "is", "that", "for", "with"},
    "de": {"der", "die", "das", "und", "ist", "ein", "zu", "mit", "von", "nicht"},
    "fr": {"le", "la", "et", "les", "des", "un", "une", "est", "pour", "que"},
    "es": {"el", "la", "y", "los", "de", "un", "una", "es", "por", "que"},
    "zh": set(),
}


def _lang_id_frame(t: pa.Table) -> pa.Table:
    """Vectorized language-ID kernel: CJK presence → zh, else argmax of
    per-language DISTINCT-stopword hit counts, ties broken by language
    code ascending (de < en < es < fr), zero hits → en. Batch-level
    polars (extract_all → lowered distinct list → is_in sums); no
    Python loop over rows."""
    import polars as pl

    df = pl.from_arrow(t)
    words = (
        pl.col("text")
        .str.extract_all(r"[a-zA-Z]+")
        .list.eval(pl.element().str.to_lowercase())
        .list.unique()
    )
    scored = df.with_columns(
        pl.col("text").str.contains(r"[一-鿿]").alias("_cjk"),
        *[
            words.list.eval(pl.element().is_in(sorted(sw)))
            .list.sum()
            .fill_null(0)
            .alias(f"_s_{lang}")
            for lang, sw in _STOPWORDS.items()
            if sw
        ],
    )
    s = {lang: pl.col(f"_s_{lang}") for lang in ("de", "en", "es", "fr")}
    best = pl.max_horizontal(*s.values())
    pred = (
        pl.when(pl.col("_cjk"))
        .then(pl.lit("zh"))
        .when(best == 0)
        .then(pl.lit("en"))
        # first maximal language in ascending code order — identical to
        # max(sorted(scores), key=scores.get) over a python dict
        .when(s["de"] == best)
        .then(pl.lit("de"))
        .when(s["en"] == best)
        .then(pl.lit("en"))
        .when(s["es"] == best)
        .then(pl.lit("es"))
        .otherwise(pl.lit("fr"))
    )
    out = scored.select(pl.col("doc_id"), pred.alias("lang_pred"))
    return out.to_arrow().replace_schema_metadata(None)


def lang_id(sf_dir: str):
    """Language-ID heuristic over ``documents``: distinct-stopword
    hit-rate per candidate language + CJK codepoint presence. Pure
    per-row arithmetic on ASCII-exact regex semantics, so the whole
    heuristic is recomputable in ANSI SQL (list_filter over
    regexp_extract_all) — oracle-checked, not rows-only."""
    ensure_portable()
    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    return ds.map_batches(_lang_id_frame, batch_format="pyarrow")


def _quality_frame(t: pa.Table) -> pa.Table:
    """Vectorized quality kernel. Counters come out of polars string
    kernels; the float combination runs in numpy in the documented
    operation order so DuckDB's identically-ordered expression
    reproduces the exact bits. No final rounding — np.round is
    half-even while DuckDB round() is half-away (they disagree on
    exact .5 boundaries, observed in this very corpus), and the
    UNROUNDED expression is already bit-reproducible."""
    import polars as pl

    df = pl.from_arrow(t)
    wd = pl.col("text").str.extract_all(r"\w+")
    stats = df.select(
        pl.col("doc_id"),
        pl.col("text").str.len_chars().cast(pl.Int64).alias("_lc"),
        pl.col("text").str.count_matches(r"[.!?,;:]").cast(pl.Int64).alias("_punct"),
        wd.list.len().cast(pl.Int64).alias("_nw"),
        wd.list.eval(pl.element().str.len_chars())
        .list.sum()
        .fill_null(0)
        .cast(pl.Int64)
        .alias("_wlen"),
        wd.list.eval(pl.element().str.to_lowercase().is_in(sorted(_STOPWORDS["en"])))
        .list.sum()
        .fill_null(0)
        .cast(pl.Int64)
        .alias("_stop"),
    )
    lc = stats["_lc"].to_numpy()
    n = np.maximum(1, stats["_nw"].to_numpy())
    len_score = np.minimum(1.0, lc / 1000.0)
    punct_ratio = stats["_punct"].to_numpy() / np.maximum(1, lc)
    stop_ratio = stats["_stop"].to_numpy() / n
    mean_word_len = stats["_wlen"].to_numpy() / n
    quality = (
        0.4 * len_score
        + 0.3 * (1.0 - np.clip(np.abs(punct_ratio - 0.05), 0, 1))
        + 0.3 * np.clip(stop_ratio, 0, 0.6) / 0.6
    )
    return pa.table(
        {
            "doc_id": stats["doc_id"].to_arrow(),
            "quality": pa.array(quality, pa.float64()),
            "stop_ratio": pa.array(stop_ratio, pa.float64()),
            "mean_word_len": pa.array(mean_word_len, pa.float64()),
        }
    )


def quality_score(sf_dir: str):
    """Quality scoring: length, punctuation ratio, stopword ratio, mean
    word length — the usual pre-training text-quality gates, combined
    into one ``quality`` scalar. Deterministic integer counters + a
    fixed-order float expression → full DuckDB value-hash oracle."""
    ensure_portable()
    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    return ds.map_batches(_quality_frame, batch_format="pyarrow")


def repetition_signals(sf_dir: str, top_n: int = 2, dup_n: int = 5):
    """Gopher-style intra-document repetition quality signals (Rae et
    al. 2021 §A1.1 "repetition removal", word-count form): per document,

    - ``top2_frac``  = fraction of words covered by the single most
      frequent ``top_n``-gram, ``round(top_n * max_count / n_words, 6)``
      (0.0 when the doc has fewer than ``top_n`` words);
    - ``dup5_frac``  = fraction of ``dup_n``-gram positions that are
      repeats of an earlier position,
      ``round(1 - distinct / total, 6)`` (0.0 when fewer than ``dup_n``
      words).

    Boilerplate/spam docs score high on either; a curation pipeline
    filters on thresholds. Pure per-document arithmetic — each document
    is one input row, so this is a single ``map_batches`` with NO
    shuffle; at 100 TB it scales as an embarrassingly parallel scan.
    Vectorized per batch in polars (explode → shift-over-doc n-gram
    construction, grouped counts), no Python loop over rows."""
    ensure_portable()
    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])

    def fn(t: pa.Table) -> pa.Table:
        out = _repetition_frame(
            t["doc_id"].to_numpy(zero_copy_only=False), t["text"].to_pylist(),
            top_n=top_n, dup_n=dup_n,
        )
        # np.round (true-divide) matches DuckDB round(); pl/pc variants
        # are one ulp off on some values (see module perf notes)
        return pa.table(
            {
                "doc_id": pa.array(out["doc_id"].to_numpy(), pa.int64()),
                "n_words": pa.array(out["n_words"].to_numpy(), pa.int64()),
                "top2_frac": pa.array(np.round(out["top2_raw"].to_numpy(), 6), pa.float64()),
                "dup5_frac": pa.array(np.round(out["dup5_raw"].to_numpy(), 6), pa.float64()),
            }
        )

    return ds.map_batches(fn, batch_format="pyarrow")


def _repetition_frame(doc_ids, texts, top_n: int = 2, dup_n: int = 5):
    """Vectorized per-doc repetition kernel shared by
    :func:`repetition_signals` and ``ops.corpus.corpus_curation``.
    Returns a polars frame (doc_id, n_words, top2_raw, dup5_raw) with
    UNROUNDED doubles — gate comparisons stay bit-identical to the SQL
    oracle's IEEE arithmetic; presentation rounding is the caller's."""
    import polars as pl

    if len(texts) == 0:  # pl infers null dtype from [] and str ops raise
        return pl.DataFrame(
            schema={"doc_id": pl.Int64, "n_words": pl.Int64,
                    "top2_raw": pl.Float64, "dup5_raw": pl.Float64}
        )
    base = pl.DataFrame(
        {
            "doc_id": doc_ids,
            "w": pl.Series(texts).str.split(" "),
        }
    )
    n_words = base.select(
        "doc_id", pl.col("w").list.len().cast(pl.Int64).alias("n_words")
    )
    ex = base.explode("w")

    def grams(n: int) -> pl.DataFrame:
        df = ex
        if n > 1:
            df = df.with_columns(
                [pl.col("w").shift(-k).over("doc_id").alias(f"_w{k}")
                 for k in range(1, n)]
            ).drop_nulls()
            g = pl.concat_str(
                [pl.col("w")] + [pl.col(f"_w{k}") for k in range(1, n)],
                separator=" ",
            )
        else:
            g = pl.col("w")
        return df.select("doc_id", g.alias("g"))

    top = (
        grams(top_n)
        .group_by(["doc_id", "g"]).len()
        .group_by("doc_id").agg(pl.col("len").max().alias("maxc"))
    )
    dup = (
        grams(dup_n)
        .group_by("doc_id")
        .agg(pl.len().alias("total"), pl.col("g").n_unique().alias("dist"))
    )
    return (
        n_words.join(top, on="doc_id", how="left")
        .join(dup, on="doc_id", how="left")
        .with_columns(
            pl.when(pl.col("maxc").is_not_null() & (pl.col("n_words") >= top_n))
            .then(top_n * pl.col("maxc") / pl.col("n_words"))
            .otherwise(0.0).alias("top2_raw"),
            pl.when(pl.col("total").is_not_null())
            .then(1.0 - pl.col("dist") / pl.col("total"))
            .otherwise(0.0).alias("dup5_raw"),
        )
        .select("doc_id", "n_words", "top2_raw", "dup5_raw")
    )


_FP_MOD = (1 << 61) - 1
_FP_BASE = 1_000_003


def _word_fingerprint(words: list[str]) -> int:
    """Polynomial rolling hash over per-word blake2b hashes (document
    fingerprinting; order-sensitive, deterministic across processes)."""
    import hashlib

    h = 0
    for w in words:
        wh = int.from_bytes(hashlib.blake2b(w.encode(), digest_size=8).digest(), "big") % _FP_MOD
        h = (h * _FP_BASE + wh) % _FP_MOD
    return h


def doc_fingerprint(sf_dir: str):
    """Deterministic rolling-hash document fingerprint (sha256-file-naming
    analogue, reference datalake/main.py:161-164)."""
    ensure_portable()
    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])

    def fn(batch: pd.DataFrame) -> pd.DataFrame:
        fps = [_word_fingerprint(t.split(" ")) for t in batch["text"]]
        return pd.DataFrame({"doc_id": batch["doc_id"], "fingerprint": pd.array(fps, dtype="int64")})

    return ds.map_batches(fn, batch_format="pandas", batch_size=4096)


def dedup_docs_prefix(sf_dir: str, prefix_len: int = 40):
    """Exact dedup by content key (A1 DISTINCT-merge analogue): one winner
    (min doc_id) per 40-char text prefix. Shuffle on the content key with
    per-batch partial min as the combiner."""
    ensure_portable()
    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])

    def key(t: pa.Table) -> pa.Table:
        prefix = pc.utf8_slice_codeunits(t["text"], 0, prefix_len)
        # per-batch partial min combiner: bounds the shuffle to ≤1 row
        # per prefix per block (skew-proof for duplicate-heavy corpora)
        import polars as pl

        part = (
            pl.from_arrow(pa.table({"prefix": prefix, "doc_id": t["doc_id"]}))
            .group_by("prefix")
            .agg(pl.col("doc_id").min())
        )
        return pa.table({"prefix": pa.array(part["prefix"].to_list(), pa.string()),
                         "doc_id": pa.array(part["doc_id"].to_numpy(), pa.int64())})

    from ray.data.aggregate import Min

    return (
        ds.map_batches(key, batch_format="pyarrow")
        .groupby("prefix")
        .aggregate(Min("doc_id", alias_name="doc_id"))
    )


def top_tokens(sf_dir: str, k: int = 20):
    """Corpus token-frequency top-k — the canonical map-reduce over a
    text corpus (vocabulary building / stopword discovery). Per-batch
    PARTIAL counts (split → explode → value_counts inside the map task)
    bound the shuffle to (distinct-words-per-batch) rows, then one
    grouped sum + sort-limit. Ties broken by token text so the result
    is deterministic and oracle-checkable."""
    ensure_portable()
    from ray.data.aggregate import Sum

    ds = read_table(sf_dir, "documents", columns=["text"])

    def partial_counts(t: pa.Table) -> pa.Table:
        words = pc.list_flatten(pc.split_pattern(t["text"], pattern=" "))
        vc = words.value_counts()
        return pa.table(
            {"token": vc.field("values"), "n": vc.field("counts").cast(pa.int64())}
        )

    agg = (
        ds.map_batches(partial_counts, batch_format="pyarrow")
        .groupby("token")
        .aggregate(Sum("n", alias_name="n_occurrences"))
    )
    top = agg.sort(["n_occurrences", "token"], descending=[True, False]).limit(k)
    return top


def dedup_prefer_source(sf_dir: str, prefix_len: int = 40):
    """Priority-aware exact dedup (the mixture-merge form of A1): one
    winner per content key, but the winner is the copy from the most
    preferred SOURCE (ties by doc_id) — "when the same page appears in
    a curated dump and a web crawl, keep the curated copy". Preference
    order here is ascending source name; swap in any rank map at the
    key step.

    Same skew-proof shape as `dedup_docs_prefix`: the (source, doc_id)
    argmin is encoded as one order-preserving composite string
    (source + US-separator + doc_id zero-padded to 20 digits, the full
    non-negative int64 width — the 0x1f separator sorts below every
    printable char, so composite order == tuple order even when one
    source name prefixes another, e.g. src1 vs src10; doc_ids are
    assumed non-negative, as everywhere in this corpus model),
    reduced with a per-batch partial Min combiner, then ONE
    grouped Min — ≤1 row per content key per block ever ships."""
    ensure_portable()
    ds = read_table(sf_dir, "documents", columns=["doc_id", "source", "text"])

    def key(t: pa.Table) -> pa.Table:
        import polars as pl

        prefix = pc.utf8_slice_codeunits(t["text"], 0, prefix_len)
        part = (
            pl.from_arrow(pa.table({
                "prefix": prefix,
                "source": t["source"],
                "doc_id": t["doc_id"],
            }))
            .with_columns(
                # zfill(20) covers the full non-negative int64 range
                # (19 digits) — at 12 the composite order inverts for
                # doc_ids >= 10^12
                (pl.col("source") + "\x1f"
                 + pl.col("doc_id").cast(pl.String).str.zfill(20)).alias("w")
            )
            .group_by("prefix")
            .agg(pl.col("w").min())
        )
        return pa.table(
            {
                "prefix": pa.array(part["prefix"].to_list(), pa.string()),
                "w": pa.array(part["w"].to_list(), pa.string()),
            }
        )

    from ray.data.aggregate import Min

    won = (
        ds.map_batches(key, batch_format="pyarrow")
        .groupby("prefix")
        .aggregate(Min("w", alias_name="w"))
    )

    def decompose(t: pa.Table) -> pa.Table:
        parts = pc.split_pattern(t["w"], pattern="\x1f")
        src = pc.list_element(parts, 0)
        did = pc.cast(pc.list_element(parts, 1), pa.int64())
        return pa.table({"prefix": t["prefix"], "doc_id": did, "source": src})

    return won.map_batches(decompose, batch_format="pyarrow")
