"""Corpus-level statistics operators over ``documents`` — the family of
LLM-training-data ops whose score depends on a GLOBAL corpus aggregate
joined back per document: TF-IDF term relevance, unigram-LM quality
scoring (the CCNet-style perplexity-filter analogue), and train/eval
n-gram contamination detection.

Shared shape (and the reason these live in one module): stage 1 emits
exact per-document partial rows inside ``map_batches`` (each document's
text is one row, so per-doc term counts need no shuffle), stage 2
shuffles ONCE on a coarse hash shard of the term/n-gram key and
computes the global statistic vectorized inside ``map_groups`` (a
per-term group would be mostly size ≤ a few rows — pure barrier
overhead), stage 3 shuffles back to the document to reduce the score.
The global-side table (vocabulary / eval n-gram set) is never
broadcast and never touches the driver: at 100 TB a vocabulary or eval
fingerprint set is itself a large dataset, so the join-back is a
shuffle on the same key the statistic was computed on.

Float parity with the DuckDB oracles: scores are ``np.round``-ed
(true-divide round matches DuckDB ``round()``; ``pc.round`` is one ulp
off) and per-doc sums are rounded at 4 decimals so summation-order
low-bit drift cannot flip the oracle hash.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from .._pickle import ensure_portable
from ..core.partition import assert_polars_hash_stable
from ._util import _t, read_table, worker_cache

# term/doc shard keys ride polars' seeded hash — fail loudly on a polars
# build whose hash diverges from the pinned vectors (see core.partition)
assert_polars_hash_stable()

_TERM_SHARDS = 256  # coarse key-shard count for the global-statistic shuffle
_DOC_SHARDS = 64    # coarse doc-shard count for the per-doc reduce


def _ngram_frame(t: pa.Table, n: int):
    """(doc_id, text) Arrow batch → polars frame of (doc_id, ng) word
    ``n``-gram rows (one row per POSITION — callers dedup or count as
    their semantics need). Null texts contribute no rows (the split is
    null, and drop_nulls removes every partially-null window)."""
    import polars as pl

    df = pl.DataFrame(
        {
            "doc_id": t["doc_id"].to_numpy(zero_copy_only=False),
            # explicit dtype: an empty or all-null batch otherwise infers
            # a Null-dtype series and .str.split raises SchemaError
            "w": pl.Series(t["text"].to_pylist(), dtype=pl.String).str.split(" "),
        }
    ).explode("w")
    if n > 1:
        df = df.with_columns(
            [pl.col("w").shift(-k).over("doc_id").alias(f"_w{k}")
             for k in range(1, n)]
        ).drop_nulls()
        gram = pl.concat_str(
            [pl.col("w")] + [pl.col(f"_w{k}") for k in range(1, n)], separator=" "
        )
    else:
        df = df.drop_nulls()
        gram = pl.col("w")
    return df.select(pl.col("doc_id"), gram.alias("ng"))


def _doc_count(sf_dir: str) -> int:
    """Exact corpus row count from parquet footer metadata — no read."""
    import pyarrow.parquet as pq

    return pq.ParquetFile(_t(sf_dir, "documents")).metadata.num_rows


def _tf_rows(sf_dir: str):
    """(doc_id, term, tf) — exact per-document term frequencies.

    Terms are single-space pieces (== DuckDB ``unnest(string_split)``).
    Each document is complete within one input row, so the counts are
    final after the map stage — nothing to combine."""
    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])

    def fn(t: pa.Table) -> pa.Table:
        import polars as pl

        df = pl.DataFrame(
            {
                "doc_id": t["doc_id"].to_numpy(zero_copy_only=False),
                "w": pl.Series(t["text"].to_pylist(), dtype=pl.String).str.split(" "),
            }
        )
        tf = (
            df.explode("w")
            .group_by(["doc_id", "w"])
            .len()
        )
        return pa.table(
            {
                "doc_id": pa.array(tf["doc_id"].to_numpy(), pa.int64()),
                "term": pa.array(tf["w"].to_list(), pa.string()),
                "tf": pa.array(tf["len"].to_numpy().astype(np.int64), pa.int64()),
            }
        )

    return ds.map_batches(fn, batch_format="pyarrow")


def _with_term_shard(ds, col: str = "term"):
    def shard(t: pa.Table) -> pa.Table:
        import polars as pl

        # seeded polars hash: process-stable (tests/test_text.py pins the
        # same property for the shingle hash) — shards must agree across
        # workers. from_arrow is zero-copy (to_pylist boxed every string
        # on the hottest intermediate of the pipeline)
        h = pl.from_arrow(t[col]).hash(seed=0x5EED) % _TERM_SHARDS
        return t.append_column("shard", pa.array(h.to_numpy().astype(np.int64)))

    return ds.map_batches(shard, batch_format="pyarrow")


_TFIDF_SCHEMA = pa.schema(
    [("doc_id", pa.int64()), ("term", pa.string()), ("rank", pa.int64()),
     ("score", pa.float64())]
)


def tfidf_top_terms(sf_dir: str, k: int = 5):
    """Per-document top-``k`` TF-IDF terms (rank by score DESC, term ASC).

    score = round(tf * ln(N / df), 6) with N = corpus doc count and
    df = docs containing the term. The df computation and the score
    both happen in the term-sharded ``map_groups`` (a term's rows are
    co-located by the shard key, and rows are unique per (doc, term),
    so df is just the term's group size); the top-k reduce then
    shuffles by document. Vocabulary never touches the driver."""
    ensure_portable()
    n_docs = float(_doc_count(sf_dir))

    def score(g: pd.DataFrame) -> pa.Table:
        df_per_term = g.groupby("term")["doc_id"].transform("size").to_numpy()
        s = np.round(g["tf"].to_numpy() * np.log(n_docs / df_per_term), 6)
        dshard = g["doc_id"].to_numpy() % _DOC_SHARDS
        return pa.table(
            {
                "doc_id": pa.array(g["doc_id"].to_numpy(), pa.int64()),
                "term": pa.array(g["term"].to_numpy(), pa.string()),
                "score": pa.array(s, pa.float64()),
                "dshard": pa.array(dshard.astype(np.int64), pa.int64()),
            }
        )

    scored_schema = pa.schema(
        [("doc_id", pa.int64()), ("term", pa.string()),
         ("score", pa.float64()), ("dshard", pa.int64())]
    )

    def conform_scored(t: pa.Table) -> pa.Table:
        if "score" not in t.column_names:  # empty sort partition passthrough
            return scored_schema.empty_table()
        return t.select(scored_schema.names)

    def topk(g: pd.DataFrame) -> pa.Table:
        g = g.sort_values(["doc_id", "score", "term"],
                          ascending=[True, False, True], kind="mergesort")
        g = g.groupby("doc_id", sort=False).head(k)
        rank = g.groupby("doc_id", sort=False).cumcount() + 1
        return pa.table(
            {
                "doc_id": pa.array(g["doc_id"].to_numpy(), pa.int64()),
                "term": pa.array(g["term"].to_numpy(), pa.string()),
                "rank": pa.array(rank.to_numpy().astype(np.int64), pa.int64()),
                "score": pa.array(g["score"].to_numpy(), pa.float64()),
            }
        )

    def conform_out(t: pa.Table) -> pa.Table:
        if "rank" not in t.column_names:
            return _TFIDF_SCHEMA.empty_table()
        return t.select(_TFIDF_SCHEMA.names)

    scored = (
        _with_term_shard(_tf_rows(sf_dir))
        .groupby("shard")
        .map_groups(score, batch_format="pandas")
        .map_batches(conform_scored, batch_format="pyarrow")
    )
    return (
        scored.groupby("dshard")
        .map_groups(topk, batch_format="pandas")
        .map_batches(conform_out, batch_format="pyarrow")
    )


_PPL_SCHEMA = pa.schema([("doc_id", pa.int64()), ("logppl", pa.float64())])


def unigram_logppl(sf_dir: str):
    """Per-document unigram-LM negative log-likelihood (mean nats/token)
    — the quality-filter statistic of CCNet-style corpus curation: score
    a document by how surprising its tokens are under the corpus's own
    unigram distribution; high ``logppl`` = rare-token noise, low =
    boilerplate.

    logppl(doc) = round( sum_t tf_t * -ln(cnt_t / T) / n_words , 4 )
    with cnt_t = corpus frequency of term t and T = total corpus tokens.
    T comes from a scalar pre-pass; cnt joins back via the same
    term-sharded shuffle as :func:`tfidf_top_terms` (the unigram table
    IS the vocabulary — never broadcast, never on the driver). Rounded
    at 4 decimals so per-doc summation order can't flip the low bit."""
    ensure_portable()

    # pass 1: scalar total token count (streamed aggregate, text column
    # only; at 100 TB this is the cheap pass — one int64 per block)
    ds = read_table(sf_dir, "documents", columns=["text"])

    def wc(t: pa.Table) -> pa.Table:
        n = pc.sum(pc.list_value_length(pc.split_pattern(t["text"], pattern=" ")))
        return pa.table({"n": pa.array([n.as_py() or 0], pa.int64())})

    total = float(
        sum(pc.sum(b["n"]).as_py() for b in
            ds.map_batches(wc, batch_format="pyarrow").iter_batches(batch_format="pyarrow"))
    )

    def score(g: pd.DataFrame) -> pa.Table:
        cnt = g.groupby("term")["tf"].transform("sum").to_numpy().astype(np.float64)
        tf = g["tf"].to_numpy()
        part = tf * -np.log(cnt / total)
        dshard = g["doc_id"].to_numpy() % _DOC_SHARDS
        return pa.table(
            {
                "doc_id": pa.array(g["doc_id"].to_numpy(), pa.int64()),
                "part": pa.array(part, pa.float64()),
                "tf": pa.array(tf.astype(np.int64), pa.int64()),
                "dshard": pa.array(dshard.astype(np.int64), pa.int64()),
            }
        )

    part_schema = pa.schema(
        [("doc_id", pa.int64()), ("part", pa.float64()),
         ("tf", pa.int64()), ("dshard", pa.int64())]
    )

    def conform_part(t: pa.Table) -> pa.Table:
        if "part" not in t.column_names:
            return part_schema.empty_table()
        return t.select(part_schema.names)

    def reduce_doc(g: pd.DataFrame) -> pa.Table:
        agg = g.groupby("doc_id", sort=False).agg(
            s=("part", "sum"), n=("tf", "sum")
        )
        return pa.table(
            {
                "doc_id": pa.array(agg.index.to_numpy(), pa.int64()),
                "logppl": pa.array(
                    np.round(agg["s"].to_numpy() / agg["n"].to_numpy(), 4),
                    pa.float64(),
                ),
            }
        )

    def conform_out(t: pa.Table) -> pa.Table:
        if "logppl" not in t.column_names:
            return _PPL_SCHEMA.empty_table()
        return t.select(_PPL_SCHEMA.names)

    parts = (
        _with_term_shard(_tf_rows(sf_dir))
        .groupby("shard")
        .map_groups(score, batch_format="pandas")
        .map_batches(conform_part, batch_format="pyarrow")
    )
    return (
        parts.groupby("dshard")
        .map_groups(reduce_doc, batch_format="pandas")
        .map_batches(conform_out, batch_format="pyarrow")
    )


_CURATION_SCHEMA = pa.schema(
    [("source", pa.string()), ("n_docs", pa.int64()),
     ("total_words", pa.int64()), ("avg_top2", pa.float64())]
)


_gate_schema = pa.schema(
    [("doc_id", pa.int64()), ("source", pa.string()), ("n_words", pa.int64()),
     ("top2_raw", pa.float64()), ("prefix", pa.string()), ("shard", pa.int64())]
)


def corpus_curation(sf_dir: str, lang: str = "en", min_words: int = 20,
                    max_dup5: float = 0.2, prefix_len: int = 40):
    """Composed end-to-end curation pipeline as ONE oracle-checkable
    query — the LLM-training-data analogue of ``order_lifecycle``:

      read (pruned) → per-doc quality stats (n_words + Gopher
      repetition fractions, zero-shuffle map) → gate (lang, length,
      repetition) → exact dedup on the ``prefix_len``-char content key
      (keep min doc_id; map-side partial-min per batch bounds the
      shuffle to ≤1 row/key/block, ops/dedup.py A4 pattern) → per-source
      report (n_docs, total_words, avg_top2).

    Gate comparisons happen on the UNROUNDED double (same IEEE ops as
    the SQL oracle → bit-identical boundary behavior); only the
    reported average is rounded. Two shuffles total, both over slim
    metadata rows (text never leaves the first stage)."""
    ensure_portable()
    from .text import _repetition_frame

    ds = read_table(sf_dir, "documents",
                    columns=["doc_id", "text", "lang", "source"])

    def stats_gate(t: pa.Table) -> pa.Table:
        import polars as pl

        keep = pc.equal(t["lang"], lang)
        t = t.filter(keep)
        if t.num_rows == 0:
            return _gate_schema.empty_table()
        rep = _repetition_frame(
            t["doc_id"].to_numpy(zero_copy_only=False), t["text"].to_pylist()
        )
        meta = pl.DataFrame(
            {
                "doc_id": t["doc_id"].to_numpy(zero_copy_only=False),
                "source": t["source"].to_pylist(),
                "prefix": pc.utf8_slice_codeunits(t["text"], 0, prefix_len).to_pylist(),
            }
        )
        # join on doc_id — polars join output order is not guaranteed,
        # so never attach columns positionally across a join boundary
        out = rep.join(meta, on="doc_id", how="inner").filter(
            (pl.col("n_words") >= min_words) & (pl.col("dup5_raw") <= max_dup5)
        )
        # map-side partial: one candidate row per prefix per batch
        out = out.sort("doc_id").unique(subset=["prefix"], keep="first")
        shard = out["prefix"].hash(seed=0x5EED) % _DOC_SHARDS
        return pa.table(
            {
                "doc_id": pa.array(out["doc_id"].to_numpy(), pa.int64()),
                "source": pa.array(out["source"].to_list(), pa.string()),
                "n_words": pa.array(out["n_words"].to_numpy(), pa.int64()),
                "top2_raw": pa.array(out["top2_raw"].to_numpy(), pa.float64()),
                "prefix": pa.array(out["prefix"].to_list(), pa.string()),
                "shard": pa.array(shard.to_numpy().astype(np.int64), pa.int64()),
            }
        )

    def keep_min(g: pd.DataFrame) -> pa.Table:
        g = g.sort_values("doc_id", kind="mergesort").drop_duplicates(
            subset=["prefix"], keep="first"
        )
        agg = g.groupby("source", sort=False).agg(
            n_docs=("doc_id", "size"), total_words=("n_words", "sum"),
            top2_sum=("top2_raw", "sum"),
        )
        return pa.table(
            {
                "source": pa.array(agg.index.to_numpy(), pa.string()),
                "n_docs": pa.array(agg["n_docs"].to_numpy().astype(np.int64), pa.int64()),
                "total_words": pa.array(agg["total_words"].to_numpy().astype(np.int64), pa.int64()),
                "top2_sum": pa.array(agg["top2_sum"].to_numpy(), pa.float64()),
            }
        )

    part_schema = pa.schema(
        [("source", pa.string()), ("n_docs", pa.int64()),
         ("total_words", pa.int64()), ("top2_sum", pa.float64())]
    )

    def conform_part(t: pa.Table) -> pa.Table:
        if "top2_sum" not in t.column_names:
            return part_schema.empty_table()
        return t.select(part_schema.names)

    def final(g: pd.DataFrame) -> pa.Table:
        agg = g.groupby("source", sort=False).agg(
            n_docs=("n_docs", "sum"), total_words=("total_words", "sum"),
            top2_sum=("top2_sum", "sum"),
        )
        return pa.table(
            {
                "source": pa.array(agg.index.to_numpy(), pa.string()),
                "n_docs": pa.array(agg["n_docs"].to_numpy().astype(np.int64), pa.int64()),
                "total_words": pa.array(agg["total_words"].to_numpy().astype(np.int64), pa.int64()),
                "avg_top2": pa.array(
                    np.round(agg["top2_sum"].to_numpy() / agg["n_docs"].to_numpy(), 6),
                    pa.float64(),
                ),
            }
        )

    def conform_out(t: pa.Table) -> pa.Table:
        if "avg_top2" not in t.column_names:
            return _CURATION_SCHEMA.empty_table()
        return t.select(_CURATION_SCHEMA.names)

    deduped = (
        ds.map_batches(stats_gate, batch_format="pyarrow")
        .groupby("shard")
        .map_groups(keep_min, batch_format="pandas")
        .map_batches(conform_part, batch_format="pyarrow")
    )

    def route_source(t: pa.Table) -> pa.Table:
        import polars as pl

        h = pl.from_arrow(t["source"]).hash(seed=0x5EED) % 16
        return t.append_column("sshard", pa.array(h.to_numpy().astype(np.int64)))

    return (
        deduped.map_batches(route_source, batch_format="pyarrow")
        .groupby("sshard")
        .map_groups(final, batch_format="pandas")
        .map_batches(conform_out, batch_format="pyarrow")
    )


_CONTAM_SCHEMA = pa.schema([("doc_id", pa.int64()), ("n_overlap", pa.int64())])


def contamination_check(sf_dir: str, n: int = 8, eval_mod: int = 20):
    """Train/eval contamination: for every TRAIN document, count the
    distinct word ``n``-grams it shares with ANY document of the held-out
    eval set (here docs with ``doc_id % eval_mod == 0`` — a deterministic
    stand-in for a benchmark fingerprint table). Emits only contaminated
    docs (n_overlap ≥ 1) — the decontamination shortlist.

    Scale shape: distinct (n-gram, doc) rows shuffle once on a coarse
    n-gram hash shard; inside each shard group the eval/train match is a
    vectorized membership test, and the emission is one row per (train
    doc, shared n-gram) — linear in the true answer, not quadratic in
    bucket size (no pairing; contrast ops/dedup.py hot-bucket notes).
    The eval fingerprint set is never broadcast: it rides the same
    shuffle as the train side, keyed identically, so a benchmark suite
    of any size stays distributed."""
    ensure_portable()
    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])

    def ngram_rows(t: pa.Table) -> pa.Table:
        out = _ngram_frame(t, n).unique(subset=["doc_id", "ng"])
        shard = out["ng"].hash(seed=0x5EED) % _TERM_SHARDS
        return pa.table(
            {
                "doc_id": pa.array(out["doc_id"].to_numpy(), pa.int64()),
                "ng": pa.array(out["ng"].to_list(), pa.string()),
                "shard": pa.array(shard.to_numpy().astype(np.int64), pa.int64()),
            }
        )

    def match(g: pd.DataFrame) -> pa.Table:
        is_eval = (g["doc_id"].to_numpy() % eval_mod) == 0
        g = g.assign(is_eval=is_eval)
        has_eval = g.groupby("ng", sort=False)["is_eval"].transform("max")
        hits = g[~g["is_eval"] & has_eval.to_numpy()]
        # (ng, doc_id) rows are distinct → size == distinct shared grams;
        # each n-gram lives in exactly one shard, so per-shard partials
        # sum exactly
        part = hits.groupby("doc_id", sort=False).size()
        return pa.table(
            {
                "doc_id": pa.array(part.index.to_numpy(), pa.int64()),
                "cnt": pa.array(part.to_numpy().astype(np.int64), pa.int64()),
                "dshard": pa.array(
                    (part.index.to_numpy() % _DOC_SHARDS).astype(np.int64),
                    pa.int64(),
                ),
            }
        )

    cnt_schema = pa.schema(
        [("doc_id", pa.int64()), ("cnt", pa.int64()), ("dshard", pa.int64())]
    )

    def conform_cnt(t: pa.Table) -> pa.Table:
        if "cnt" not in t.column_names:
            return cnt_schema.empty_table()
        return t.select(cnt_schema.names)

    def reduce_doc(g: pd.DataFrame) -> pa.Table:
        agg = g.groupby("doc_id", sort=False)["cnt"].sum()
        return pa.table(
            {
                "doc_id": pa.array(agg.index.to_numpy(), pa.int64()),
                "n_overlap": pa.array(agg.to_numpy().astype(np.int64), pa.int64()),
            }
        )

    def conform_out(t: pa.Table) -> pa.Table:
        if "n_overlap" not in t.column_names:
            return _CONTAM_SCHEMA.empty_table()
        return t.select(_CONTAM_SCHEMA.names)

    # coarse doc-shard map_groups for the final reduce (house pattern:
    # a per-doc_id group would be ≤ _TERM_SHARDS tiny rows — pure sort
    # overhead — and native Aggregate emits schema-less empty bundles)
    return (
        ds.map_batches(ngram_rows, batch_format="pyarrow")
        .groupby("shard")
        .map_groups(match, batch_format="pandas")
        .map_batches(conform_cnt, batch_format="pyarrow")
        .groupby("dshard")
        .map_groups(reduce_doc, batch_format="pandas")
        .map_batches(conform_out, batch_format="pyarrow")
    )


def bpe_train(sf_dir: str, num_merges: int = 50, max_vocab: int = 65536):
    """Byte-pair-encoding merge training over the corpus (Sennrich et
    al. 2016 word-level form — the vocabulary-construction step a
    training pipeline runs before tokenizing):

    - stage 1 (DISTRIBUTED, the data-proportional part): exact word
      frequencies — per-block partial counts inside ``map_batches``,
      one grouped sum on the word key, then a distributed top-k
      truncation to the ``max_vocab`` most frequent words (ties broken
      by word ascending for determinism). A raw web-corpus vocabulary
      grows with corpus size (Heaps' law), so the truncation — the
      same head-of-distribution pruning real tokenizer trainers apply —
      is what actually BOUNDS the driver state; rare tail words
      contribute negligible pair mass to the merges.
    - stage 2 (driver, now genuinely vocab-bounded): the classic merge
      loop — count
      adjacent symbol pairs weighted by word frequency, merge the most
      frequent pair (ties broken lexicographically, so the learned
      merge sequence is fully deterministic), repeat ``num_merges``
      times. This is the same driver-side-model shape as kmeans
      centroids and PCA components: the corpus never touches the
      driver, the bounded model does.

    Returns a pa.Table (rank, left, right, pair_count) — the ordered
    merge rules. Iterative/greedy → no SQL oracle; pytest pins the
    first merges against a hand-computed reference and the
    monotone-compression property."""
    ensure_portable()
    from ray.data.aggregate import Sum

    ds = read_table(sf_dir, "documents", columns=["text"])

    def word_partials(t: pa.Table) -> pa.Table:
        import polars as pl

        words = (
            pl.from_arrow(t.select(["text"]))
            .select(pl.col("text").str.split(" ").alias("w"))
            .explode("w")
            .filter(pl.col("w").str.len_chars() > 0)
            .group_by("w")
            .agg(pl.len().cast(pl.Int64).alias("n"))
        )
        return pa.table({"word": pa.array(words["w"].to_list(), pa.string()),
                         "n": pa.array(words["n"].to_numpy(), pa.int64())})

    vocab = (
        ds.map_batches(word_partials, batch_format="pyarrow")
        .groupby("word")
        .aggregate(Sum("n", alias_name="freq"))
        .sort(["freq", "word"], descending=[True, False])
        .limit(max_vocab)
        .to_pandas()
    )

    # ---- driver-side merge loop over the bounded vocabulary ----
    words: list[tuple[tuple[str, ...], int]] = [
        (tuple(w) + ("</w>",), int(f)) for w, f in zip(vocab["word"], vocab["freq"])
    ]
    merges: list[tuple[str, str, int]] = []
    for _ in range(num_merges):
        pair_counts: dict[tuple[str, str], int] = {}
        for sym, f in words:
            for a, b in zip(sym, sym[1:]):
                pair_counts[(a, b)] = pair_counts.get((a, b), 0) + f
        if not pair_counts:
            break
        # most frequent pair; ties → lexicographically smallest pair
        best = min(pair_counts.items(), key=lambda kv: (-kv[1], kv[0]))
        (a, b), cnt = best
        if cnt < 2:
            break
        merged = a + b
        out: list[tuple[tuple[str, ...], int]] = []
        for sym, f in words:
            new: list[str] = []
            i = 0
            while i < len(sym):
                if i + 1 < len(sym) and sym[i] == a and sym[i + 1] == b:
                    new.append(merged)
                    i += 2
                else:
                    new.append(sym[i])
                    i += 1
            out.append((tuple(new), f))
        words = out
        merges.append((a, b, cnt))

    return pa.table(
        {
            "rank": pa.array(range(len(merges)), pa.int64()),
            "left": pa.array([m[0] for m in merges], pa.string()),
            "right": pa.array([m[1] for m in merges], pa.string()),
            "pair_count": pa.array([m[2] for m in merges], pa.int64()),
        }
    )


def _bpe_apply(word: str, ranks: dict) -> tuple:
    """Encode ONE word with a trained merge table: repeatedly merge the
    adjacent symbol pair with the LOWEST rank until no trained pair
    remains (the standard BPE apply order — it replays the training
    merges in training order, so encode(train corpus) reproduces the
    symbols the trainer ended with). Pure function of (word, ranks)."""
    sym = list(word) + ["</w>"]
    while len(sym) > 1:
        best_rank = None
        for a, b in zip(sym, sym[1:]):
            r = ranks.get((a, b))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank = r
                best = (a, b)
        if best_rank is None:
            break
        a, b = best
        out = []
        i = 0
        while i < len(sym):
            if i + 1 < len(sym) and sym[i] == a and sym[i + 1] == b:
                out.append(a + b)
                i += 2
            else:
                out.append(sym[i])
                i += 1
        sym = out
    return tuple(sym)


_BPE_ENC_SCHEMA = pa.schema(
    [("doc_id", pa.int64()), ("tokens", pa.list_(pa.int32())),
     ("n_tok", pa.int32()), ("source", pa.string())]
)


def bpe_encode(sf_dir: str, num_merges: int = 50, max_vocab: int = 65536,
               merges: pa.Table | None = None):
    """Distributed BPE tokenization — apply trained merges to the whole
    corpus, producing the engine's OWN lake payload shape
    ``(doc_id, tokens: list<int32>, n_tok, source)`` (BASELINE.json
    input_hint). This closes the training-data loop: ``bpe_train``
    learns the merge table, ``bpe_encode`` materializes the
    pre-tokenized sequence table the CDC engine ingests.

    Scale shape:
    - the model (merge ranks + vocabulary) is vocab-bounded driver
      state, shipped ONCE via ``ray.put`` and cached per worker
      process — never rebuilt per batch;
    - token ids are deterministic at ANY parallelism: base symbols are
      the corpus's sorted distinct characters (a bounded alphabet,
      reduced from per-block partial sets), then ``</w>``, then one id
      per merge in rank order — no dependence on block order;
    - the encode pass is a zero-shuffle ``map_batches`` over Arrow
      batches; per-worker word→ids memo exploits the zipf word
      distribution (a web corpus's unique-word count grows ~Heaps'
      law while token count grows linearly, so the cache hit rate
      approaches 1 at scale).

    Iterative/greedy (no SQL form) → rows-only for the driver; pytest
    pins equivalence with a single-machine reference encoder,
    the ``n_tok == len(tokens)`` invariant, parallelism-independence,
    and round-trip decode.
    """
    ensure_portable()
    import ray

    if merges is None:
        merges = bpe_train(sf_dir, num_merges=num_merges, max_vocab=max_vocab)
    ranks = {
        (l, r): int(k)
        for k, l, r in zip(merges["rank"].to_pylist(),
                           merges["left"].to_pylist(),
                           merges["right"].to_pylist())
    }

    ds = read_table(sf_dir, "documents", columns=["doc_id", "text", "source"])

    # bounded-alphabet pass: per-block distinct chars (tiny), driver union
    def block_chars(t: pa.Table) -> pa.Table:
        chars = set()
        for txt in t["text"].to_pylist():
            chars.update(txt)
        chars.discard(" ")
        return pa.table({"ch": pa.array(sorted(chars), pa.string())})

    alphabet = sorted(
        set(ds.map_batches(block_chars, batch_format="pyarrow")
              .to_pandas()["ch"])
    )
    vocab = {c: i for i, c in enumerate(alphabet)}
    vocab["</w>"] = len(vocab)
    for (l, r), k in sorted(ranks.items(), key=lambda kv: kv[1]):
        vocab[l + r] = len(alphabet) + 1 + k
    model_ref = ray.put((ranks, vocab))

    def encode(t: pa.Table) -> pa.Table:
        cache = worker_cache()
        entry = cache.get("bpe_encode")
        # ObjectRef object identity does not survive task pickling —
        # compare the ref id so the model is fetched once per worker
        # per model, and the word memo resets when the model changes
        if entry is None or entry[0] != model_ref.hex():
            rk, vc = ray.get(model_ref)
            entry = (model_ref.hex(), rk, vc, {})
            cache["bpe_encode"] = entry
        _, rk, vc, memo = entry
        toks_col, ntok_col = [], []
        for txt in t["text"].to_pylist():
            ids: list[int] = []
            for w in txt.split(" "):
                if not w:
                    continue
                got = memo.get(w)
                if got is None:
                    # unseen symbols (possible when encoding a corpus the
                    # vocab wasn't trained on) are dropped per-symbol
                    got = [vc[s] for s in _bpe_apply(w, rk) if s in vc]
                    if len(memo) < 1 << 20:  # bound per-worker heap
                        memo[w] = got
                ids.extend(got)
            toks_col.append(ids)
            ntok_col.append(len(ids))
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "tokens": pa.array(toks_col, pa.list_(pa.int32())),
                "n_tok": pa.array(ntok_col, pa.int32()),
                "source": t["source"],
            },
            schema=_BPE_ENC_SCHEMA,
        )

    return ds.map_batches(encode, batch_format="pyarrow")


def bpe_decode_ids(ids, vocab: dict) -> str:
    """Inverse of one document's encode (test helper): ids → symbols →
    words. Only exact under a vocabulary covering every symbol."""
    inv = {v: k for k, v in vocab.items()}
    words, cur = [], []
    for i in ids:
        s = inv[int(i)]
        if s.endswith("</w>"):
            cur.append(s[: -len("</w>")])
            words.append("".join(cur))
            cur = []
        else:
            cur.append(s)
    if cur:
        words.append("".join(cur))
    return " ".join(words)


_DUPSPAN_SCHEMA = pa.schema(
    [("doc_id", pa.int64()), ("n_grams", pa.int64()),
     ("dup_grams", pa.int64()), ("dup_frac", pa.float64())]
)


def dup_span_flags(sf_dir: str, n: int = 5, min_count: int = 2):
    """Duplicated-span exposure per document (the n-gram-granular form
    of Lee et al. 2022 "Deduplicating Training Data Makes Language
    Models Better" exact-substring dedup): for every document, how many
    of its word ``n``-gram positions carry an n-gram that occurs
    ``min_count``+ times in the WHOLE corpus — the per-doc signal a
    curation pass thresholds to drop boilerplate-heavy documents or to
    target span removal.

    Scale shape (the module's three-stage pattern): per-(doc, gram)
    occurrence counts emitted in ``map_batches`` (no shuffle — a doc is
    one row), ONE coarse gram-shard shuffle where each shard counts its
    grams' corpus totals vectorized and emits per-doc (total, dup)
    position partials, then the per-doc reduce on a coarse doc shard,
    unioned with a doc_id-only side that guarantees short docs
    (< n words) appear with zero counts. The text column is scanned
    exactly ONCE; the frequent-gram table is never broadcast and never
    on the driver."""
    ensure_portable()
    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])

    def gram_rows(t: pa.Table) -> pa.Table:
        import polars as pl

        out = (
            _ngram_frame(t, n)
            .group_by("doc_id", "ng")
            .agg(pl.len().cast(pl.Int64).alias("c"))
        )
        shard = out["ng"].hash(seed=0x5EED) % _TERM_SHARDS
        return pa.table(
            {
                "doc_id": pa.array(out["doc_id"].to_numpy(), pa.int64()),
                "ng": pa.array(out["ng"].to_list(), pa.string()),
                "c": pa.array(out["c"].to_numpy(), pa.int64()),
                "shard": pa.array(shard.to_numpy().astype(np.int64), pa.int64()),
            }
        )

    def ids_rows(t: pa.Table) -> pa.Table:
        # doc_id-only side: guarantees every document appears in the
        # output (docs with < n words emit no gram rows at all); the
        # text column is scanned exactly ONCE, in gram_rows — per-shard
        # position totals sum to the exact per-doc total because each
        # (doc, gram) row lives in exactly one shard
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        z = np.zeros(len(ids), np.int64)
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "total": pa.array(z, pa.int64()),
                "dup": pa.array(z, pa.int64()),
                "dshard": pa.array((ids % _DOC_SHARDS).astype(np.int64), pa.int64()),
            }
        )

    def frequent_positions(g: pd.DataFrame) -> pa.Table:
        tot = g.groupby("ng", sort=False)["c"].transform("sum")
        hits = g[tot.to_numpy() >= min_count]
        total_part = g.groupby("doc_id", sort=False)["c"].sum()
        dup_part = hits.groupby("doc_id", sort=False)["c"].sum()
        ids = total_part.index.to_numpy()
        dup = dup_part.reindex(total_part.index, fill_value=0).to_numpy()
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "total": pa.array(total_part.to_numpy().astype(np.int64), pa.int64()),
                "dup": pa.array(dup.astype(np.int64), pa.int64()),
                "dshard": pa.array((ids % _DOC_SHARDS).astype(np.int64), pa.int64()),
            }
        )

    side_schema = pa.schema(
        [("doc_id", pa.int64()), ("total", pa.int64()),
         ("dup", pa.int64()), ("dshard", pa.int64())]
    )

    def conform_side(t: pa.Table) -> pa.Table:
        if "dup" not in t.column_names or "ng" in t.column_names:
            return side_schema.empty_table()
        return t.select(side_schema.names)

    def reduce_doc(g: pd.DataFrame) -> pa.Table:
        agg = g.groupby("doc_id", sort=False).agg(
            total=("total", "sum"), dup=("dup", "sum")
        )
        total = agg["total"].to_numpy().astype(np.int64)
        dup = agg["dup"].to_numpy().astype(np.int64)
        frac = np.round(dup / np.maximum(total, 1), 6)
        return pa.table(
            {
                "doc_id": pa.array(agg.index.to_numpy(), pa.int64()),
                "n_grams": pa.array(total, pa.int64()),
                "dup_grams": pa.array(dup, pa.int64()),
                "dup_frac": pa.array(frac, pa.float64()),
            }
        )

    def conform_out(t: pa.Table) -> pa.Table:
        if "dup_frac" not in t.column_names:
            return _DUPSPAN_SCHEMA.empty_table()
        return t.select(_DUPSPAN_SCHEMA.names)

    dup_side = (
        ds.map_batches(gram_rows, batch_format="pyarrow")
        .groupby("shard")
        .map_groups(frequent_positions, batch_format="pandas")
        .map_batches(conform_side, batch_format="pyarrow")
    )
    ids_side = read_table(sf_dir, "documents", columns=["doc_id"]).map_batches(
        ids_rows, batch_format="pyarrow"
    )
    return (
        ids_side.union(dup_side)
        .groupby("dshard")
        .map_groups(reduce_doc, batch_format="pandas")
        .map_batches(conform_out, batch_format="pyarrow")
    )
