"""End-to-end training-data curation pipeline over the documents table:

    read (pruned columns)
      → near-dup removal (LSH groups → keep one representative)
      → quality gate (the vectorized ops/text quality kernel scores
        each batch in-stage and its score IS the filter)
      → cross-document sequence packing of the survivors
                                                     ops/scrub.pack_sequences
      → hive-partitioned parquet export by source (resumable layout)

Every stage is the library's production operator; the near-dup keep-set
comes from the distributed LSH edge path. Run:

    python examples/training_corpus.py [sf_dir]
"""

import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyarrow as pa
import pyarrow.compute as pc
import ray

ray.init(address="local", num_cpus=8, include_dashboard=False, logging_level="ERROR")
from ray.data import DataContext

DataContext.get_current().enable_progress_bars = False

from ton_etl_ray.ops import dedup, scrub
from ton_etl_ray.ops._util import read_table
from ton_etl_ray.ops.text import _quality_frame

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
OUT = "/tmp/tonray_training_corpus"
shutil.rmtree(OUT, ignore_errors=True)

# --- 1. near-dup keep-set (distributed LSH edges + label propagation) -
# dedup_groups is a Ray Dataset now; the keep-set here is the example's
# broadcast gate (bounded at this scale — the fully-distributed filter
# is dedup.dedup_filter_corpus's semi-join)
groups_t = dedup.dedup_groups(SF, threshold=0.95).to_pandas()
keep_ids = pa.array(
    groups_t.loc[groups_t["doc_id"] == groups_t["group_id"], "doc_id"].to_numpy(),
    pa.int64(),
)
kref = ray.put(keep_ids)
n_docs = len(groups_t)
print(f"near-dup components: keeping {len(keep_ids)} of {n_docs} docs")

# --- 2. stream the corpus through quality + dedup gates ---------------
# The quality kernel runs INSIDE the gate stage (same batch, no second
# pass over the text), and its score is what actually gates each doc.
ds = read_table(SF, "documents", columns=["doc_id", "text", "source"])
Q_MIN = 0.40  # drop the low-quality tail (~30% of this synthetic corpus)


def gate(t: pa.Table) -> pa.Table:
    keepers = ray.get(kref)
    t = t.filter(pc.is_in(t["doc_id"], value_set=keepers))   # near-dup gate
    q = _quality_frame(t.select(["doc_id", "text"]))
    words = pc.list_value_length(pc.split_pattern(t["text"], pattern=" "))
    # quality gate: the production score plus a trivial-doc floor
    mask = pc.and_(pc.greater_equal(q["quality"], Q_MIN), pc.greater(words, 10))
    t = t.filter(mask)
    return t.append_column("n_words", words.filter(mask).cast(pa.int64())).append_column(
        "quality", q["quality"].filter(mask)
    )


survivors = ds.map_batches(gate, batch_format="pyarrow")

# --- 3. pack the survivors into fixed-length training sequences -------
# (the same production operator queries() exposes, run over the curated
# stream instead of the raw table)
sequences = scrub.pack_sequences(ds=survivors, words_per_seq=64, docs_per_shard=200)

# --- 4. resumable partitioned export ----------------------------------
sequences.write_parquet(OUT, partition_cols=["source"])
import glob

parts = sorted(os.path.basename(p) for p in glob.glob(os.path.join(OUT, "*")))

import pyarrow.parquet as pq

files = glob.glob(os.path.join(OUT, "**", "*.parquet"), recursive=True)
total = sum(pq.ParquetFile(f).metadata.num_rows for f in files)
words = sum(
    pq.read_table(f, columns=["n_words"])["n_words"].to_numpy().sum() for f in files
)
print(f"packed corpus: {total} sequences / {words} words across partitions {parts}")

ray.shutdown()
