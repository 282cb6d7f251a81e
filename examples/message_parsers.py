"""Message-parser walkthrough: the reference's parser stack on Ray Data.

What the reference does with 12 single-threaded Kafka consumer
containers — route each message through opcode-predicated parsers that
decode the BOC body into typed side tables — runs here as one registry
fan-out over a Dataset of (opcode, body_boc) rows: each registered
Transform is an actor-pool ``map_batches`` stage, predicates stay
vectorized on the typed opcode column, and only claimed rows pay the
binary decode.

Run:  python examples/message_parsers.py [sf_dir]
(Owns its Ray session like all CLI entry points.)
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import ray

ray.init(address="local", num_cpus=8, include_dashboard=False,
         ignore_reinit_error=True, logging_level="ERROR")
from ray.data import DataContext

DataContext.get_current().enable_progress_bars = False

import ton_etl_ray.transforms  # noqa: F401 — populates the registry
from ton_etl_ray.ops.messages import synth_message_dataset
from ton_etl_ray.registry import REGISTRY

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"

# 1. a message table: one BOC-encoded body per event (in production this
#    is the CDC messages stream; here it is synthesized from testdata)
messages = synth_message_dataset(sf_dir)

# 2. fan it through the three payload parsers, like the reference's
#    SUPPORTED_PARSERS env filter picking parsers per container
enabled = {"JettonTransferParse", "SnakeCommentDecode", "BatchMintParse"}
tables = REGISTRY.select(enabled).run({"messages": messages})

# 3. each output is a typed side table (a lazy Dataset — write_parquet
#    or aggregate without materializing)
transfers = tables["jetton_transfers"].to_pandas()
comments = tables["comments"].to_pandas()
mints = tables["nft_mints"].to_pandas()

print(f"transfers: {len(transfers)} rows, "
      f"total {transfers['amount_nano'].sum()} nanotons, "
      f"{transfers['fwd_comment'].notna().sum()} forward comments")
print(f"comments: {len(comments)} rows, first: {comments['comment'].iloc[0]!r}")
print(f"mints: {len(mints)} item rows from 1-to-many batch bodies "
      f"(max items/msg: {mints.groupby('event_id').size().max()})")

ray.shutdown()
