"""Account-state parser walkthrough: the reference's
latest_account_states stack (P21-P29) on Ray Data.

Every family shares one cluster shape — vectorized code-hash whitelist
→ rank-1 LWW reduce per account on lt (map-side partial argmax + ONE
coarse-bucket shuffle) → decode WINNER state cells only — and differs
only in its decoder: AMM reserves → price, a nominator hashmap fanning
out 1→many, TEP-64 metadata, fixprice/auction sale contracts (with the
jetton-price fallback), and the union view the reference serves from
`get_nft_sale`.

Run:  python examples/account_state_parsers.py [sf_dir]
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

from ton_etl_ray.ops import prices, sales

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"

# P21-P23: latest price per AMM pool from decoded winner reserves
px = prices.core_prices(sf_dir).to_pandas()
print(f"core_prices: {len(px)} pools, "
      f"median price {int(px['price_nano'].median())} nano")

# P25: the winner state's nominator hashmap fans out 1→many
noms = prices.staking_nominators(sf_dir).to_pandas()
print(f"staking_nominators: {len(noms)} nominator rows over "
      f"{noms['account'].nunique()} pools "
      f"(max fan-out {noms.groupby('account').size().max()})")

# P26: TEP-64 on-chain metadata decoded from winner cells
items = prices.nft_item_states(sf_dir).to_pandas()
print(f"nft_item_states: {len(items)} items, "
      f"sample name {items['name'].iloc[0]!r}")

# P29 + J4/C10: fixprice sales (jetton-price fallback) ∪ auctions
u = sales.nft_sale_union(sf_dir).to_pandas()
by_type = u.groupby("sale_type").size().to_dict()
jet = (u["asset"] != "TON").sum()
print(f"nft_sale_union: {by_type}, {jet} jetton-priced listings")

ray.shutdown()
