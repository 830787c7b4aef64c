"""Work scheduling across hosts/chips — the SLURM-array replacement.

The reference shards work via SLURM environment variables
(SLURM_ARRAY_TASK_ID sharding at scripts/render_templates.py:41-43,
extract_retrieval_features.py:32-34, dino_inference.py:52-54, and
bop_toolkit eval_calc_errors.py:232-239). Here sharding is explicit and
backend-agnostic: a WorkShard names this worker's slice of any indexable
work list, resolved from (in priority order) explicit arguments, the
FREEPOSE_* env, jax.process_index() under jax.distributed, or legacy
SLURM_ARRAY_TASK_ID for drop-in cluster compatibility.
"""
from __future__ import annotations

import dataclasses
import os

import jax


@dataclasses.dataclass(frozen=True)
class WorkShard:
    index: int
    count: int

    def slice(self, n_items: int, chunk: int | None = None):
        """Indices of this worker's items.

        chunk=None: strided round-robin over items (balanced).
        chunk=k: contiguous blocks of k items per worker index (the
        reference's '30 scenes per task' pattern, dino_inference.py:52-54).
        """
        if chunk is None:
            return list(range(self.index, n_items, self.count))
        start = self.index * chunk
        return list(range(start, min(start + chunk, n_items)))


def current_shard(index: int | None = None, count: int | None = None) -> WorkShard:
    if index is not None and count is not None:
        return WorkShard(index, count)
    env = os.environ
    if "FREEPOSE_SHARD_INDEX" in env:
        return WorkShard(int(env["FREEPOSE_SHARD_INDEX"]), int(env.get("FREEPOSE_SHARD_COUNT", "1")))
    if "SLURM_ARRAY_TASK_ID" in env:  # drop-in for the reference's cluster jobs
        return WorkShard(
            int(env["SLURM_ARRAY_TASK_ID"]),
            int(env.get("SLURM_ARRAY_TASK_COUNT", env.get("SLURM_ARRAY_TASK_MAX", "0")) or 1),
        )
    try:
        if jax.process_count() > 1:
            return WorkShard(jax.process_index(), jax.process_count())
    except RuntimeError:
        pass
    return WorkShard(0, 1)


def shard_items(items, shard: WorkShard | None = None, chunk: int | None = None):
    shard = shard or current_shard()
    return [items[i] for i in shard.slice(len(items), chunk)]
