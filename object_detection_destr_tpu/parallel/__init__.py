"""Device mesh + sharding helpers (the reference has no distributed code at
all — SURVEY.md §2.2; this subsystem exists because the BASELINE.json north
star requires data parallelism over ICI on a v5e slice)."""

from .mesh import (
    batch_sharding,
    make_mesh,
    replicated_sharding,
    shard_batch,
)

__all__ = ["make_mesh", "batch_sharding", "replicated_sharding", "shard_batch"]
