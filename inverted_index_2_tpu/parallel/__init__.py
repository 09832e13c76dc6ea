"""Multi-chip sharding: shard-axis partitioning over a jax.sharding.Mesh.

`mesh` holds the snapshot partitioner and the raw shard_map query factories;
`mesh_engine.MeshQueryEngine` wraps them with single-chip-parity serving
(tombstone filters, delta refresh, ladder re-serves, warmup).
"""

from .mesh_engine import MeshQueryEngine

__all__ = ["MeshQueryEngine"]
