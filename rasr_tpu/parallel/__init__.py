"""Parallelism: device mesh, sharding rules, collectives
(the TPU-native replacement for corpus-partition scale-out, SURVEY.md §2.20)."""

from .sharding import (LOGICAL_AXIS_RULES, batch_sharding, logical_to_mesh_spec,
                       make_mesh, param_shardings, replicated, shard_params)

__all__ = ["LOGICAL_AXIS_RULES", "batch_sharding", "logical_to_mesh_spec",
           "make_mesh", "param_shardings", "replicated", "shard_params"]
