"""Fleet-scale execution: vmap within chip, shard_map across the mesh."""
