from .mesh import (
    CHAIN_AXIS, chain_mesh, chain_sharding, shard_chain_state,
    shard_simulation, cross_chain_mean, pmean_tree,
)
