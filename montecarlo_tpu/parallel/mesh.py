"""Multi-chip chain parallelism.

The reference has NO distributed backend (SURVEY §2 last row: parallelism =
independent Julia processes run by hand). Here it is first-class and
TPU-native: the unit of parallelism is the independent Markov chain, so

* intra-chip: the leading ``chains`` axis is batched with ``vmap`` — hundreds
  of chains per chip keep the MXU busy on small per-lattice matrices,
* intra-pod (ICI): the chains axis is sharded over a 1-D
  ``jax.sharding.Mesh``; since chains never communicate during sweeps, the
  jitted sweep blocks compile to pure per-device compute with zero collectives,
* cross-chip reductions (measurement statistics) ride ICI via ``psum`` inside
  ``shard_map`` — the only communication in the entire algorithm,
* multi-host (DCN): the same program under ``jax.distributed`` initialization;
  checkpoints store the host-local shard.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

try:  # JAX >= 0.7 moved shard_map out of experimental
    from jax import shard_map as _sm
    shard_map = _sm.shard_map if hasattr(_sm, "shard_map") else _sm
except (ImportError, AttributeError):  # pragma: no cover
    from jax.experimental.shard_map import shard_map

CHAIN_AXIS = "chains"


def chain_mesh(n_devices: int = None, devices=None) -> Mesh:
    """A 1-D device mesh over the chain axis."""
    if devices is None:
        devices = jax.devices()
        if n_devices is not None:
            devices = devices[:n_devices]
    return Mesh(np.array(devices), (CHAIN_AXIS,))


def chain_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (chains) axis, replicate everything else."""
    return NamedSharding(mesh, P(CHAIN_AXIS))


def shard_chain_state(state, mesh: Mesh):
    """device_put every leaf of a chain-batched pytree with its leading axis
    sharded over the mesh."""
    sh = chain_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), state)


def shard_simulation(mc, mesh: Mesh):
    """Shard a simulation's chain-batched state (MC or DQMC) and its
    measurement binner states over the mesh. The already-jitted device blocks
    then execute SPMD with no code changes (XLA partitions the batched
    computation along the sharded axis)."""
    if mc.n_chains % mesh.size != 0:
        raise ValueError(
            f"n_chains={mc.n_chains} must be divisible by mesh size {mesh.size}")
    if hasattr(mc, "state"):
        mc.state = shard_chain_state(mc.state, mesh)
    else:  # classical MC keeps conf/key directly
        sh = chain_sharding(mesh)
        mc.conf = jax.device_put(mc.conf, sh)
    for registry in (mc.measurements, mc.thermalization_measurements):
        registry.states = shard_chain_state(registry.states, mesh)
    return mc


def cross_chain_mean(values, mesh: Mesh):
    """Mean over the (sharded) chain axis, reduced across devices with a psum
    riding ICI — the cross-chip binner reduction of SURVEY §5."""

    @partial(jax.jit)
    @partial(shard_map, mesh=mesh, in_specs=P(CHAIN_AXIS),
             out_specs=P())
    def reduce(x):
        local = jnp.sum(x, axis=0, keepdims=True)
        total = jax.lax.psum(local, CHAIN_AXIS)
        return total

    n = values.shape[0]
    return reduce(values)[0] / n


def pmean_tree(tree, mesh: Mesh):
    """Cross-chip mean of every leaf's chain axis."""
    return jax.tree_util.tree_map(lambda x: cross_chain_mean(x, mesh), tree)
