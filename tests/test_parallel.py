"""Chain-mesh parallelism tests on the virtual 8-device CPU mesh."""

import jax
import numpy as np
import pytest

from montecarlo_tpu import DQMC, MC, HubbardModelAttractive, IsingModel
from montecarlo_tpu.parallel import (
    chain_mesh, shard_simulation, cross_chain_mean,
)


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) >= 8, "conftest must provide 8 virtual devices"
    return chain_mesh(8)


def test_cross_chain_mean(mesh):
    import jax.numpy as jnp
    x = jnp.arange(16.0).reshape(16, 1)
    m = cross_chain_mean(x, mesh)
    assert np.allclose(np.asarray(m), 7.5)


def test_sharded_dqmc_matches_unsharded(mesh):
    """The sharded run must produce bit-identical results to the single-device
    run — chains are independent, so partitioning cannot change anything."""
    def make():
        model = HubbardModelAttractive(dims=2, L=2, U=2.0)
        return DQMC(model, beta=1.0, n_chains=16, seed=3, sweeps=10,
                    thermalization=0, measure_rate=2, print_rate=10 ** 9)

    plain = make()
    assert plain.run(verbose=False, chunk=5)

    sharded = make()
    shard_simulation(sharded, mesh)
    assert sharded.run(verbose=False, chunk=5)

    assert np.array_equal(np.asarray(plain.state["conf"]),
                          np.asarray(sharded.state["conf"]))
    o1 = plain.observables()["occ"]["occ"].mean
    o2 = sharded.observables()["occ"]["occ"].mean
    assert np.allclose(o1, o2)


def test_sharded_mc(mesh):
    mc = MC(IsingModel(dims=2, L=4), beta=0.4, n_chains=16, seed=1,
            sweeps=50, thermalization=10)
    shard_simulation(mc, mesh)
    assert mc.run(verbose=False)
    m = mc.observables()["Magn"]["m"].mean
    assert 0.0 < m < 1.0


def test_graft_entry_dryrun():
    import sys
    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as g
    fn, args = g.entry()
    out = jax.jit(fn)(*args)
    jax.block_until_ready(out)
    g.dryrun_multichip(8)
