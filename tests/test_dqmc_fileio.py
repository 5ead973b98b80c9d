"""DQMC checkpoint/resume/replay round trip (reference test/FileIO.jl for the
DQMC flavor; stacks are derived state and must be rebuilt, FileIO.jl:140-156)."""

import numpy as np

from montecarlo_tpu import DQMC, HubbardModelAttractive, ConfigRecorder
from montecarlo_tpu.io.checkpoint import save, load, resume


def _fresh(**kw):
    model = HubbardModelAttractive(dims=2, L=2, U=2.0, mu=0.5)
    return DQMC(model, beta=1.0, n_chains=4, seed=17, sweeps=40,
                thermalization=0, measure_rate=2, print_rate=10 ** 9, **kw)


def test_dqmc_save_load_roundtrip(tmp_path):
    mc = _fresh()
    assert mc.run(verbose=False, chunk=10)
    fn = str(tmp_path / "dqmc.mctpu")
    save(fn, mc)
    mc2 = load(fn)
    assert np.array_equal(np.asarray(mc.state["conf"]), np.asarray(mc2.state["conf"]))
    assert mc2.last_sweep == mc.last_sweep
    assert mc2.parameters.beta == 1.0 and mc2.parameters.slices == 10
    o1 = mc.observables()["occ"]["occ"].mean
    o2 = mc2.observables()["occ"]["occ"].mean
    assert np.allclose(o1, o2)
    # rebuilt stack is consistent: greens from scratch match
    g1 = np.asarray(mc.greens())
    g2 = np.asarray(mc2.greens())
    assert np.allclose(g1, g2, atol=1e-10)


def test_dqmc_resume_matches_uninterrupted(tmp_path):
    full = _fresh()
    assert full.run(verbose=False, chunk=10)

    part = _fresh()
    part.run(sweeps=20, verbose=False, chunk=10)
    fn = str(tmp_path / "part.mctpu")
    save(fn, part)
    ok, part2 = resume(fn, sweeps=40, verbose=False, chunk=10)
    assert ok
    assert np.array_equal(np.asarray(full.state["conf"]),
                          np.asarray(part2.state["conf"]))
    assert np.array_equal(np.asarray(full.state["key"]),
                          np.asarray(part2.state["key"]))


def test_dqmc_replay(tmp_path):
    mc = _fresh(recorder=ConfigRecorder(rate=5))
    assert mc.run(verbose=False, chunk=10)
    assert len(mc.configs) == 8
    mc.replay()
    occ = mc.observables()["occ"]["occ"]
    assert occ.count == 8
    assert np.all(np.abs(occ.mean - 0.6) < 0.3)  # mu=0.5 -> above half filling

def test_dqmc_checkpoint_numerics_roundtrip(tmp_path):
    """An f32 checkpoint must resume f32 with the same stab method — the
    numeric operating mode is part of the saved tree (reference saves the
    complete tree, src/FileIO.jl:38-91)."""
    import jax.numpy as jnp
    model = HubbardModelAttractive(dims=2, L=2, U=2.0, mu=0.5)
    mc = DQMC(model, beta=1.0, n_chains=4, seed=3, sweeps=20,
              thermalization=0, measure_rate=2, print_rate=10 ** 9,
              dtype=jnp.float32, stab_method="qr_colscaled")
    mc.run(sweeps=10, verbose=False, chunk=5)
    fn = str(tmp_path / "f32.mctpu")
    save(fn, mc)
    mc2 = load(fn)
    assert mc2.ctx.dtype == jnp.dtype(jnp.float32)
    assert mc2.ctx.stab_method == "qr_colscaled"
    assert mc2.state["G"].dtype == jnp.float32
    # resumed f32 run is bit-identical to an uninterrupted f32 run
    # (reference gate: test/FileIO.jl:47-60)
    mc2.run(sweeps=20, verbose=False, chunk=5)
    full = DQMC(model, beta=1.0, n_chains=4, seed=3, sweeps=20,
                thermalization=0, measure_rate=2, print_rate=10 ** 9,
                dtype=jnp.float32, stab_method="qr_colscaled")
    full.run(verbose=False, chunk=5)
    assert np.array_equal(np.asarray(full.state["conf"]),
                          np.asarray(mc2.state["conf"]))
    assert np.array_equal(np.asarray(full.state["G"]),
                          np.asarray(mc2.state["G"]))


def test_dqmc_checkpoint_restores_th_states_and_analysis(tmp_path):
    from montecarlo_tpu.measurements import dqmc_measurements as dm
    model = HubbardModelAttractive(dims=2, L=2, U=2.0, mu=0.5)

    def build():
        mc = DQMC(model, beta=1.0, n_chains=4, seed=5, sweeps=10,
                  thermalization=10, measure_rate=2, print_rate=10 ** 9)
        mc.thermalization_measurements.add(
            "occ_th", dm.occupation(mc, model), mc.n_chains)
        return mc

    mc = build()
    assert mc.run(verbose=False, chunk=5)
    th_before = mc.observables("TH")["occ_th"]["occ"]
    assert th_before.count > 0
    fn = str(tmp_path / "th.mctpu")
    save(fn, mc)

    mc2 = build()
    mc2.load_state(__import__("pickle").load(open(fn, "rb"))["state"])
    th_after = mc2.observables("TH")["occ_th"]["occ"]
    assert th_after.count == th_before.count
    assert np.allclose(th_after.mean, th_before.mean)
    assert mc2.analysis.prop_local == mc.analysis.prop_local
    assert mc2.analysis.acc_local == mc.analysis.acc_local


def test_dqmc_orphan_measurement_state_warns(tmp_path):
    import warnings as _w
    mc = _fresh()
    mc.run(sweeps=4, verbose=False, chunk=4)
    fn = str(tmp_path / "orphan.mctpu")
    save(fn, mc)
    mc2 = _fresh()
    del mc2["greens"]
    with _w.catch_warnings(record=True) as rec:
        _w.simplefilter("always")
        mc2.load_state(__import__("pickle").load(open(fn, "rb"))["state"])
    assert any("greens" in str(r.message) for r in rec)
