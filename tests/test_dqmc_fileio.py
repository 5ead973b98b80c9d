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
