"""Checkpoint / resume (reference: src/FileIO.jl).

Versioned single-file checkpoints. As in the reference, only *source* state is
saved — configuration(s), RNG key, binner states, last_sweep, parameters, and
recorded configurations; all derived state (DQMC stacks, Green's functions) is
rebuilt deterministically on resume (reference invariant: FileIO.jl:140-156 +
DQMC.jl:412-414 rebuild the stack from conf).

Format: a pickled dict {"VERSION": 1, "type": ..., "state": nested numpy tree}.
The save protocol mirrors the reference's rename/overwrite+backup dance
(src/FileIO.jl:38-91).
"""

from __future__ import annotations

import os
import pickle
import tempfile
from typing import Optional

VERSION = 1


def save(filename: str, mc, overwrite: bool = False, rename: bool = True,
         backup: bool = True) -> str:
    """Save a simulation to `filename` (reference: save, src/FileIO.jl:38-91).

    rename=True appends _1, _2, ... if the file exists and overwrite=False.
    overwrite=True with backup=True moves the old file aside until the write
    succeeds.
    """
    if os.path.exists(filename) and not overwrite:
        if not rename:
            raise FileExistsError(filename)
        base, ext = os.path.splitext(filename)
        i = 1
        while os.path.exists(f"{base}_{i}{ext}"):
            i += 1
        filename = f"{base}_{i}{ext}"

    payload = {"VERSION": VERSION, "type": type(mc).__name__,
               "state": mc.state_dict()}

    backup_name = None
    if os.path.exists(filename) and overwrite and backup:
        backup_name = filename + ".backup"
        os.replace(filename, backup_name)
    try:
        dirn = os.path.dirname(os.path.abspath(filename))
        fd, tmp = tempfile.mkstemp(dir=dirn, suffix=".tmp")
        with os.fdopen(fd, "wb") as f:
            pickle.dump(payload, f, protocol=4)
        os.replace(tmp, filename)
        if backup_name:
            os.remove(backup_name)
    except BaseException:
        if backup_name and os.path.exists(backup_name):
            os.replace(backup_name, filename)
        raise
    return filename


def _reconstruct_model(model_info):
    from .. import models
    from ..lattices.lattice import Lattice, UnitCell
    import numpy as np

    cls = getattr(models, model_info["type"])
    params = dict(model_info["parameters"])
    lat = model_info.get("lattice")
    if lat is not None and lat.get("kind") == "arbitrary":
        from ..lattices.alps import ArbitraryLattice
        params["l"] = ArbitraryLattice.from_state(lat)
        params.pop("L", None)
        params.pop("dims", None)
        return cls(**params)
    if lat is not None:
        uc = UnitCell(
            name=lat["name"],
            primitive_vectors=np.asarray(lat["primitive_vectors"]),
            basis=np.asarray(lat["basis"]),
            bonds=tuple(tuple([b[0], b[1], tuple(b[2]), b[3]]) for b in lat["bonds"]),
        )
        params["l"] = Lattice(uc, tuple(lat["shape"]))
        params.pop("L", None)
        params.pop("dims", None)
    return cls(**params)


def load(filename: str):
    """Load a simulation from a checkpoint
    (reference: load, src/FileIO.jl:99-128)."""
    with open(filename, "rb") as f:
        payload = pickle.load(f)
    if payload.get("VERSION") != VERSION:
        raise ValueError(f"Unsupported checkpoint version {payload.get('VERSION')}")
    state = payload["state"]
    model = _reconstruct_model(state["model"])
    if payload["type"] == "MC":
        from ..mc.mc import MC
        mc = MC(model, n_chains=state["n_chains"],
                **{k: v for k, v in state["parameters"].items()})
    elif payload["type"] == "DQMC":
        import jax.numpy as jnp
        from ..dqmc.dqmc import DQMC
        # restore the numeric operating mode exactly (an f32 checkpoint must
        # resume f32 — reference saves the full tree, src/FileIO.jl:38-91)
        num = state.get("numerics", {})
        kwargs = {}
        if num:
            kwargs["dtype"] = jnp.dtype(num["dtype"])
            if num.get("update_dtype") is not None:
                kwargs["update_dtype"] = jnp.dtype(num["update_dtype"])
            kwargs["stab_method"] = num.get("stab_method", "qr")
            kwargs["use_pallas"] = bool(num.get("use_pallas", False))
            kwargs["delay"] = int(num.get("delay", 0))
            kwargs["checkerboard"] = bool(num.get("checkerboard", False))
            kwargs["g_refresh"] = bool(num.get("g_refresh", False))
        mc = DQMC(model, n_chains=state["n_chains"], **kwargs,
                  **{k: v for k, v in state["parameters"].items()})
    else:
        raise ValueError(f"Unknown simulation type {payload['type']}")
    mc.load_state(state)
    return mc


def resume(filename: str, **kwargs):
    """Load a checkpoint and continue running
    (reference: resume!, src/FileIO.jl:140-156). Returns (success, mc)."""
    mc = load(filename)
    ok = mc.run(**kwargs)
    return ok, mc
