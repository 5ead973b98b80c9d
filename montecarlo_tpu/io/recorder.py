"""Configuration recording (reference: src/configurations.jl).

ConfigRecorder stores rate-limited, bit-packed copies of the Monte Carlo
configuration for later `replay` (reference: ConfigRecorder :24-56, compression
hooks compress/decompress at src/models/HubbardModel/HubbardModel.jl:56-59 pack
the ±1 field into a BitArray). Discarder (:73-85) drops everything.

Configurations arrive as host numpy int8 arrays of ±1 and are packed to bits.
"""

from __future__ import annotations

from typing import List, Tuple

import numpy as np


class Discarder:
    """Throws away everything pushed into it (reference: src/configurations.jl:73-85)."""

    def __init__(self, rate: int = 10):
        self.rate = rate

    def push(self, sweep: int, conf) -> None:
        pass

    def __len__(self):
        return 0

    def __iter__(self):
        return iter(())

    def state_dict(self):
        return {"type": "Discarder", "rate": self.rate}

    @staticmethod
    def from_state(state):
        return Discarder(state.get("rate", 10))


class ConfigRecorder:
    """Rate-limited compressed configuration store
    (reference: src/configurations.jl:24-56)."""

    def __init__(self, rate: int = 10):
        self.rate = int(rate)
        self._shapes: List[Tuple[int, ...]] = []
        self._packed: List[np.ndarray] = []

    def push(self, sweep: int, conf) -> None:
        """Store conf (any int array of ±1) if sweep % rate == 0
        (reference: push! at src/configurations.jl:29-37)."""
        if sweep % self.rate != 0:
            return
        arr = np.asarray(conf)
        self._shapes.append(arr.shape)
        self._packed.append(np.packbits((arr > 0).reshape(-1)))

    def __len__(self):
        return len(self._packed)

    def __getitem__(self, i) -> np.ndarray:
        shape = self._shapes[i]
        n = int(np.prod(shape))
        bits = np.unpackbits(self._packed[i])[:n].reshape(shape)
        return (2 * bits.astype(np.int8) - 1)

    def __iter__(self):
        return (self[i] for i in range(len(self)))

    def state_dict(self):
        return {
            "type": "ConfigRecorder",
            "rate": self.rate,
            "shapes": self._shapes,
            "packed": self._packed,
        }

    @staticmethod
    def from_state(state):
        rec = ConfigRecorder(state["rate"])
        rec._shapes = [tuple(s) for s in state["shapes"]]
        rec._packed = [np.asarray(p, dtype=np.uint8) for p in state["packed"]]
        return rec
