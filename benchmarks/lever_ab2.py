"""Follow-up A/B for the configs that printed nothing in lever_ab.py
(fused wrap, L=16 site-major): run each alone with full tracebacks."""
import sys

sys.path.insert(0, "/root/repo")

from benchmarks import lever_ab  # noqa: E402  (runs nothing on import)

if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    if which in ("all", "fuse"):
        lever_ab.bench("fuse_wrap", {"MC_TPU_FUSE_WRAP": "1"})
    if which in ("all", "l16"):
        lever_ab.bench("L=16 site-major 64ch", l=16, chains=64, sweeps=2)
