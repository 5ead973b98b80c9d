"""Timing / tracing instrumentation.

TPU-native equivalent of the reference's `@bm` macro + TimerOutputs
(src/helpers.jl:160-236): a process-wide hierarchical wall-clock timer registry
plus `jax.profiler.TraceAnnotation` scopes so sections show up in XLA/TensorBoard
traces. Zero overhead when disabled (`disable_benchmarks`), matching
src/helpers.jl:210.

Usage::

    from montecarlo_tpu import timer, enable_benchmarks, print_timer

    enable_benchmarks()
    with timer("propagate"):
        ...
    print_timer()
"""

from __future__ import annotations

import time
from contextlib import contextmanager
from dataclasses import dataclass, field
from typing import Dict, Optional

try:  # profiler annotation is optional (absent on some backends)
    from jax.profiler import TraceAnnotation as _TraceAnnotation
except Exception:  # pragma: no cover
    _TraceAnnotation = None

_ENABLED = False


@dataclass
class _Node:
    name: str
    total: float = 0.0
    count: int = 0
    children: Dict[str, "_Node"] = field(default_factory=dict)


_ROOT = _Node("root")
_STACK = [_ROOT]


def enable_benchmarks():
    """Enable the timer registry (reference: enable_benchmarks, src/helpers.jl:224)."""
    global _ENABLED
    _ENABLED = True


def disable_benchmarks():
    """Disable the timer registry (reference: disable_benchmarks, src/helpers.jl:236)."""
    global _ENABLED
    _ENABLED = False


def benchmarks_enabled() -> bool:
    return _ENABLED


def reset_timer():
    global _ROOT, _STACK
    _ROOT = _Node("root")
    _STACK = [_ROOT]


@contextmanager
def timer(name: str):
    """Time a named section (reference: the `@bm` function wrapper,
    src/helpers.jl:160-208). Nested sections build a tree. Also emits a
    jax.profiler.TraceAnnotation so the section is visible in device traces."""
    if not _ENABLED:
        yield
        return
    parent = _STACK[-1]
    node = parent.children.get(name)
    if node is None:
        node = _Node(name)
        parent.children[name] = node
    _STACK.append(node)
    ann = _TraceAnnotation(name) if _TraceAnnotation is not None else None
    if ann is not None:
        ann.__enter__()
    t0 = time.perf_counter()
    try:
        yield
    finally:
        dt = time.perf_counter() - t0
        if ann is not None:
            ann.__exit__(None, None, None)
        node.total += dt
        node.count += 1
        _STACK.pop()


def timer_data() -> dict:
    """Return the timer tree as nested dicts {name: (total_s, count, children)}."""

    def rec(node: _Node):
        return {
            k: {"total_s": v.total, "count": v.count, "children": rec(v)}
            for k, v in node.children.items()
        }

    return rec(_ROOT)


def print_timer(file=None):
    """Pretty-print the timer tree (reference: TimerOutputs.print_timer)."""
    import sys

    file = file or sys.stdout

    def rec(node: _Node, depth: int):
        for name, child in sorted(node.children.items(), key=lambda kv: -kv[1].total):
            print(
                f"{'  ' * depth}{name:<30s} {child.total * 1e3:12.3f} ms  "
                f"x{child.count}", file=file,
            )
            rec(child, depth + 1)

    rec(_ROOT, 0)
