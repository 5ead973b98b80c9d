"""Numeric diff helpers (reference: src/helpers.jl:8-69)."""

import numpy as np


def absdiff(x, y):
    """Maximum elementwise absolute difference |x - y|."""
    return float(np.max(np.abs(np.asarray(x) - np.asarray(y))))


def reldiff(x, y):
    """Maximum elementwise relative difference 2|x-y| / (|x|+|y|)."""
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    denom = np.abs(x) + np.abs(y)
    out = np.where(denom == 0.0, 0.0, 2.0 * np.abs(x - y) / np.where(denom == 0, 1.0, denom))
    return float(np.max(out))


def effreldiff(x, y, atol=1e-14):
    """Relative difference ignoring entries that agree within `atol`
    (reference: src/helpers.jl:34-48 sets the relative error of effectively
    equal entries to zero)."""
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    denom = np.abs(x) + np.abs(y)
    rel = np.where(denom == 0.0, 0.0, 2.0 * np.abs(x - y) / np.where(denom == 0, 1.0, denom))
    rel = np.where(np.abs(x - y) < atol, 0.0, rel)
    return float(np.max(rel))


def compare(x, y, atol=1e-14, rtol=1e-6):
    """True if x and y agree elementwise within atol or rtol
    (reference: src/helpers.jl:58-69)."""
    x = np.asarray(x)
    y = np.asarray(y)
    return bool(np.all((np.abs(x - y) < atol) | (_rel(x, y) < rtol)))


def _rel(x, y):
    denom = np.abs(x) + np.abs(y)
    return np.where(denom == 0.0, 0.0, 2.0 * np.abs(x - y) / np.where(denom == 0, 1.0, denom))
