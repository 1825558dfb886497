"""Deterministic pseudo-random hyperplane components, dependency-free so
both the Spark operator (operators/similarity.py) and the DuckDB oracle
builder (oracles.py) derive the SAME planes — no RNG state, no pyspark
import, reproducible anywhere."""

from __future__ import annotations


def hyperplane_component(plane: int, dim: int) -> float:
    """Integer hash of (plane, dim) mapped to [-1, 1)."""
    h = (plane * 1_000_003 + dim * 7_919 + 12_345) & 0xFFFFFFFF
    h ^= h >> 13
    h = (h * 0x5BD1E995) & 0xFFFFFFFF
    h ^= h >> 15
    return h / 2**31 - 1.0


def hyperplane_fixed(plane: int, dim: int, scale: int = 1_000_000) -> int:
    """The same component in fixed point — exact-integer dot products make
    the sign (the LSH bit) bit-identical across engines regardless of
    summation order, where float dots can flip a near-zero sign in the
    last ulp."""
    return int(round(hyperplane_component(plane, dim) * scale))
