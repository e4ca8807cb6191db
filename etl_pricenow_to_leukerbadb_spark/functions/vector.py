"""Vector column expressions over ``array<float>`` embeddings.

Dot products and cosines are computed with ``zip_with`` +
``aggregate`` in *double* precision with left-to-right accumulation —
deterministic and engine-portable (matches an ordered SQL sum), unlike
float-accumulated library kernels. All JVM-side; no UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    prods = F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prods, F.lit(0.0), lambda acc, v: acc + v)


def norm_sq(a: Column) -> Column:
    return dot(a, a)


def cosine(a: Column, b: Column) -> Column:
    """cosine similarity, written exactly as ``dot / (sqrt(na) * sqrt(nb))``
    so an oracle SQL with the same shape produces bit-identical doubles
    for every non-degenerate vector. ``try_divide`` instead of ``/``:
    a zero-norm vector makes the divisor 0.0, and double division by
    zero follows IEEE semantics in every mode (0.0/0.0 = NaN — ANSI
    mode does NOT error on double division), so plain ``/`` would let
    NaN flow silently into downstream arithmetic, where e.g. the
    packed-BIGINT argmax's ``cast(long)`` throws under ANSI
    (similarity.py's consumers guard that cast too). try_divide yields
    NULL for exactly the zero-divisor row (cosine is mathematically
    undefined there, and NULL — unlike NaN — is handled uniformly by
    aggregates, comparisons, and casts) and is bit-identical to plain
    division everywhere else."""
    return F.try_divide(dot(a, b), F.sqrt(norm_sq(a)) * F.sqrt(norm_sq(b)))


def cosine_prenormed(a: Column, b: Column, a_norm: Column, b_norm: Column) -> Column:
    """cosine with the per-vector norms precomputed ONCE per row
    instead of once per candidate pair — 3x less array arithmetic on
    the pair-quadratic path. ``a_norm``/``b_norm`` must be
    ``sqrt(norm_sq(v))`` so the double ops (sqrt, then multiply, then
    divide) are bit-identical to ``cosine`` and to the SQL oracle.
    NULL for zero-norm vectors (same try_divide rationale as
    ``cosine``)."""
    return F.try_divide(dot(a, b), a_norm * b_norm)
