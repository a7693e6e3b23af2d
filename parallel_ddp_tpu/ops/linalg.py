"""Unrolled small-matrix linear algebra (channel form).

`jnp.linalg.cholesky` / `cho_solve` on a (..., 7, 7) batch lower to loop-style
subgraphs and custom calls that dominate the backward pass's wall time on TPU
(the whole solve is kernel-launch-bound, see models/kuka/soa.py).  For the tiny
fixed dims of this workload (Huu is n_ctrl x n_ctrl <= 7x7) a fully unrolled
factor + solve is a pure elementwise dataflow that XLA fuses into a couple of
VPU kernels and that works unchanged inside Pallas.

This is the TPU analog of the reference's unrolled `invHuu` Gauss-Jordan /
adjugate inversions (bpHelpers.cuh:96-204) — in the square-root (Cholesky) form
its README wishlists (README.md:40), which also gives the positive-definiteness
test for free (any non-positive pivot argument).
"""

from __future__ import annotations

import jax.numpy as jnp


def chol_solve_unrolled(m, rhs, eps: float = 0.0):
    """Solve m @ X = rhs for symmetric positive-definite m, fully unrolled.

    m: (..., D, D); rhs: (..., D, R).  Returns (X (..., D, R), ok (...,) bool)
    where ok is the PD test (all Cholesky pivot arguments > eps).  On failure X
    is still finite (pivots clamped) — callers gate on `ok`, mirroring the
    reference's inversion-failure -> rho-retry path (bpHelpers.cuh:483-517)."""
    d = m.shape[-1]
    r = rhs.shape[-1]

    l_ch = [[None] * d for _ in range(d)]
    ok = None
    for j in range(d):
        acc = m[..., j, j]
        for k in range(j):
            acc = acc - l_ch[j][k] * l_ch[j][k]
        pos = acc > eps
        ok = pos if ok is None else jnp.logical_and(ok, pos)
        # failed pivots are replaced by 1 so X stays FINITE (a 1e-30 clamp
        # overflows downstream); callers gate on `ok`
        l_ch[j][j] = jnp.sqrt(jnp.where(pos, acc, 1.0))
        inv = 1.0 / l_ch[j][j]
        for i in range(j + 1, d):
            a2 = m[..., i, j]
            for k in range(j):
                a2 = a2 - l_ch[i][k] * l_ch[j][k]
            l_ch[i][j] = a2 * inv

    # triangular solves VECTORIZED over all R right-hand sides at once — a
    # python loop over columns would serialize R independent solves into one
    # ~R*d^2-deep dependency chain (measured as the dominant fusion of the
    # whole backward pass); this form is ~d^2 ops on (..., R)-wide data.
    z = [None] * d
    for i in range(d):
        acc = rhs[..., i, :]
        for k in range(i):
            acc = acc - l_ch[i][k][..., None] * z[k]
        z[i] = acc / l_ch[i][i][..., None]
    y = [None] * d
    for i in reversed(range(d)):
        acc = z[i]
        for k in range(i + 1, d):
            acc = acc - l_ch[k][i][..., None] * y[k]
        y[i] = acc / l_ch[i][i][..., None]
    x = jnp.stack(y, axis=-2)
    return x, ok
