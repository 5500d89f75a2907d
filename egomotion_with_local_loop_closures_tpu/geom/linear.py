"""Tiny dense linear solves, unrolled for TPU.

``jnp.linalg.solve`` lowers to a pivoted LU factorization whose serial
row-by-row structure costs ~1 ms per call on TPU even for a 6x6 system —
and the Gauss-Newton tracker solves one 6x6 normal-equation system per
iteration (32 iterations per frame), so the generic path dominated the
whole tracking time.  Here the Cholesky factorization and the triangular
substitutions are fully unrolled at trace time into ~150 scalar ops that
XLA fuses into a single kernel (sub-microsecond).

The GN normal matrix is symmetric positive definite whenever at least 6
well-conditioned pixels contribute; for singular/indefinite input the
unrolled Cholesky produces NaN/Inf, which callers detect exactly like the
reference detects OpenCV's ``Mat::inv()`` zero-matrix fallback
(``src/PixelWisePyramid.cpp:451``) — a rejected (zeroed) update.
"""

from __future__ import annotations

import jax.numpy as jnp


def solve_spd(A: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Solve A x = b for small symmetric positive-definite A (n x n, n
    static and small — the 6x6 GN system or the 7x7 Sim(3) blocks).

    Unrolled Cholesky + forward/back substitution; supports arbitrary
    leading batch dimensions on both arguments.  Returns NaN where A is
    not positive definite (callers gate on finiteness).
    """
    n = A.shape[-1]
    # Cholesky: A = L L^T, unrolled (scalars are (...,) slices)
    L = [[None] * n for _ in range(n)]
    for i in range(n):
        for j in range(i + 1):
            s = A[..., i, j]
            for k in range(j):
                s = s - L[i][k] * L[j][k]
            if i == j:
                L[i][j] = jnp.sqrt(s)
            else:
                L[i][j] = s / L[j][j]
    # forward substitution: L y = b
    y = [None] * n
    for i in range(n):
        s = b[..., i]
        for k in range(i):
            s = s - L[i][k] * y[k]
        y[i] = s / L[i][i]
    # back substitution: L^T x = y
    x = [None] * n
    for i in range(n - 1, -1, -1):
        s = y[i]
        for k in range(i + 1, n):
            s = s - L[k][i] * x[k]
        x[i] = s / L[i][i]
    return jnp.stack(x, axis=-1)
