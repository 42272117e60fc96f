"""Pallas TPU kernels for the dense EKF hot ops.

The covariance downdate P' = sym(P − K·(PHᵀ)ᵀ) is the single largest dense
write of the update (O(D²·m) flops + a full [D,D] store).  XLA emits the
matmul + transpose + add as separate HBM passes; this kernel fuses them:
each (i,j) output tile does both MXU products K_i·PHt_jᵀ and PHt_i·K_jᵀ
and writes the symmetrized result once — one HBM store for the whole
update, no materialized K·PHtᵀ intermediate.

Falls back to plain jnp off-TPU (the fallback IS the reference semantics;
equivalence is tested in interpret mode).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

try:  # pltpu is importable everywhere; kernels only *run* on TPU
    from jax.experimental.pallas import tpu as pltpu
except Exception:  # pragma: no cover
    pltpu = None

TILE = 128


def _round_up(x, m):
    return ((x + m - 1) // m) * m


def _downdate_kernel(P_ij, P_ji, K_i, PHt_j, K_j, PHt_i, out):
    """out = 0.5 (P_ij + P_jiᵀ) − 0.5 (K_i PHt_jᵀ + (K_j PHt_iᵀ)ᵀ)."""
    a = jnp.dot(K_i[:], PHt_j[:].T, preferred_element_type=jnp.float32)
    b = jnp.dot(K_j[:], PHt_i[:].T, preferred_element_type=jnp.float32)
    out[:] = 0.5 * (P_ij[:] + P_ji[:].T) - 0.5 * (a + b.T)


def symmetric_downdate_pallas(P, K, PHt, interpret=False):
    """sym(P − K PHtᵀ) with tiled fusion.  P [D,D], K/PHt [D,m]."""
    D, m = K.shape
    Dp = _round_up(D, TILE)
    mp = _round_up(m, TILE)
    Pp = jnp.zeros((Dp, Dp), P.dtype).at[:D, :D].set(P)
    Kp = jnp.zeros((Dp, mp), K.dtype).at[:D, :m].set(K)
    PHtp = jnp.zeros((Dp, mp), PHt.dtype).at[:D, :m].set(PHt)

    grid = (Dp // TILE, Dp // TILE)
    out = pl.pallas_call(
        _downdate_kernel,
        out_shape=jax.ShapeDtypeStruct((Dp, Dp), P.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((TILE, TILE), lambda i, j: (i, j)),  # P_ij
            pl.BlockSpec((TILE, TILE), lambda i, j: (j, i)),  # P_ji
            pl.BlockSpec((TILE, mp), lambda i, j: (i, 0)),  # K_i
            pl.BlockSpec((TILE, mp), lambda i, j: (j, 0)),  # PHt_j
            pl.BlockSpec((TILE, mp), lambda i, j: (j, 0)),  # K_j
            pl.BlockSpec((TILE, mp), lambda i, j: (i, 0)),  # PHt_i
        ],
        out_specs=pl.BlockSpec((TILE, TILE), lambda i, j: (i, j)),
        interpret=interpret,
    )(Pp, Pp, Kp, PHtp, Kp, PHtp)
    return out[:D, :D]


def symmetric_downdate(P, K, PHt):
    """Dispatch: Pallas kernel on TPU, jnp fallback elsewhere."""
    if jax.default_backend() in ("tpu", "axon"):
        return symmetric_downdate_pallas(P, K, PHt)
    cov = P - K @ PHt.T
    return 0.5 * (cov + cov.T)
