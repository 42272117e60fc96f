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


def _symmetric_downdate_jnp(P, K, PHt):
    cov = P - K @ jnp.swapaxes(PHt, -1, -2)
    return 0.5 * (cov + jnp.swapaxes(cov, -1, -2))


@jax.custom_batching.custom_vmap
def _symmetric_downdate_tpu(P, K, PHt):
    return symmetric_downdate_pallas(P, K, PHt)


@_symmetric_downdate_tpu.def_vmap
def _symmetric_downdate_tpu_vmap(axis_size, in_batched, P, K, PHt):
    """Under vmap the Pallas call SERIALIZES over the batch (measured
    6.6 µs at B=1 → 52 µs/stream at B=8 on v5e), while the plain batched
    matmul form rides the MXU batch axis at near-zero marginal cost — so
    batched streams take the jnp path instead of the kernel."""
    def bc(x, b):
        return x if b else jnp.broadcast_to(x, (axis_size,) + x.shape)

    out = _symmetric_downdate_jnp(bc(P, in_batched[0]), bc(K, in_batched[1]),
                                  bc(PHt, in_batched[2]))
    return out, True


def symmetric_downdate(P, K, PHt):
    """sym(P − K·PHtᵀ) — the fused covariance store of every EKF update.

    Dispatch: single-stream TPU calls use the fused Pallas kernel (one HBM
    store, no materialized K·PHtᵀ); vmapped/ensemble calls and non-TPU
    platforms use the batched-matmul jnp form (identical algebra; the
    fallback IS the reference semantics, equivalence tested in interpret
    mode)."""
    if jax.default_backend() in ("tpu", "axon"):
        return _symmetric_downdate_tpu(P, K, PHt)
    return _symmetric_downdate_jnp(P, K, PHt)


# ---------------------------------------------------------------------------
# Blocked-Householder QR for measurement compression (UpdaterHelper.cpp:
# 456-487 role).  The tall [m, n] stacked system is split into row blocks;
# each block is QR-factored entirely in VMEM by one kernel invocation (the
# HBM-bound column-sequential tall QR becomes g independent in-register
# factorizations), then the stacked per-block R factors are combined by one
# small QR — the classic TSQR reduction, which is an exact orthogonal
# transform of the original system (R^T R = A^T A).
# ---------------------------------------------------------------------------


def _house_qr_block_kernel(A_ref, R_ref):
    """In-VMEM Householder QR of one [B, n] row block; writes R [n, n].

    Sequential over columns (fori_loop) but every step is a full-width VPU
    vector op on VMEM-resident data — no HBM traffic until the final store.
    Zero-padded rows/columns are exact no-ops (v = 0 ⇒ identity reflector).
    """
    A = A_ref[:].reshape(A_ref.shape[-2], A_ref.shape[-1])
    B, n = A.shape
    # everything stays 2-D: Mosaic's 1-D vector layouts (1×N replicated)
    # cannot be relayed out between iota-derived and reduction-derived
    # values on this backend — [B,1] column vectors avoid the issue
    ridx = jax.lax.broadcasted_iota(jnp.int32, (B, 1), 0)  # [B,1]
    cidx = jax.lax.broadcasted_iota(jnp.int32, (B, n), 1)

    def body(j, A):
        # one-hot column extraction — Mosaic has no dynamic_slice on TPU,
        # and the contraction is the same O(B·n) as the reflector apply
        col = jnp.sum(jnp.where(cidx == j, A, 0.0), axis=1, keepdims=True)
        x = jnp.where(ridx >= j, col, 0.0)  # [B,1]
        normx = jnp.sqrt(jnp.sum(x * x))
        alpha = jnp.sum(jnp.where(ridx == j, x, 0.0))
        sgn = jnp.where(alpha >= 0, 1.0, -1.0)
        beta = -sgn * normx
        v = x - jnp.where(ridx == j, beta, 0.0)  # [B,1]
        vnorm2 = jnp.sum(v * v)
        scale = jnp.where(vnorm2 > 1e-30, 2.0 / vnorm2, 0.0)
        # reflector apply as two matmuls: w = vᵀA [1,n], outer = v w [B,n]
        w = jnp.dot(v.T, A, preferred_element_type=jnp.float32)
        outer = jnp.dot(v, w, preferred_element_type=jnp.float32)
        return A - scale * outer

    A = jax.lax.fori_loop(0, n, body, A)
    # keep the leading n rows; mask the strictly-lower numerical residue
    cidx = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
    rown = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
    R_ref[:] = jnp.where(cidx >= rown, A[:n, :], 0.0).reshape(R_ref.shape)


def householder_qr_blocks_pallas(A_blocks, interpret=False):
    """Batched in-VMEM Householder QR: [g, B, n] -> R factors [g, n, n].

    B and n must already be padded to TPU tile multiples by the caller.
    """
    g, B, n = A_blocks.shape
    return pl.pallas_call(
        _house_qr_block_kernel,
        out_shape=jax.ShapeDtypeStruct((g, n, n), A_blocks.dtype),
        grid=(g,),
        in_specs=[pl.BlockSpec((1, B, n), lambda i: (i, 0, 0))],
        out_specs=pl.BlockSpec((1, n, n), lambda i: (i, 0, 0)),
        interpret=interpret,
    )(A_blocks)


# NOTE (measured dead end, do not redo): a fused in-VMEM Cholesky+solve
# kernel for the update's S-solve (k≈232, D-wide RHS) was built and timed
# against XLA's cho_factor+cho_solve on the v5e: ~701 us vs ~112 us marginal
# per solve.  An unblocked column-at-a-time factorization needs one-hot
# row/column extraction under Mosaic (no dynamic slices), which makes every
# one of the ~3k sequential steps O(k²) VPU work — the masking traffic, not
# the arithmetic, dominates.  XLA's blocked panel custom calls are already
# near the latency floor for these shapes; the profitable Pallas targets in
# this codebase are the bandwidth-bound fusions (symmetric_downdate) and the
# embarrassingly-block-parallel factorizations (TSQR row blocks), not
# sequential dense factorization.
