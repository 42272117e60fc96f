"""Mesh-sharded EKF update: covariance rows partitioned over devices.

SURVEY.md §2.9 "window/model sharding": for large states (many SLAM
landmarks / long clone windows / joint multi-robot states) the dense
[D,D] covariance no longer fits one core's fast memory comfortably; the
update's heavy products P·Hᵀ and the symmetric downdate are row-parallel.
This module runs `core.ekf.ekf_update` under GSPMD with the covariance
sharded over a 1-D mesh axis — XLA inserts the all-gathers/reduces over
ICI; the math is bit-for-bit the same single-controller program.

Usage:
    mesh = parallel.mesh.make_mesh((8,), ("x",))
    state_sharded = shard_state(state, mesh)
    new_state = sharded_ekf_update(mesh)(state_sharded, H, res, r_diag)
"""

from __future__ import annotations

import functools

import jax
from jax.sharding import NamedSharding, PartitionSpec as P

from open_vins_tpu.core import ekf
from open_vins_tpu.core.layout import FilterConfig


import jax.numpy as jnp


def cov_sharding(mesh):
    return NamedSharding(mesh, P("x", None))


def _padded_dim(D, n_dev):
    return ((D + n_dev - 1) // n_dev) * n_dev


def pad_cov(cov, n_dev):
    """Zero-pad the covariance to a mesh-divisible dimension.  The padded
    rows/cols carry zero covariance and are never touched by H (H gets
    zero-padded columns), so the update is unchanged."""
    D = cov.shape[0]
    Dp = _padded_dim(D, n_dev)
    if Dp == D:
        return cov
    out = jnp.zeros((Dp, Dp), cov.dtype)
    return out.at[:D, :D].set(cov)


def shard_state(state, mesh):
    """Place the (padded) covariance row-sharded; small leaves replicated."""
    n_dev = mesh.devices.size
    repl = NamedSharding(mesh, P())
    out = jax.tree_util.tree_map(lambda a: jax.device_put(a, repl), state)
    cov_p = pad_cov(state.cov, n_dev)
    return out._replace(cov=jax.device_put(cov_p, cov_sharding(mesh)))


def sharded_ekf_update(mesh, cfg: FilterConfig):
    """jit-compiled update keeping the covariance row-sharded in and out.

    Accepts a state whose covariance is already padded (shard_state); H is
    column-padded internally.  Returns the state with the padded, sharded
    covariance (use `state.cov[:D, :D]` to read back the logical block).
    """
    n_dev = mesh.devices.size
    D = cfg.state_dim
    Dp = _padded_dim(D, n_dev)

    @jax.jit
    def update(state, H, res, r_diag):
        cov = jax.lax.with_sharding_constraint(state.cov, cov_sharding(mesh))
        m = H.shape[0]
        H_p = jnp.zeros((m, Dp), H.dtype).at[:, :D].set(H)
        # the SAME update math as core.ekf.ekf_update, on the padded system;
        # fuse_downdate=False keeps the downdate a plain matmul so GSPMD can
        # row-shard it (a pallas_call would pin the operand to one device)
        dx_p, new_cov = ekf.kalman_update_math(cov, H_p, res, r_diag,
                                               fuse_downdate=False)
        dx = dx_p[:D]
        new_cov = jax.lax.with_sharding_constraint(new_cov, cov_sharding(mesh))
        from open_vins_tpu.core.state import boxplus

        new_state = boxplus(state, cfg, dx)
        return new_state._replace(cov=new_cov)

    return update
