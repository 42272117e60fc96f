"""Gather-free dynamic indexing helpers.

The experimental axon TPU backend miscompiles dynamic gathers of small
arrays inside large fused programs (observed: `calib_ext_q[cam]` with a
traced index on a [1,4] array returned the identity quaternion rolled by
one element — see round-1 debugging).  `take1` replaces such gathers with a
one-hot contraction (select + reduce), which lowers without gather ops and
is exact.  Cost is O(N) per lookup — only use for small leading dims
(clone slots, camera indices, landmark slots), not for big tables.
"""

from __future__ import annotations

import jax.numpy as jnp


def take1(arr, idx):
    """arr[idx] along axis 0 via one-hot contraction. idx: scalar int."""
    n = arr.shape[0]
    onehot = (jnp.arange(n) == idx)
    shape = (n,) + (1,) * (arr.ndim - 1)
    return jnp.sum(jnp.where(onehot.reshape(shape), arr, 0), axis=0)
