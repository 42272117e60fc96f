"""Device-side feature track table — the FeatureDatabase re-designed as
fixed-shape arrays.

Capability parity with ov_core::FeatureDatabase + Feature
(FeatureDatabase.h:54-167, Feature.h:40-140): per-feature measurement
history keyed by (clone slot, camera), id-stable ingestion of new frames,
and the time-indexed triage queries that drive update scheduling
(features_not_containing_newer = lost tracks, features_containing(marg) =
full-window tracks, cleanup after updates).

TPU-first redesign: the mutex-guarded unordered_map becomes a [T]-row table
with an id column and a [T, C, N] observation mask indexed by *clone ring
slot* — marginalizing a clone clears one mask column; "lost" and
"full-window" queries are mask reductions; id matching is one [T, P]
equality matmul-shaped op per camera.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from open_vins_tpu.core.layout import FilterConfig


class FeatureTable(NamedTuple):
    ids: jax.Array  # [T] int32, -1 = free row
    uv: jax.Array  # [T, C, N, 2] raw pixel obs by clone slot / camera
    uvn: jax.Array  # [T, C, N, 2] normalized obs
    mask: jax.Array  # [T, C, N] obs validity
    seen: jax.Array  # [T] bool — observed in the current frame (transient)


def init_table(cfg: FilterConfig, max_tracks: int) -> FeatureTable:
    C, N = cfg.max_clones, cfg.num_cams
    return FeatureTable(
        ids=jnp.full((max_tracks,), -1, dtype=jnp.int32),
        uv=jnp.zeros((max_tracks, C, N, 2), dtype=jnp.float32),
        uvn=jnp.zeros((max_tracks, C, N, 2), dtype=jnp.float32),
        mask=jnp.zeros((max_tracks, C, N), dtype=bool),
        seen=jnp.zeros((max_tracks,), dtype=bool),
    )


def ingest_frame(
    table: FeatureTable,
    cfg: FilterConfig,
    head_slot,
    ids,  # [N, P] int32 per-camera feature ids (-1 invalid)
    uv,  # [N, P, 2]
    uvn,  # [N, P, 2]
    meas_mask,  # [N, P]
) -> FeatureTable:
    """Write one frame of measurements into clone column `head_slot`.

    Equivalent to TrackBase::feed_new_camera → FeatureDatabase::update_feature
    (TrackBase.h:97, FeatureDatabase.h:100-133): existing ids append an
    observation, unseen ids allocate a free row.  Cameras are ingested
    sequentially (static python loop over num_cams) so a stereo feature seen
    by both eyes allocates exactly one row.

    TPU note: everything is written through ONE-HOT CONTRACTIONS + full-
    array selects — no scatters, no dynamic-update-slices.  The previous
    `.at[row, head_slot, cam].set(...)` scatters and the per-frame mask DUS
    compiled into layout-hostile ops that dominated the ensemble profile
    (a pred[B,T,C,1] dynamic-update-slice alone cost 283 µs/frame at B=8 —
    7.7% of the whole device program); the one-hot form is a [T,P] matmul
    plus elementwise selects, which XLA fuses and vmaps at ~zero marginal
    cost.  Per-frame ids are assumed unique per camera (the trackers and
    the simulator guarantee it); duplicate ids would average instead of
    last-write-win.
    """
    T = table.ids.shape[0]
    C = table.uv.shape[1]
    slot_onehot = jnp.arange(C, dtype=jnp.int32) == head_slot  # [C]
    seen = jnp.zeros((T,), dtype=bool)
    new_ids, new_uv, new_uvn, new_mask = (table.ids, table.uv, table.uvn,
                                          table.mask)

    for cam in range(cfg.num_cams):
        cam_ids = ids[cam]  # [P]
        cam_mask = meas_mask[cam] & (cam_ids >= 0)

        # match incoming ids against table rows: [T, P]
        eq = (new_ids[:, None] == cam_ids[None, :]) & cam_mask[None, :]
        has_match = jnp.any(eq, axis=0)

        # allocate free rows for new ids (rank-order into the free list)
        is_new = cam_mask & (~has_match)
        free = new_ids < 0
        sorted_free = jnp.sort(jnp.where(free, jnp.arange(T), T))
        new_rank = jnp.cumsum(is_new.astype(jnp.int32)) - 1
        alloc_row = sorted_free[jnp.clip(new_rank, 0, T - 1)]  # [P]
        # drop when full: ranks beyond the free list hit sorted_free's T
        # sentinel; ranks beyond T-1 must ALSO drop (not clip-collide on
        # the last free row — the one-hot sum would corrupt that row)
        alloc_ok = is_new & (new_rank < T) & (alloc_row < T)
        alloc_hit = (jnp.arange(T, dtype=jnp.int32)[:, None]
                     == alloc_row[None, :]) & alloc_ok[None, :]  # [T, P]

        W = eq | alloc_hit                      # [T, P] row t ← measurement p
        Wf = W.astype(table.uv.dtype)
        row_any = jnp.any(W, axis=1)            # [T]
        uv_t = Wf @ uv[cam]                     # [T, 2] (unique-id exact)
        uvn_t = Wf @ uvn[cam]
        id_t = jnp.max(jnp.where(W, cam_ids[None, :], -1), axis=1)  # [T]

        sel = row_any[:, None] & slot_onehot[None, :]  # [T, C]
        new_uv = new_uv.at[:, :, cam, :].set(           # static cam index
            jnp.where(sel[..., None], uv_t[:, None, :], new_uv[:, :, cam, :]))
        new_uvn = new_uvn.at[:, :, cam, :].set(
            jnp.where(sel[..., None], uvn_t[:, None, :], new_uvn[:, :, cam, :]))
        new_mask = new_mask.at[:, :, cam].set(new_mask[:, :, cam] | sel)
        row_alloc = jnp.any(alloc_hit, axis=1)
        new_ids = jnp.where(row_alloc, id_t, new_ids)
        seen = seen | row_any

    return table._replace(ids=new_ids, uv=new_uv, uvn=new_uvn,
                          mask=new_mask, seen=seen)


def clear_clone_column(table: FeatureTable, slot) -> FeatureTable:
    """Invalidate all observations taken at a marginalized clone slot
    (FeatureDatabase::cleanup_measurements parity).  One-hot select, not a
    DUS — see ingest_frame's TPU note."""
    C = table.mask.shape[1]
    keep = (jnp.arange(C, dtype=jnp.int32) != slot)[None, :, None]
    return table._replace(mask=table.mask & keep)


def row_obs_counts(table: FeatureTable):
    """[T] number of valid observations per row."""
    return jnp.sum(table.mask, axis=(1, 2))


def lost_rows(table: FeatureTable):
    """Rows with history but not seen this frame (features_not_containing_newer
    parity, FeatureDatabase.h:100-110) — MSCKF update candidates."""
    return (table.ids >= 0) & (~table.seen) & (row_obs_counts(table) > 0)


def full_window_rows(table: FeatureTable, state_n_clones, cfg: FilterConfig):
    """Rows observed in every active clone (features_containing(margtime)
    parity) — SLAM promotion / forced-MSCKF candidates."""
    seen_per_clone = jnp.any(table.mask, axis=2)  # [T, C]
    n_clones_seen = jnp.sum(seen_per_clone, axis=1)
    return (table.ids >= 0) & (n_clones_seen >= state_n_clones)


def free_rows(table: FeatureTable, rows_mask) -> FeatureTable:
    """Remove the given rows entirely (post-update cleanup parity)."""
    keep = ~rows_mask
    return table._replace(
        ids=jnp.where(keep, table.ids, -1),
        mask=table.mask & keep[:, None, None],
        seen=table.seen & keep,
    )
