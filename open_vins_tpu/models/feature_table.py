"""Device-side feature track table — the FeatureDatabase re-designed as
fixed-shape arrays.

Capability parity with ov_core::FeatureDatabase + Feature
(FeatureDatabase.h:54-167, Feature.h:40-140): per-feature measurement
history keyed by (clone slot, camera), id-stable ingestion of new frames,
and the time-indexed triage queries that drive update scheduling
(features_not_containing_newer = lost tracks, features_containing(marg) =
full-window tracks, cleanup after updates).

TPU-first redesign: the mutex-guarded unordered_map becomes a [T]-row table
with an id column and a BITPACKED observation mask — `mbits` [T, N] int32,
bit c of word (t, n) = "row t has a valid observation at clone slot c from
camera n".  Marginalizing a clone is one AND-mask; "lost" / "full-window"
queries are popcounts; id matching is one [T, P] equality op per camera.

Why bits instead of a bool [T, C, N] array: on TPU a pred array with tiny
minor dims (C=11, N=1) tiles at ~2% lane occupancy — every reduce/update
dragged full-array layout copies with it (two mask reduce fusions alone
cost 28 µs/frame single-stream, 214 µs/frame at ensemble B=8 in the
profile).  The packed [T, N] int32 form puts the big dim on lanes; every
query is a handful of elementwise integer ops.  All writes are one-hot
selects / OR-masks — no scatters, no dynamic-update-slices (see
ingest_frame).  Requires max_clones <= 32 (reference default is 11).
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
    mbits: jax.Array  # [T, N] int32 — bit c set = valid obs at clone slot c
    seen: jax.Array  # [T] bool — observed in the current frame (transient)


def popcount32(x):
    """Per-element population count of an int32 array (SWAR)."""
    x = x - ((x >> 1) & 0x55555555)
    x = (x & 0x33333333) + ((x >> 2) & 0x33333333)
    x = (x + (x >> 4)) & 0x0F0F0F0F
    return (x * 0x01010101) >> 24


def init_table(cfg: FilterConfig, max_tracks: int) -> FeatureTable:
    C, N = cfg.max_clones, cfg.num_cams
    assert C <= 32, "bitpacked mask holds one clone bit per int32 word"
    return FeatureTable(
        ids=jnp.full((max_tracks,), -1, dtype=jnp.int32),
        uv=jnp.zeros((max_tracks, C, N, 2), dtype=jnp.float32),
        uvn=jnp.zeros((max_tracks, C, N, 2), dtype=jnp.float32),
        mbits=jnp.zeros((max_tracks, N), dtype=jnp.int32),
        seen=jnp.zeros((max_tracks,), dtype=bool),
    )


def mask_bool(table: FeatureTable) -> jax.Array:
    """Unpack mbits to the logical [T, C, N] bool mask (tests/debug and the
    few consumers that want the dense form)."""
    T, N = table.mbits.shape
    C = table.uv.shape[1]
    c = jnp.arange(C, dtype=jnp.int32)[None, :, None]  # [1, C, 1]
    return ((table.mbits[:, None, :] >> c) & 1) > 0


def obs_bit(table: FeatureTable, rows, slot, cam):
    """Valid-observation bits for table rows at (slot, cam) — `rows`,
    `slot`, `cam` may be traced arrays (broadcast together) or python
    ints.  Replaces `table.mask[rows, slot, cam]` gathers with a row
    gather plus elementwise shifts (consumer: updater_zupt.frame_disparity)."""
    T, N = table.mbits.shape
    rr = jnp.clip(rows, 0, T - 1)
    bits_r = table.mbits[rr]  # [..., N]
    cam = jnp.asarray(cam, jnp.int32)
    cam_oh = jnp.arange(N, dtype=jnp.int32) == cam[..., None]
    word = jnp.sum(jnp.where(cam_oh, bits_r, 0), axis=-1)
    return ((word >> slot) & 1) > 0


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
    the simulator guarantee it); if a tracker ever emits a duplicate id,
    the contraction is normalized by the per-row hit count so duplicates
    degrade to their AVERAGE (not an out-of-range sum).
    """
    T = table.ids.shape[0]
    C = table.uv.shape[1]
    slot_onehot = jnp.arange(C, dtype=jnp.int32) == head_slot  # [C]
    head_bit = jnp.left_shift(jnp.asarray(1, jnp.int32),
                              head_slot.astype(jnp.int32))
    seen = jnp.zeros((T,), dtype=bool)
    new_ids, new_uv, new_uvn, new_bits = (table.ids, table.uv, table.uvn,
                                          table.mbits)

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
        # normalize by hit count: exact for unique ids (hits ∈ {0,1}),
        # averages if a tracker ever emits duplicate ids for one camera
        inv_hits = 1.0 / jnp.maximum(jnp.sum(Wf, axis=1), 1.0)  # [T]
        uv_t = (Wf @ uv[cam]) * inv_hits[:, None]   # [T, 2]
        uvn_t = (Wf @ uvn[cam]) * inv_hits[:, None]
        id_t = jnp.max(jnp.where(W, cam_ids[None, :], -1), axis=1)  # [T]

        sel = row_any[:, None] & slot_onehot[None, :]  # [T, C]
        new_uv = new_uv.at[:, :, cam, :].set(           # static cam index
            jnp.where(sel[..., None], uv_t[:, None, :], new_uv[:, :, cam, :]))
        new_uvn = new_uvn.at[:, :, cam, :].set(
            jnp.where(sel[..., None], uvn_t[:, None, :], new_uvn[:, :, cam, :]))
        new_bits = new_bits.at[:, cam].set(
            jnp.where(row_any, new_bits[:, cam] | head_bit,
                      new_bits[:, cam]))
        row_alloc = jnp.any(alloc_hit, axis=1)
        new_ids = jnp.where(row_alloc, id_t, new_ids)
        seen = seen | row_any

    return table._replace(ids=new_ids, uv=new_uv, uvn=new_uvn,
                          mbits=new_bits, seen=seen)


def clear_clone_column(table: FeatureTable, slot) -> FeatureTable:
    """Invalidate all observations taken at a marginalized clone slot
    (FeatureDatabase::cleanup_measurements parity) — one AND-mask."""
    bit = jnp.left_shift(jnp.asarray(1, jnp.int32), slot.astype(jnp.int32))
    return table._replace(mbits=table.mbits & ~bit)


def clear_rows(table: FeatureTable, rows_mask) -> FeatureTable:
    """Drop all observations of the given rows (post-consumption cleanup —
    the `mask & ~consumed[:, None, None]` idiom in packed form)."""
    return table._replace(
        mbits=jnp.where(rows_mask[:, None], 0, table.mbits))


def row_obs_counts(table: FeatureTable):
    """[T] number of valid observations per row."""
    return jnp.sum(popcount32(table.mbits), axis=1)


def lost_rows(table: FeatureTable):
    """Rows with history but not seen this frame (features_not_containing_newer
    parity, FeatureDatabase.h:100-110) — MSCKF update candidates."""
    return (table.ids >= 0) & (~table.seen) & (row_obs_counts(table) > 0)


def full_window_rows(table: FeatureTable, state_n_clones, cfg: FilterConfig):
    """Rows observed in every active clone (features_containing(margtime)
    parity) — SLAM promotion / forced-MSCKF candidates."""
    any_cam = table.mbits[:, 0]
    for n in range(1, table.mbits.shape[1]):
        any_cam = any_cam | table.mbits[:, n]
    n_clones_seen = popcount32(any_cam)
    return (table.ids >= 0) & (n_clones_seen >= state_n_clones)


def free_rows(table: FeatureTable, rows_mask) -> FeatureTable:
    """Remove the given rows entirely (post-update cleanup parity)."""
    keep = ~rows_mask
    return table._replace(
        ids=jnp.where(keep, table.ids, -1),
        mbits=jnp.where(keep[:, None], table.mbits, 0),
        seen=table.seen & keep,
    )
