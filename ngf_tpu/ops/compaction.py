"""Fixed-capacity stable compaction without sorts or per-sample gathers.

The reference culls samples with ragged boolean indexing
(`InfoInv/models/FieldBase.py:253-265`); round 1 replaced that with a
stable argsort + per-sample take_along_axis, which profiling showed to be
descriptor-bound overhead (VERDICT.md item 3). This module replaces both:

- samples are grouped into runs of G consecutive samples; a group is kept
  iff any member is valid. Groups keep/drop as units, so the gather moves
  G samples per descriptor (G x fewer descriptors) and downstream tiled
  plane gathers (ngf_tpu/ops/tiled_sample.py) get guaranteed-consecutive
  runs.
- the compaction *indices* come from an exclusive cumsum + one-hot
  contraction over the (small) group axis — pure VPU/MXU math, no sort:
  dest[i] = (#valid groups before i); idx[j] = the i with dest[i] == j.

Stability (ray-marching order) is preserved: cumsum is monotone, so groups
land in original order, exactly like the reference's boolean indexing.
"""

from __future__ import annotations

import jax.numpy as jnp


def group_compact_indices(
    gvalid: jnp.ndarray, capg: int
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Stable-partition gather indices at group granularity.

    Args:
      gvalid: (N, NG) bool — group has at least one valid sample.
      capg: static output capacity (groups per ray).

    Returns:
      idx (N, capg) int32 — original group index for each kept slot (0 for
        padding slots), and got (N, capg) bool — slot holds a real group.
    """
    n, ng = gvalid.shape
    dest = jnp.cumsum(gvalid.astype(jnp.int32), axis=-1) - 1  # (N, NG)
    slots = jnp.arange(capg, dtype=jnp.int32)
    # (N, capg, NG) one-hot: group i lands in slot j iff valid and dest==j.
    oh = (dest[:, None, :] == slots[None, :, None]) & gvalid[:, None, :]
    iota = jnp.arange(ng, dtype=jnp.int32)
    idx = jnp.sum(oh * iota[None, None, :], axis=-1, dtype=jnp.int32)
    got = jnp.any(oh, axis=-1)
    return idx, got


def gather_groups(x: jnp.ndarray, idx: jnp.ndarray, group: int) -> jnp.ndarray:
    """Gather whole groups of G consecutive samples with one descriptor per
    group.

    Args:
      x: (N, S, D) per-sample payload, S a multiple of ``group``.
      idx: (N, capg) group indices from group_compact_indices.
      group: G.

    Returns:
      (N, capg * group, D).
    """
    n, s, d = x.shape
    assert s % group == 0, (s, group)
    blocks = x.reshape(n, s // group, group * d)
    sel = jnp.take_along_axis(blocks, idx[..., None], axis=1)
    return sel.reshape(n, idx.shape[1] * group, d)
