"""Static-shape stream compaction.

The reference leans on thrust::copy_if / remove_if / unique everywhere
(svo.cu:205,216-217,456,722; voxelization.cu:312; cone_tracing_kernels.cu:188;
rasterize_kernels.cu:232). Those produce dynamic sizes, which XLA cannot
express. The TPU-native replacement is prefix-sum compaction into a
fixed-capacity buffer with an explicit live count:

    ranks = cumsum(mask) - mask          (exclusive prefix sum)
    out[ranks[i]] = in[i]  where mask[i] (masked scatter, OOB dropped)
    count = sum(mask)

All shapes are static; `count` is a traced scalar.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp


def exclusive_ranks(mask: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Exclusive prefix-sum ranks of a boolean mask and the total count."""
    m = mask.astype(jnp.int32)
    inc = jnp.cumsum(m)
    return inc - m, inc[-1] if m.size else jnp.int32(0)


def compact(values: jnp.ndarray, mask: jnp.ndarray, capacity: int,
            fill=0) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Scatter `values[mask]` into a `capacity`-sized buffer (row-major order
    preserved). Returns (out, count). Entries beyond capacity are dropped.

    values: [N, ...], mask: bool[N].
    """
    ranks, count = exclusive_ranks(mask)
    idx = jnp.where(mask, ranks, capacity)  # OOB index -> dropped
    out_shape = (capacity,) + values.shape[1:]
    out = jnp.full(out_shape, fill, dtype=values.dtype)
    out = out.at[idx].set(values, mode="drop")
    return out, jnp.minimum(count, capacity)


def compact_multi(arrays, mask: jnp.ndarray, capacity: int, fill=0):
    """Compact several parallel arrays with one shared mask.
    Returns (list_of_outs, count)."""
    ranks, count = exclusive_ranks(mask)
    idx = jnp.where(mask, ranks, capacity)
    outs = []
    for values in arrays:
        out_shape = (capacity,) + values.shape[1:]
        out = jnp.full(out_shape, fill, dtype=values.dtype)
        out = out.at[idx].set(values, mode="drop")
        outs.append(out)
    return outs, jnp.minimum(count, capacity)


def first_occurrence(sorted_keys: jnp.ndarray, valid: jnp.ndarray | None = None) -> jnp.ndarray:
    """Boolean mask of first occurrences in a sorted key array — the
    static-shape replacement for thrust::unique (svo.cu:216-217)."""
    first = jnp.concatenate(
        [jnp.ones((1,), bool), sorted_keys[1:] != sorted_keys[:-1]]
    )
    if valid is not None:
        first = first & valid
    return first
