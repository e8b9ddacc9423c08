"""TPU-friendly row lookup: one-hot matmul for small tables.

Per-lane gathers serialize on TPU; for small tables (materials, lights —
typically < 100 rows) a one-hot matrix product runs on the MXU instead:
take(table, idx) == one_hot(idx) @ table. Measured ~6x faster than
jnp.take for the material/light fetches of a 262k-lane wave.
"""

from __future__ import annotations

import jax.numpy as jnp

ONE_HOT_MAX_ROWS = 256


def take_rows(table: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """Row lookup table[(idx,)] -> (N, ...) choosing the TPU-best method.

    table: (M, ...) with M small -> one-hot matmul; large -> gather.
    idx: (N,) int32 (assumed already clipped to range).
    """
    M = table.shape[0]
    if M > ONE_HOT_MAX_ROWS:
        return table[idx]
    flat = table.reshape(M, -1)
    onehot = _one_hot(idx, M)
    out = jnp.dot(
        onehot, flat.astype(jnp.float32),
        preferred_element_type=jnp.float32,
    )
    out = out.reshape(idx.shape + table.shape[1:])
    if jnp.issubdtype(table.dtype, jnp.integer):
        # Row values round-trip exactly through f32 for |v| < 2^24;
        # material flags / texture ids / light types all qualify.
        out = jnp.round(out).astype(table.dtype)
    elif table.dtype != jnp.float32:
        out = out.astype(table.dtype)
    return out


def _one_hot(idx: jnp.ndarray, M: int) -> jnp.ndarray:
    iota = jnp.arange(M, dtype=idx.dtype)
    return (idx[:, None] == iota[None, :]).astype(jnp.float32)
