"""Render-state checkpoint/resume.

The reference keeps resume state only in GPU memory (accumulators +
sample counter, SURVEY.md 5.4); here the same pytree round-trips through
an .npz so long progressive renders survive preemption — accumulation
state is (sum, weight) so resuming is exact.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def save_render_checkpoint(path: str, renderer) -> None:
    st = renderer.state
    np.savez_compressed(
        path,
        accum=np.asarray(st.accum),
        accum_jittered=np.asarray(st.accum_jittered),
        world_pos0=np.asarray(st.world_pos[0]),
        world_pos1=np.asarray(st.world_pos[1]),
        spp=np.asarray(st.spp),
    )


def load_render_checkpoint(path: str, renderer) -> bool:
    import os

    if not os.path.exists(path):
        return False
    z = np.load(path)
    st = renderer.state
    if z["accum"].shape != tuple(st.accum.shape):
        return False  # resolution changed; start fresh
    st.accum = jnp.asarray(z["accum"])
    st.accum_jittered = jnp.asarray(z["accum_jittered"])
    st.world_pos = [jnp.asarray(z["world_pos0"]), jnp.asarray(z["world_pos1"])]
    st.spp = int(z["spp"])
    return True
