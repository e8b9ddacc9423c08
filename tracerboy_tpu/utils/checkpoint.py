"""Render-state checkpoint/resume.

The reference keeps resume state only in GPU memory (accumulators +
sample counter, SURVEY.md 5.4); here the same pytree round-trips through
an .npz so long progressive renders survive preemption — accumulation
state is (sum, weight) so resuming is exact.

Scope (round-3): beyond the unbiased accumulators, the RealTime-mode
temporal state is captured too — the fused-path TAA color/moment/
indirect histories, raw lighting, AOV caches and previous-frame camera,
plus the frame-rate governor's adaptive pad — so resuming a RealTime
session continues its converged temporal history instead of restarting
it (the reference treats that history as first-class invalidation
state, TracerBoy.cpp:3569-3575).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp


def _flatten_tree(prefix: str, tree, out: dict):
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    out[prefix + ".__treedef__"] = np.frombuffer(
        str(treedef).encode(), dtype=np.uint8
    )
    for i, leaf in enumerate(leaves):
        out[f"{prefix}.{i}"] = np.asarray(leaf)


def _unflatten_tree(prefix: str, like_tree, z):
    leaves, treedef = jax.tree_util.tree_flatten(like_tree)
    new = []
    for i, leaf in enumerate(leaves):
        key = f"{prefix}.{i}"
        if key not in z.files:
            return None
        arr = z[key]
        want = tuple(np.shape(leaf))
        if tuple(arr.shape) != want:
            # Legacy plane migration (advisor, round 3): the RealTime
            # diffuse_contrib history grew from (H, W) to (H, W, 3);
            # broadcast an old scalar plane instead of dropping the
            # whole history.
            if (arr.ndim + 1 == len(want)
                    and tuple(arr.shape) == want[:-1] and want[-1] == 3):
                arr = np.repeat(arr[..., None], 3, axis=-1)
            else:
                return None
        new.append(jnp.asarray(arr))
    return jax.tree_util.tree_unflatten(treedef, new)


def save_render_checkpoint(path: str, renderer) -> None:
    st = renderer.state
    flat = dict(
        accum=np.asarray(st.accum),
        accum_jittered=np.asarray(st.accum_jittered),
        world_pos0=np.asarray(st.world_pos[0]),
        world_pos1=np.asarray(st.world_pos[1]),
        spp=np.asarray(st.spp),
    )
    # RealTime temporal history (fused path) + governor state.
    hist = getattr(renderer, "_rt_hist_fused", None)
    if hist is not None:
        _flatten_tree("rt_hist", hist, flat)
    cam_prev = getattr(renderer, "_cam_prev", None)
    if cam_prev is not None:
        _flatten_tree("cam_prev", cam_prev, flat)
    gov = getattr(renderer, "_governor", None)
    if gov is not None:
        flat["governor_pad"] = np.asarray(float(gov.pad))
    np.savez_compressed(path, **flat)


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
    # RealTime temporal history: restored only when the renderer has
    # already created a same-shaped history (e.g. one warmup frame) —
    # otherwise resume lazily via renderer._rt_resume below.
    hist = getattr(renderer, "_rt_hist_fused", None)
    if hist is not None and "rt_hist.0" in z.files:
        restored = _unflatten_tree("rt_hist", hist, z)
        if restored is not None:
            renderer._rt_hist_fused = restored
    elif "rt_hist.0" in z.files:
        renderer._rt_checkpoint_pending = path
    cam_prev = getattr(renderer, "_cam_prev", None)
    if cam_prev is not None and "cam_prev.0" in z.files:
        restored = _unflatten_tree("cam_prev", cam_prev, z)
        if restored is not None:
            renderer._cam_prev = restored
    if "governor_pad" in z.files:
        gov = getattr(renderer, "_governor", None)
        if gov is not None:
            gov.pad = float(z["governor_pad"])
        else:
            renderer._governor_pad_pending = float(z["governor_pad"])
    return True
