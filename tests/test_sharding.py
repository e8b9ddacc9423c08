"""Multi-chip sharding tests on the 8-device virtual CPU mesh."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tracerboy_tpu.parallel.sharding import (
    make_mesh,
    render_spp_sharded,
    render_wave_tiled,
    shard_pixels,
)
from tracerboy_tpu.scene.compile import load_scene
from tracerboy_tpu.trace.wavefront import WaveConfig, render_wave


@pytest.fixture(scope="module")
def small_scene():
    import tests.conftest as c

    path = c.require_scene("cornell-box/scene.pbrt")
    cs = load_scene(path, use_cache=False, film_size=(32, 32))
    cfg = WaveConfig(
        width=32, height=32, max_bounces=3, leaf_size=cs.leaf_size,
        num_lights=cs.num_lights, has_env=cs.has_env,
        use_blue_noise=False, traversal="brute",
    )
    params = dict(
        dof_focus=jnp.float32(0.0), dof_aperture=jnp.float32(0.0),
        firefly_clamp=jnp.float32(0.0), seed=jnp.int32(0),
    )
    return cs.as_pytree(), cfg, params


def test_mesh_has_8_devices():
    mesh = make_mesh()
    assert mesh.devices.size == 8


def test_tiled_matches_single_device(small_scene):
    scene, cfg, params = small_scene
    mesh = make_mesh()
    pixel_ids, pad = shard_pixels(mesh, 32, 32)
    out = render_wave_tiled(mesh, scene, params, pixel_ids, jnp.int32(0), cfg)
    tiled = np.asarray(out["radiance"])[: 32 * 32]

    single = np.asarray(
        render_wave(scene, params, jnp.arange(32 * 32, dtype=jnp.int32),
                    jnp.int32(0), cfg)["radiance"]
    )
    np.testing.assert_allclose(tiled, single, atol=1e-5)


def test_spp_sharded_matches_sequential(small_scene):
    """psum-merged multi-device accumulation == sum of sequential waves."""
    scene, cfg, params = small_scene
    mesh = make_mesh()
    ids = jnp.arange(32 * 32, dtype=jnp.int32)
    rad_sh, fw_sh, rays_sh = render_spp_sharded(
        mesh, scene, params, ids, jnp.int32(0), cfg, samples_per_device=1
    )
    rad_seq = jnp.zeros_like(rad_sh)
    fw_seq = jnp.zeros_like(fw_sh)
    for dev in range(8):
        out = render_wave(scene, params, ids, jnp.int32(dev), cfg)
        rad_seq = rad_seq + out["radiance"]
        fw_seq = fw_seq + out["filter_weight"]
    np.testing.assert_allclose(
        np.asarray(rad_sh), np.asarray(rad_seq), rtol=1e-5, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(fw_sh), np.asarray(fw_seq), rtol=1e-5, atol=1e-5
    )
    assert float(rays_sh) > 0
