"""OpenVDB (.vdb) FloatGrid reader/writer tests (scene/vdb.py).

No real .vdb assets exist in this environment and there is no openvdb
python binding, so the decode oracle is the writer: both sides are
implemented independently against the vendored openvdb serialization
sources (file:line cites in scene/vdb.py), and the tests cover every
compression mode + topology feature the reader claims.
"""

import numpy as np
import pytest

from tracerboy_tpu.scene.vdb import (
    COMPRESS_ACTIVE_MASK,
    COMPRESS_NONE,
    COMPRESS_ZIP,
    read_vdb,
    write_vdb,
)
from tracerboy_tpu.scene.volume import VolumeIR, load_volume


def _cloud(shape=(24, 20, 17), seed=0):
    """Sparse test density: a soft ball with ~60% zero voxels."""
    d, h, w = shape
    z, y, x = np.meshgrid(
        np.linspace(-1, 1, d), np.linspace(-1, 1, h),
        np.linspace(-1, 1, w), indexing="ij",
    )
    r = np.sqrt(x * x + y * y + z * z)
    dens = np.maximum(0.0, 0.7 - r).astype(np.float32) * 3.0
    rng = np.random.default_rng(seed)
    dens *= (rng.random(shape) > 0.2)
    return VolumeIR(
        density=dens,
        lo=np.array([-1.0, -2.0, 0.5], np.float32),
        hi=np.array([1.5, 0.0, 2.5], np.float32),
    )


@pytest.mark.parametrize("compression", [
    COMPRESS_ZIP | COMPRESS_ACTIVE_MASK,    # what openvdb writes (fog)
    COMPRESS_ZIP,
    COMPRESS_ACTIVE_MASK,
    COMPRESS_NONE,
])
def test_roundtrip_compression_modes(tmp_path, compression):
    vol = _cloud()
    p = str(tmp_path / "c.vdb")
    write_vdb(p, vol, compression=compression)
    back = read_vdb(p)
    assert back.density.shape == vol.density.shape
    np.testing.assert_array_equal(back.density, vol.density)
    np.testing.assert_allclose(back.lo, vol.lo, atol=1e-6)
    np.testing.assert_allclose(back.hi, vol.hi, atol=1e-6)


def test_roundtrip_half_precision(tmp_path):
    vol = _cloud()
    p = str(tmp_path / "h.vdb")
    write_vdb(p, vol, half=True)
    back = read_vdb(p)
    np.testing.assert_allclose(
        back.density, vol.density.astype(np.float16).astype(np.float32)
    )


def test_grid_spanning_multiple_internal_nodes(tmp_path):
    """> 128 voxels on one axis forces several Internal16 children."""
    rng = np.random.default_rng(3)
    dens = (rng.random((9, 10, 200)).astype(np.float32)
            * (rng.random((9, 10, 200)) > 0.5))
    vol = VolumeIR(density=dens, lo=np.zeros(3, np.float32),
                   hi=np.array([20.0, 1.0, 1.0], np.float32))
    p = str(tmp_path / "wide.vdb")
    write_vdb(p, vol)
    back = read_vdb(p)
    np.testing.assert_array_equal(back.density, dens)


def test_grid_name_selection(tmp_path):
    vol = _cloud()
    p = str(tmp_path / "n.vdb")
    write_vdb(p, vol, grid_name="density")
    back = read_vdb(p, grid_name="density")
    np.testing.assert_array_equal(back.density, vol.density)
    with pytest.raises(ValueError, match="not found"):
        read_vdb(p, grid_name="temperature")


def test_rejects_non_vdb(tmp_path):
    p = tmp_path / "bogus.vdb"
    p.write_bytes(b"\x00" * 64)
    with pytest.raises(ValueError, match="not a .vdb"):
        read_vdb(str(p))


def test_load_volume_dispatches_vdb(tmp_path):
    vol = _cloud()
    p = str(tmp_path / "d.vdb")
    write_vdb(p, vol)
    back = load_volume(p)
    np.testing.assert_array_equal(back.density, vol.density)


@pytest.mark.smoke
def test_vdb_volume_renders(tmp_path):
    """End to end: .vdb -> VolumeIR -> Renderer with the delta-tracking
    medium produces a finite, non-trivial image (closes reference G3,
    TracerBoy.cpp:1096-1184 — which loads but never renders its grid)."""
    import dataclasses

    import tests.conftest as c
    from tracerboy_tpu.renderer import Renderer
    from tracerboy_tpu.utils.config import default_output_settings

    path = c.require_scene("cornell-box/scene.pbrt")
    vol = VolumeIR(
        density=np.full((8, 8, 8), 0.35, np.float32),
        lo=np.array([-0.9, 0.1, -0.9], np.float32),
        hi=np.array([0.9, 1.8, 0.9], np.float32),
        sigma_a=np.array([0.1, 0.1, 0.1], np.float32),
        sigma_s=np.array([2.0, 2.0, 2.0], np.float32),
    )
    p = str(tmp_path / "fog.vdb")
    write_vdb(p, vol)
    s = default_output_settings()
    s = s.replace(performance_settings=dataclasses.replace(
        s.performance_settings, max_bounces=3, use_blue_noise=False,
    ))
    r = Renderer(path, settings=s, film_size=(16, 16),
                 volume=load_volume(p))
    r.render_sample()
    img = np.asarray(r.resolve_radiance())
    assert np.isfinite(img).all() and img.mean() > 0
