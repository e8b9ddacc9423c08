"""TLAS/BLAS instancing tests (CPU, interpret-mode kernels).

The reference keeps one BLAS per instanced object plus a TLAS of
per-instance transforms (TracerBoy.cpp:1305-1410, 2031-2116); rounds 1-2
flattened instances instead. These tests pin the two-level path's
contract: device memory scales with UNIQUE geometry, and renders match
the flattened oracle.
"""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tracerboy_tpu.scene.compile import compile_scene
from tracerboy_tpu.scene.pbrt_parser import parse_pbrt

GRID = 5  # 25 instances


def _scene_text():
    insts = []
    for i in range(GRID):
        for j in range(GRID):
            insts.append(f"""
            AttributeBegin
            Translate {i * 3.0} 0 {j * 3.0 - 12.0}
            ObjectInstance "ball"
            AttributeEnd
            """)
    return f"""
        Camera "perspective" "float fov" [55]
        Film "image" "integer xresolution" [48]
             "integer yresolution" [32]
        WorldBegin
        LightSource "infinite" "rgb L" [1 1 1]
        Material "matte" "rgb Kd" [0.6 0.4 0.3]
        ObjectBegin "ball"
        Shape "sphere" "float radius" [1.0]
        ObjectEnd
        Translate 0 -12 0
        {''.join(insts)}
        WorldEnd
    """


def _geometry_bytes(pytree):
    total = 0
    for k, v in pytree.items():
        if k.startswith(("pk_", "bn_", "tri", "bvh")):
            total += sum(
                int(np.prod(x.shape)) * 4
                for x in jax.tree_util.tree_leaves(v)
            )
        if k == "inst_objs":
            total += sum(
                int(np.prod(x.shape)) * 4
                for x in jax.tree_util.tree_leaves(v)
            )
    return total


@pytest.fixture
def instanced_pair(tmp_path):
    p = tmp_path / "inst.pbrt"
    p.write_text(_scene_text())
    sc = parse_pbrt(str(p))
    cs_tlas = compile_scene(sc, film_size=(48, 32), instancing="tlas")
    cs_flat = compile_scene(sc, film_size=(48, 32), instancing="flatten")
    return cs_tlas, cs_flat


def test_tlas_memory_scales_with_unique_geometry(instanced_pair):
    cs_tlas, cs_flat = instanced_pair
    assert cs_tlas.has_instances
    assert not cs_flat.has_instances
    # flattened soup has GRID^2 copies of the sphere
    assert cs_flat.tri_v0.shape[0] >= GRID * GRID * 900
    # TLAS keeps ONE copy (plus the degenerate flat placeholder)
    pt_tlas = cs_tlas.as_pytree(pack_pallas=True)
    pt_flat = cs_flat.as_pytree(pack_pallas=True)
    b_tlas = _geometry_bytes(pt_tlas)
    b_flat = _geometry_bytes(pt_flat)
    assert b_tlas * 5 < b_flat, (b_tlas, b_flat)
    assert int(pt_tlas["inst_obj"].shape[0]) == GRID * GRID


@pytest.mark.slow
def test_tlas_renders_pixel_parity(instanced_pair):
    import tracerboy_tpu.trace.pallas_traverse2 as pt2
    from tests.test_pallas import _patch_interpret
    from tracerboy_tpu.renderer import Renderer

    cs_tlas, cs_flat = instanced_pair
    orig = _patch_interpret(pt2)
    try:
        os.environ["TB_TRAVERSAL"] = "pallas"
        os.environ["TB_BINNED"] = "0"
        r_t = Renderer(cs_tlas, film_size=(48, 32))
        r_f = Renderer(cs_flat, film_size=(48, 32))
        assert r_t.wave_config().has_instances
        r_t.render_sample(1)
        r_f.render_sample(1)
        img_t = np.asarray(r_t.resolve_radiance())
        img_f = np.asarray(r_f.resolve_radiance())
        assert np.isfinite(img_t).all()
        # same sampler streams + same geometry -> near-identical images
        # (tiny differences possible where BLAS vs flat BVH tie-break
        # coincident hits)
        close = np.isclose(img_t, img_f, rtol=1e-3, atol=5e-3)
        assert close.mean() > 0.98, close.mean()
    finally:
        os.environ.pop("TB_TRAVERSAL", None)
        os.environ.pop("TB_BINNED", None)
        pt2.traverse_packets2, pt2.anyhit_packets2 = orig
