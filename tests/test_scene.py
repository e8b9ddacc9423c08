"""Scene subsystem tests: parser entities, curves, importers, cache."""

import numpy as np
import pytest

from tracerboy_tpu.scene.curves import tessellate_curve, eval_cubic_bezier
from tracerboy_tpu.scene.pbrt_parser import parse_pbrt
from tracerboy_tpu.scene.types import TriangleMeshIR


class TestCurves:
    def test_bezier_endpoints(self):
        cp = np.array([[0, 0, 0], [1, 0, 0], [2, 1, 0], [3, 1, 0]], np.float32)
        pos, tan = eval_cubic_bezier(cp, np.array([0.0, 1.0], np.float32))
        np.testing.assert_allclose(pos[0], cp[0], atol=1e-6)
        np.testing.assert_allclose(pos[1], cp[3], atol=1e-6)

    def test_tube_geometry(self):
        cp = np.array([[0, 0, 0], [0, 1, 0], [0, 2, 0], [0, 3, 0]], np.float32)
        verts, tris, normals = tessellate_curve(cp, 0.2, 0.1, rings=4, sides=3)
        assert verts.shape == (12, 3)
        assert tris.shape == (18, 3)  # (rings-1) * sides * 2
        assert np.all(tris >= 0) and np.all(tris < len(verts))
        # Radius tapers from width0/2 to width1/2.
        r_start = np.linalg.norm(verts[:3, [0, 2]], axis=1)
        r_end = np.linalg.norm(verts[-3:, [0, 2]] - 0, axis=1)
        np.testing.assert_allclose(r_start, 0.1, atol=1e-5)
        np.testing.assert_allclose(r_end, 0.05, atol=1e-5)
        # Normals unit and outward-ish (perpendicular to the +y axis)
        np.testing.assert_allclose(
            np.linalg.norm(normals, axis=1), 1.0, atol=1e-4
        )
        np.testing.assert_allclose(normals[:, 1], 0.0, atol=1e-4)

    def test_curve_shape_in_pbrt(self, tmp_path):
        p = tmp_path / "c.pbrt"
        p.write_text("""
            Camera "perspective" "float fov" [40]
            WorldBegin
            Material "matte" "rgb Kd" [0.5 0.5 0.5]
            Shape "curve" "point P" [0 0 0  0 1 0  0 2 0  0 3 0]
              "float width0" [0.2] "float width1" [0.1]
            WorldEnd
        """)
        scene = parse_pbrt(str(p))
        assert len(scene.shapes) == 1
        from tracerboy_tpu.scene.compile import compile_scene

        cs = compile_scene(scene, film_size=(8, 8))
        assert cs.num_tris > 0


class TestSphere:
    def test_sphere_shape_compiles(self, tmp_path):
        p = tmp_path / "s.pbrt"
        p.write_text("""
            Camera "perspective" "float fov" [40]
            WorldBegin
            Material "matte" "rgb Kd" [0.5 0.5 0.5]
            AttributeBegin
            Translate 0 2 0
            Shape "sphere" "float radius" [1.5]
            AttributeEnd
            WorldEnd
        """)
        scene = parse_pbrt(str(p))
        from tracerboy_tpu.scene.compile import compile_scene

        cs = compile_scene(scene, film_size=(8, 8))
        # All verts within radius 1.5 of center (0, 2, 0)
        d = np.linalg.norm(cs.tri_v0 - np.array([0, 2, 0]), axis=1)
        assert np.all(d < 1.5 + 1e-4)
        assert d.max() > 1.4  # actually on the sphere


class TestInstancing:
    def test_object_instance(self, tmp_path):
        p = tmp_path / "i.pbrt"
        p.write_text("""
            Camera "perspective" "float fov" [40]
            WorldBegin
            Material "matte" "rgb Kd" [0.5 0.5 0.5]
            ObjectBegin "tri"
            Shape "trianglemesh" "integer indices" [0 1 2]
              "point P" [0 0 0  1 0 0  0 1 0]
            ObjectEnd
            AttributeBegin
            Translate 5 0 0
            ObjectInstance "tri"
            AttributeEnd
            AttributeBegin
            Translate -5 0 0
            ObjectInstance "tri"
            AttributeEnd
            WorldEnd
        """)
        scene = parse_pbrt(str(p))
        from tracerboy_tpu.scene.compile import compile_scene

        cs = compile_scene(scene, film_size=(8, 8))
        assert cs.num_tris == 2
        xs = sorted([float(cs.tri_v0[i][0]) for i in range(2)])
        assert xs[0] == pytest.approx(-5.0) and xs[1] == pytest.approx(5.0)


class TestImporters:
    def test_obj_roundtrip(self, tmp_path):
        (tmp_path / "m.mtl").write_text(
            "newmtl red\nKd 0.8 0.1 0.1\nNs 20\n"
        )
        (tmp_path / "m.obj").write_text(
            "mtllib m.mtl\nv 0 0 0\nv 1 0 0\nv 0 1 0\nv 1 1 0\n"
            "usemtl red\nf 1 2 3\nf 2 4 3\n"
        )
        from tracerboy_tpu.scene.mesh_import import import_mesh_scene

        scene = import_mesh_scene(str(tmp_path / "m.obj"))
        assert scene.triangle_count() == 2
        assert scene.materials["red"].kd[0] == pytest.approx(0.8)
        assert scene.camera is not None and scene.lights

    def test_stl_binary(self, tmp_path):
        import struct

        tris = np.array(
            [[[0, 0, 0], [1, 0, 0], [0, 1, 0]]], np.float32
        )
        buf = b"\0" * 80 + struct.pack("<I", 1)
        buf += np.zeros(3, np.float32).tobytes()
        buf += tris[0].astype("<f4").tobytes() + b"\0\0"
        (tmp_path / "t.stl").write_bytes(buf)
        from tracerboy_tpu.scene.mesh_import import import_mesh_scene

        scene = import_mesh_scene(str(tmp_path / "t.stl"))
        assert scene.triangle_count() == 1


class TestSceneCache:
    def test_npz_cache_roundtrip(self, tmp_path):
        import shutil

        import tests.conftest as c
        from tracerboy_tpu.scene.compile import load_scene

        src = c.require_scene("cornell-box/scene.pbrt")
        dst = tmp_path / "scene.pbrt"
        shutil.copy(src, dst)
        cs1 = load_scene(str(dst))            # builds + writes cache
        assert (tmp_path / "scene.pbrt.tbcache.npz").exists()
        cs2 = load_scene(str(dst))            # loads from cache
        np.testing.assert_array_equal(cs1.tri_v0, cs2.tri_v0)
        np.testing.assert_array_equal(
            cs1.materials["flags"], cs2.materials["flags"]
        )
        assert cs1.num_lights == cs2.num_lights
        np.testing.assert_allclose(
            cs1.camera.position, cs2.camera.position
        )
