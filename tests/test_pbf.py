"""PBF binary scene format tests: round-trip fidelity and render parity.

The writer/reader pair implements BinaryFileFormat.cpp's wire format
(entity blocks, int32 references, format tag 9); round-tripping checks
self-consistency of the transcription, and the render test checks the
semantic mapping end to end.
"""

import numpy as np
import pytest

from tracerboy_tpu.scene.pbf import read_pbf, write_pbf


def _parse_cornell():
    import tests.conftest as c
    from tracerboy_tpu.scene.pbrt_parser import parse_pbrt

    return parse_pbrt(c.require_scene("cornell-box/scene.pbrt"))


class TestPBFRoundTrip:
    def test_counts_and_materials_survive(self, tmp_path):
        scene = _parse_cornell()
        p = str(tmp_path / "cornell.pbf")
        write_pbf(p, scene)
        back = read_pbf(p)
        assert back.triangle_count() == scene.triangle_count()
        assert len(back.materials) >= len(
            {s.material for s in scene.shapes}
        )
        # film + camera preserved
        assert back.film.xresolution == scene.film.xresolution
        np.testing.assert_allclose(
            back.camera.camera_to_world, scene.camera.camera_to_world,
            atol=1e-6,
        )
        assert back.camera.fov == pytest.approx(scene.camera.fov)
        # area-light emission preserved on the light quad
        emissive = [s for s in back.shapes if s.emission is not None]
        assert emissive and emissive[0].emission.max() > 1.0

    def test_render_parity(self, tmp_path):
        """Rendering the .pbf round trip matches the .pbrt render."""
        import tests.conftest as c
        from tracerboy_tpu import Renderer
        from tracerboy_tpu.scene.compile import compile_scene

        scene = _parse_cornell()
        p = str(tmp_path / "cornell.pbf")
        write_pbf(p, scene)

        r1 = Renderer(compile_scene(scene, film_size=(24, 24)))
        r1.render_sample(2)
        img1 = np.asarray(r1.resolve_radiance())

        r2 = Renderer(p, film_size=(24, 24))
        r2.render_sample(2)
        img2 = np.asarray(r2.resolve_radiance())
        np.testing.assert_allclose(img1, img2, atol=1e-4)

    def test_instances_round_trip(self, tmp_path):
        from tracerboy_tpu.scene.types import (
            InstanceIR,
            MaterialIR,
            ObjectIR,
            SceneIR,
            TriangleMeshIR,
        )

        scene = SceneIR()
        scene.materials["m"] = MaterialIR(
            name="m", type="matte", kd=np.full(3, 0.5, np.float32)
        )
        tri = TriangleMeshIR(
            indices=np.array([[0, 1, 2]], np.int32),
            positions=np.array(
                [[0, 0, 0], [1, 0, 0], [0, 1, 0]], np.float32
            ),
            material="m",
        )
        scene.objects["obj"] = ObjectIR(name="obj", shapes=[tri])
        xf = np.eye(4, dtype=np.float32)
        xf[0, 3] = 5.0
        scene.instances.append(InstanceIR(object_name="obj", transform=xf))
        scene.instances.append(
            InstanceIR(object_name="obj", transform=np.eye(4))
        )
        p = str(tmp_path / "inst.pbf")
        write_pbf(p, scene)
        back = read_pbf(p)
        assert back.triangle_count() == 2
        xs = sorted(s.transform[0, 3] for s in back.shapes)
        assert xs == pytest.approx([0.0, 5.0])

    def test_mix_and_glass_materials(self, tmp_path):
        from tracerboy_tpu.scene.types import (
            MaterialIR,
            SceneIR,
            TriangleMeshIR,
        )

        scene = SceneIR()
        scene.materials["g"] = MaterialIR(name="g", type="glass", index=1.6)
        scene.materials["d"] = MaterialIR(
            name="d", type="matte", kd=np.full(3, 0.3, np.float32)
        )
        scene.materials["mx"] = MaterialIR(
            name="mx", type="mix", material0="g", material1="d", amount=0.3
        )
        scene.shapes.append(TriangleMeshIR(
            indices=np.array([[0, 1, 2]], np.int32),
            positions=np.array(
                [[0, 0, 0], [1, 0, 0], [0, 1, 0]], np.float32
            ),
            material="mx",
        ))
        p = str(tmp_path / "mix.pbf")
        write_pbf(p, scene)
        back = read_pbf(p)
        mesh = back.shapes[0]
        mx = back.materials[mesh.material]
        assert mx.type == "mix"
        assert mx.amount == pytest.approx(0.3)
        m0 = back.materials[mx.material0]
        m1 = back.materials[mx.material1]
        assert {m0.type, m1.type} == {"glass", "matte"}
        glass = m0 if m0.type == "glass" else m1
        assert glass.index == pytest.approx(1.6)
