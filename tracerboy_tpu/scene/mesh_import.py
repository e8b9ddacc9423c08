"""Generic mesh-format import: OBJ (+MTL) and STL -> SceneIR.

The capability of the reference's AssimpImporter (TracerBoy/
AssimpImporter.cpp:41-177): load non-PBRT mesh formats, map Phong-style
materials onto the uber material model, emissive materials onto area
lights, and synthesize a default camera framing the scene bounds. The
reference links Assimp for ~40 formats; here the two most common
interchange formats are parsed natively (no external deps), through the
same SceneIR the PBRT parser emits, so everything downstream is shared.
"""

from __future__ import annotations

import os

import numpy as np

from tracerboy_tpu.scene.types import (
    CameraIR,
    MaterialIR,
    SceneIR,
    TextureIR,
    TriangleMeshIR,
)


def import_mesh_scene(path: str) -> SceneIR:
    ext = os.path.splitext(path)[1].lower()
    if ext == ".obj":
        return load_obj(path)
    if ext == ".stl":
        return load_stl(path)
    raise ValueError(f"unsupported mesh format: {ext}")


# ----------------------------------------------------------------------------
# OBJ + MTL


def _parse_mtl(path: str, scene: SceneIR):
    """Map MTL materials to uber/matte records (AssimpImporter.cpp:75-140
    maps Phong constants the same way)."""
    if not os.path.exists(path):
        return {}
    emissive = {}
    cur = None
    with open(path, "r", errors="replace") as f:
        for line in f:
            parts = line.split()
            if not parts:
                continue
            key = parts[0]
            if key == "newmtl":
                cur = MaterialIR(name=parts[1], type="uber")
                cur.kd = np.array([0.6, 0.6, 0.6], np.float32)
                cur.ks = np.zeros(3, np.float32)
                cur.opacity = np.ones(3, np.float32)
                cur.roughness = 0.3
                scene.materials[parts[1]] = cur
                emissive[parts[1]] = None
            elif cur is None:
                continue
            elif key == "Kd":
                cur.kd = np.array([float(x) for x in parts[1:4]], np.float32)
            elif key == "Ks":
                cur.ks = np.array([float(x) for x in parts[1:4]], np.float32)
            elif key == "Ke":
                e = np.array([float(x) for x in parts[1:4]], np.float32)
                if e.max() > 0:
                    emissive[cur.name] = e
            elif key == "Ns":
                # Phong exponent -> roughness (Beckmann-style mapping)
                ns = float(parts[1])
                cur.roughness = float(np.sqrt(2.0 / (ns + 2.0)))
            elif key == "d":
                cur.opacity = np.full(3, float(parts[1]), np.float32)
            elif key == "Ni":
                cur.index = float(parts[1])
            elif key == "map_Kd":
                texname = parts[-1]
                cur.map_kd = f"__tex_{cur.name}"
                scene.textures[cur.map_kd] = TextureIR(
                    name=cur.map_kd, type="imagemap", filename=texname,
                )
    return emissive


def load_obj(path: str) -> SceneIR:
    scene = SceneIR(base_dir=os.path.dirname(os.path.abspath(path)))
    positions, normals, uvs = [], [], []
    # Faces accumulate per active material.
    by_mat: dict = {}
    current_mat = ""
    emissive_map = {}

    with open(path, "r", errors="replace") as f:
        for line in f:
            parts = line.split()
            if not parts:
                continue
            key = parts[0]
            if key == "v":
                positions.append([float(x) for x in parts[1:4]])
            elif key == "vn":
                normals.append([float(x) for x in parts[1:4]])
            elif key == "vt":
                uvs.append([float(x) for x in parts[1:3]])
            elif key == "mtllib":
                emissive_map.update(
                    _parse_mtl(os.path.join(scene.base_dir, parts[1]), scene)
                )
            elif key == "usemtl":
                current_mat = parts[1]
            elif key == "f":
                corners = []
                for vert in parts[1:]:
                    ids = vert.split("/")
                    vi = int(ids[0])
                    ti = int(ids[1]) if len(ids) > 1 and ids[1] else 0
                    ni = int(ids[2]) if len(ids) > 2 and ids[2] else 0
                    corners.append((vi, ti, ni))
                faces = by_mat.setdefault(current_mat, [])
                for k in range(1, len(corners) - 1):
                    faces.append((corners[0], corners[k], corners[k + 1]))

    positions = np.asarray(positions, np.float32)
    normals = np.asarray(normals, np.float32) if normals else None
    uvs = np.asarray(uvs, np.float32) if uvs else None

    def resolve(idx, count):
        return idx - 1 if idx > 0 else count + idx

    for mat_name, faces in by_mat.items():
        # Re-index into compact per-mesh vertex arrays.
        vert_map = {}
        v_out, n_out, uv_out, tris = [], [], [], []
        for tri in faces:
            ids = []
            for (vi, ti, ni) in tri:
                keyv = (vi, ti, ni)
                if keyv not in vert_map:
                    vert_map[keyv] = len(v_out)
                    v_out.append(positions[resolve(vi, len(positions))])
                    if normals is not None and ni:
                        n_out.append(normals[resolve(ni, len(normals))])
                    if uvs is not None and ti:
                        uv_out.append(uvs[resolve(ti, len(uvs))])
                ids.append(vert_map[keyv])
            tris.append(ids)
        mesh = TriangleMeshIR(
            indices=np.asarray(tris, np.int32),
            positions=np.asarray(v_out, np.float32),
            normals=(np.asarray(n_out, np.float32)
                     if len(n_out) == len(v_out) else None),
            uvs=(np.asarray(uv_out, np.float32)
                 if len(uv_out) == len(v_out) else None),
            material=mat_name,
        )
        e = emissive_map.get(mat_name)
        if e is not None:
            mesh.emission = e
        scene.shapes.append(mesh)

    _default_camera(scene)
    return scene


# ----------------------------------------------------------------------------
# STL


def load_stl(path: str) -> SceneIR:
    scene = SceneIR(base_dir=os.path.dirname(os.path.abspath(path)))
    with open(path, "rb") as f:
        head = f.read(5)
        f.seek(0)
        data = f.read()
    if head == b"solid" and b"facet" in data[:500]:
        tris = _parse_stl_ascii(data.decode("ascii", errors="replace"))
    else:
        (n,) = np.frombuffer(data, np.uint32, 1, offset=80)
        rec = np.frombuffer(
            data, np.dtype([("n", "<3f4"), ("v", "<9f4"), ("attr", "<u2")]),
            count=n, offset=84,
        )
        tris = rec["v"].reshape(-1, 3, 3)
    verts = tris.reshape(-1, 3).astype(np.float32)
    idx = np.arange(len(verts), dtype=np.int32).reshape(-1, 3)
    scene.materials["default"] = MaterialIR(
        name="default", type="matte", kd=np.array([0.7, 0.7, 0.7], np.float32)
    )
    scene.shapes.append(
        TriangleMeshIR(
            indices=idx, positions=verts, normals=None, uvs=None,
            material="default",
        )
    )
    _default_camera(scene)
    return scene


def _parse_stl_ascii(text: str) -> np.ndarray:
    verts = []
    for line in text.splitlines():
        parts = line.split()
        if parts and parts[0] == "vertex":
            verts.append([float(x) for x in parts[1:4]])
    return np.asarray(verts, np.float32).reshape(-1, 3, 3)


def _default_camera(scene: SceneIR):
    """Frame the scene bounds with a 3/4 view (what a viewer would do;
    the reference relies on pbrt camera frames instead)."""
    all_pts = [s.positions for s in scene.shapes if s.positions is not None]
    if not all_pts:
        return
    pts = np.concatenate(all_pts)
    lo, hi = pts.min(0), pts.max(0)
    center = (lo + hi) / 2
    radius = float(np.linalg.norm(hi - lo)) / 2 + 1e-6
    eye = center + np.array([1.0, 0.6, 1.0]) * radius * 2.2
    forward = center - eye
    forward /= np.linalg.norm(forward)
    right = np.cross(forward, [0.0, 1.0, 0.0])
    right /= np.linalg.norm(right)
    up = np.cross(right, forward)
    c2w = np.eye(4)
    c2w[:3, 0], c2w[:3, 1], c2w[:3, 2], c2w[:3, 3] = right, up, forward, eye
    scene.camera = CameraIR(type="perspective", fov=40.0, camera_to_world=c2w)
    # A sky light so untextured scans are visible.
    from tracerboy_tpu.scene.types import InfiniteLightIR

    if not scene.lights:
        scene.lights.append(
            InfiniteLightIR(mapname="", L=np.ones(3, np.float32),
                            scale=np.ones(3, np.float32))
        )
