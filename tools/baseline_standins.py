"""Procedural stand-ins for the BASELINE.json correctness configs.

The BASELINE scenes (DamagedHelmet, ABeautifulGame, TransmissionTest /
DragonDispersion / IridescenceLamp, BrainStem) are not present in this
environment, so nothing exercised their configs end-to-end (VERDICT r2
"what's weak" #5). These generators build scenes with the same FEATURE
SIGNATURE — what the render configs actually stress — from in-repo
primitives, so the benchmark matrix and goldens can run them:

  helmet.gltf    textured PBR (checker baseColor + metallic-roughness),
                 NEE+MIS against an HDR env       (DamagedHelmet role)
  game.gltf      one shared mesh instanced 16x over a board, clearcoat
                 pieces + transmission/volume glass (ABeautifulGame role)
  suite.gltf     transmission+volume-scatter / dispersion / iridescence
                 spheres                           (material-suite role)
  brainstem.gltf 2-bone skinned column with a looping rotation animation
                 (BrainStem role: skinning + refit + temporal denoise)

Usage: python tools/baseline_standins.py [--out DIR]
Then:  python -m vk_gltf_renderer_tpu.benchmark run benchmark_configs/baseline_standins.cfg
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from vk_gltf_renderer_tpu.models import Scene
from vk_gltf_renderer_tpu.models.editor import SceneEditor
from vk_gltf_renderer_tpu.models.gltf import load_model_from_json


def _empty_scene():
    sc = Scene()
    sc.load_from_model(load_model_from_json(
        {"asset": {"version": "2.0"}, "scene": 0, "scenes": [{"nodes": []}]}, []))
    return sc


def _checker_png(path, n=128, c0=(200, 60, 40), c1=(240, 230, 210)):
    from PIL import Image

    y, x = np.mgrid[0:n, 0:n]
    m = ((x // 16 + y // 16) % 2).astype(bool)
    img = np.where(m[..., None], np.array(c1, np.uint8), np.array(c0, np.uint8))
    Image.fromarray(img.astype(np.uint8)).save(path)


def make_helmet(out_dir):
    """Textured-PBR sphere on a rough plate (DamagedHelmet feature role)."""
    sc = _empty_scene()
    ed = SceneEditor(sc)
    ball = ed.add_primitive("sphere", segments=48, name="helmet")
    plate = ed.add_primitive("plane", name="plate")
    ed.set_translation(plate, [0.0, -1.1, 0.0])
    ed.set_scale(plate, [4.0, 1.0, 4.0])
    tex = os.path.join(out_dir, "helmet_baseColor.png")
    _checker_png(tex)
    m = sc.model
    m.images.append({"uri": os.path.basename(tex)})
    m.gltf.setdefault("samplers", []).append({"wrapS": 10497, "wrapT": 10497})
    m.gltf.setdefault("textures", []).append({"source": 0, "sampler": 0})
    m.materials.append({
        "name": "helmet_pbr",
        "pbrMetallicRoughness": {
            "baseColorTexture": {"index": 0},
            "metallicFactor": 0.6,
            "roughnessFactor": 0.35,
        },
    })
    m.materials.append({
        "name": "plate",
        "pbrMetallicRoughness": {"baseColorFactor": [0.3, 0.3, 0.32, 1.0],
                                 "roughnessFactor": 0.9, "metallicFactor": 0.0},
    })
    ed.set_material(ball, 0, 0)
    ed.set_material(plate, 0, 1)
    sc.parse_scene()
    p = os.path.join(out_dir, "helmet.gltf")
    sc.save(p)
    return p


def make_game(out_dir):
    """Shared-mesh instancing + clearcoat + transmission glass
    (ABeautifulGame feature role: multi-instance TLAS contract)."""
    sc = _empty_scene()
    ed = SceneEditor(sc)
    board = ed.add_primitive("plane", name="board")
    ed.set_scale(board, [4.0, 1.0, 4.0])
    piece0 = ed.add_primitive("sphere", segments=24, name="piece")
    m = sc.model
    m.materials.append({
        "name": "board",
        "pbrMetallicRoughness": {"baseColorFactor": [0.1, 0.1, 0.12, 1.0],
                                 "roughnessFactor": 0.4, "metallicFactor": 0.1},
    })
    m.materials.append({
        "name": "clearcoat_piece",
        "pbrMetallicRoughness": {"baseColorFactor": [0.7, 0.1, 0.05, 1.0],
                                 "roughnessFactor": 0.5, "metallicFactor": 0.0},
        "extensions": {"KHR_materials_clearcoat": {
            "clearcoatFactor": 1.0, "clearcoatRoughnessFactor": 0.08}},
    })
    m.materials.append({
        "name": "glass_piece",
        "pbrMetallicRoughness": {"baseColorFactor": [1.0, 1.0, 1.0, 1.0],
                                 "roughnessFactor": 0.02, "metallicFactor": 0.0},
        "extensions": {
            "KHR_materials_transmission": {"transmissionFactor": 1.0},
            "KHR_materials_ior": {"ior": 1.5},
            "KHR_materials_volume": {"thicknessFactor": 0.4,
                                     "attenuationColor": [0.8, 0.9, 1.0],
                                     "attenuationDistance": 2.0},
        },
    })
    ed.set_material(board, 0, 0)
    ed.set_material(piece0, 0, 1)
    ed.set_translation(piece0, [-1.5, 0.35, -1.5])
    ed.set_scale(piece0, [0.3, 0.3, 0.3])
    # 15 more instances of the SAME mesh (node-level instancing: the
    # BLAS-shared / renderPrimID-dedup contract, gltf_scene.cpp:2139)
    mesh_id = sc.model.nodes[piece0].get("mesh")
    for i in range(15):
        gx, gz = (i + 1) % 4, (i + 1) // 4
        nid = len(sc.model.nodes)
        sc.model.nodes.append({
            "name": f"piece_{i+1}", "mesh": mesh_id,
            "translation": [-1.5 + gx, 0.35, -1.5 + gz],
            "scale": [0.3, 0.3, 0.3],
        })
        sc.model.scenes[0]["nodes"].append(nid)
    # alternate materials: odd instances get glass. Node-level material
    # assignment is per-mesh in glTF, so clone the mesh once for glass.
    glass_mesh = dict(sc.model.meshes[mesh_id])
    glass_mesh["primitives"] = [dict(p) for p in glass_mesh["primitives"]]
    glass_mesh["primitives"][0]["material"] = 2
    sc.model.meshes.append(glass_mesh)
    for i, node in enumerate(sc.model.nodes):
        if node.get("name", "").startswith("piece_") and i % 2 == 0:
            node["mesh"] = len(sc.model.meshes) - 1
    sc.parse_scene()
    p = os.path.join(out_dir, "game.gltf")
    sc.save(p)
    return p


def make_suite(out_dir):
    """Transmission+volume-scatter / dispersion / iridescence spheres
    (TransmissionTest / DragonDispersion / IridescenceLamp roles)."""
    sc = _empty_scene()
    ed = SceneEditor(sc)
    m = sc.model
    mats = [
        {"name": "scatter_glass",
         "pbrMetallicRoughness": {"baseColorFactor": [1, 1, 1, 1],
                                  "roughnessFactor": 0.0, "metallicFactor": 0.0},
         "extensions": {
             "KHR_materials_transmission": {"transmissionFactor": 1.0},
             "KHR_materials_ior": {"ior": 1.45},
             "KHR_materials_volume": {"thicknessFactor": 1.0,
                                      "attenuationColor": [0.9, 0.6, 0.4],
                                      "attenuationDistance": 1.0},
             "KHR_materials_volume_scatter": {
                 "scatterColor": [0.6, 0.7, 0.9], "scatterDistance": 0.8,
                 "scatterAnisotropy": 0.3},
         }},
        {"name": "dispersive",
         "pbrMetallicRoughness": {"baseColorFactor": [1, 1, 1, 1],
                                  "roughnessFactor": 0.0, "metallicFactor": 0.0},
         "extensions": {
             "KHR_materials_transmission": {"transmissionFactor": 1.0},
             "KHR_materials_ior": {"ior": 1.52},
             "KHR_materials_dispersion": {"dispersion": 0.25},
         }},
        {"name": "iridescent",
         "pbrMetallicRoughness": {"baseColorFactor": [0.2, 0.2, 0.2, 1],
                                  "roughnessFactor": 0.15, "metallicFactor": 1.0},
         "extensions": {
             "KHR_materials_iridescence": {
                 "iridescenceFactor": 1.0, "iridescenceIor": 1.8,
                 "iridescenceThicknessMaximum": 500.0},
         }},
    ]
    for i, mat in enumerate(mats):
        m.materials.append(mat)
        nid = ed.add_primitive("sphere", segments=32, name=mat["name"])
        ed.set_material(nid, 0, i)
        ed.set_translation(nid, [(i - 1) * 2.4, 0.0, 0.0])
    sc.parse_scene()
    p = os.path.join(out_dir, "suite.gltf")
    sc.save(p)
    return p


def make_brainstem(out_dir):
    """2-bone skinned column + looping rotation animation (BrainStem
    role: jitted skinning + refit + temporal accumulation)."""
    # column: two stacked quads rings skinned to base/top joints
    h, r, seg = 2.0, 0.4, 16
    ang = np.linspace(0, 2 * np.pi, seg, endpoint=False)
    ring = np.stack([np.cos(ang) * r, np.zeros(seg), np.sin(ang) * r], axis=1)
    pos = np.concatenate([ring, ring + [0, h / 2, 0], ring + [0, h, 0]]).astype(np.float32)
    idx = []
    for lvl in range(2):
        b0, b1 = lvl * seg, (lvl + 1) * seg
        for i in range(seg):
            j = (i + 1) % seg
            idx += [b0 + i, b0 + j, b1 + i, b0 + j, b1 + j, b1 + i]
    idx = np.asarray(idx, np.uint16)
    w_top = np.clip(pos[:, 1] / h, 0, 1)
    joints = np.zeros((pos.shape[0], 4), np.uint16)
    joints[:, 1] = 1
    weights = np.zeros((pos.shape[0], 4), np.float32)
    weights[:, 0] = 1 - w_top
    weights[:, 1] = w_top
    ibm = np.tile(np.eye(4, dtype=np.float32), (2, 1, 1))
    ibm[1, 1, 3] = -h  # joint1 binds at the top
    ibm = ibm.transpose(0, 2, 1).copy()  # column-major on disk
    times = np.array([0.0, 1.0, 2.0], np.float32)
    s2 = float(np.sqrt(0.5))
    rots = np.array([[0, 0, 0, 1], [0, 0, s2, s2], [0, 0, 0, 1]], np.float32)

    buf = b"".join(a.tobytes() for a in (pos, idx, joints, weights, ibm, times, rots))
    views, accs, off = [], [], 0

    def add(arr, ctype, atype, **kw):
        nonlocal off
        views.append({"buffer": 0, "byteOffset": off, "byteLength": arr.nbytes})
        accs.append({"bufferView": len(views) - 1, "componentType": ctype,
                     "count": arr.shape[0], "type": atype, **kw})
        off += arr.nbytes
        return len(accs) - 1

    a_p = add(pos, 5126, "VEC3", min=pos.min(0).tolist(), max=pos.max(0).tolist())
    a_i = add(idx.reshape(-1, 1), 5123, "SCALAR")
    a_j = add(joints, 5123, "VEC4")
    a_w = add(weights, 5126, "VEC4")
    a_m = add(ibm, 5126, "MAT4")
    a_t = add(times.reshape(-1, 1), 5126, "SCALAR", min=[0.0], max=[2.0])
    a_r = add(rots, 5126, "VEC4")

    gltf = {
        "asset": {"version": "2.0"},
        "scene": 0,
        "scenes": [{"nodes": [0, 1]}],
        "nodes": [
            {"name": "column", "mesh": 0, "skin": 0},
            {"name": "j_base", "children": [2]},
            {"name": "j_top", "translation": [0, h, 0]},
        ],
        "meshes": [{"primitives": [{
            "attributes": {"POSITION": a_p, "JOINTS_0": a_j, "WEIGHTS_0": a_w},
            "indices": a_i, "material": 0}]}],
        "materials": [{"pbrMetallicRoughness": {
            "baseColorFactor": [0.75, 0.6, 0.5, 1.0], "roughnessFactor": 0.6,
            "metallicFactor": 0.0}, "doubleSided": True}],
        "skins": [{"joints": [1, 2], "inverseBindMatrices": a_m}],
        "animations": [{
            "name": "sway",
            "samplers": [{"input": a_t, "output": a_r, "interpolation": "LINEAR"}],
            "channels": [{"sampler": 0, "target": {"node": 2, "path": "rotation"}}],
        }],
        "accessors": accs,
        "bufferViews": views,
        "buffers": [{"uri": "brainstem.bin", "byteLength": len(buf)}],
    }
    import json

    with open(os.path.join(out_dir, "brainstem.bin"), "wb") as f:
        f.write(buf)
    p = os.path.join(out_dir, "brainstem.gltf")
    with open(p, "w") as f:
        json.dump(gltf, f)
    return p


GENERATORS = {
    "helmet": make_helmet,
    "game": make_game,
    "suite": make_suite,
    "brainstem": make_brainstem,
}


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/baseline_standins")
    ap.add_argument("--only", default=None)
    args = ap.parse_args(argv)
    os.makedirs(args.out, exist_ok=True)
    for name, gen in GENERATORS.items():
        if args.only and name != args.only:
            continue
        p = gen(args.out)
        print(f"{name}: {p}", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
