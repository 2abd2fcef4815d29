"""Generate the checked-in real-exporter-shaped glTF fixture
(tests/fixtures/textured_box/) — VERDICT r2 task 7.

The loader's own tests otherwise run on self-generated JSON; this fixture
exercises the export-style surface of `scene/gltf.py` the way fastgltf
sees real assets (`/root/reference/src/vk_loader.cpp:227-518`):

- EXTERNAL binary buffer (`scene.bin` URI), not a data URI
- interleaved vertex attributes with byteStride (pos | normal | uv, 32 B)
- a second, tightly-packed (stride-free) mesh in the same buffer
- uint16 indices
- PNG image URIs (one opaque checker, one leaf texture with alpha holes)
- two materials: OPAQUE metallic-roughness and alphaMode MASK
- node hierarchy with BOTH a matrix transform and a TRS transform

Run from the repo root:  python tools/make_gltf_fixture.py
Commit the generated files; tests/test_gltf_fixture.py loads and renders
them against a golden.
"""

from __future__ import annotations

import json
import os
import struct
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

OUT = os.path.join(os.path.dirname(__file__), "..", "tests", "fixtures",
                   "textured_box")


def box_geometry(size=1.0):
    """24-vertex box (4 per face, correct normals), CCW winding."""
    s = size / 2.0
    faces = [
        (( 0,  0,  1), (-s, -s,  s), ( s, -s,  s), ( s,  s,  s), (-s,  s,  s)),
        (( 0,  0, -1), ( s, -s, -s), (-s, -s, -s), (-s,  s, -s), ( s,  s, -s)),
        (( 1,  0,  0), ( s, -s,  s), ( s, -s, -s), ( s,  s, -s), ( s,  s,  s)),
        ((-1,  0,  0), (-s, -s, -s), (-s, -s,  s), (-s,  s,  s), (-s,  s, -s)),
        (( 0,  1,  0), (-s,  s,  s), ( s,  s,  s), ( s,  s, -s), (-s,  s, -s)),
        (( 0, -1,  0), (-s, -s, -s), ( s, -s, -s), ( s, -s,  s), (-s, -s,  s)),
    ]
    pos, nrm, uv, idx = [], [], [], []
    for f, (n, *corners) in enumerate(faces):
        base = 4 * f
        for k, c in enumerate(corners):
            pos.append(c)
            nrm.append(n)
            uv.append([(0, 0), (1, 0), (1, 1), (0, 1)][k])
        idx += [base, base + 1, base + 2, base, base + 2, base + 3]
    return (np.array(pos, np.float32), np.array(nrm, np.float32),
            np.array(uv, np.float32), np.array(idx, np.uint16))


def quad_geometry(w=2.0, h=2.0):
    s, t = w / 2.0, h
    pos = np.array([[-s, 0, 0], [s, 0, 0], [s, t, 0], [-s, t, 0]], np.float32)
    nrm = np.tile(np.array([0, 0, 1], np.float32), (4, 1))
    uv = np.array([[0, 1], [1, 1], [1, 0], [0, 0]], np.float32)
    idx = np.array([0, 1, 2, 0, 2, 3], np.uint16)
    return pos, nrm, uv, idx


def checker_png(path, n=64, a=(190, 120, 60, 255), b=(60, 40, 25, 255)):
    from vk_renderer_tpu.utils.image import save_png
    yy, xx = np.meshgrid(np.arange(n), np.arange(n), indexing="ij")
    cells = ((xx // 8 + yy // 8) % 2).astype(bool)
    img = np.where(cells[..., None], np.array(a, np.uint8),
                   np.array(b, np.uint8))
    save_png(path, img.astype(np.uint8))


def leaf_png(path, n=64):
    """Green blob with alpha holes — exercises MASK discard."""
    from vk_renderer_tpu.utils.image import save_png
    yy, xx = np.meshgrid(np.linspace(-1, 1, n), np.linspace(-1, 1, n),
                         indexing="ij")
    r = np.sqrt(xx ** 2 + yy ** 2)
    alpha = (r < 0.85).astype(np.uint8) * 255
    # punch deterministic holes
    holes = (np.sin(xx * 9.3) * np.cos(yy * 7.1)) > 0.55
    alpha[holes] = 0
    g = (120 + 80 * np.cos(r * 4)).clip(0, 255).astype(np.uint8)
    img = np.stack([np.full_like(g, 30), g, np.full_like(g, 40), alpha], -1)
    save_png(path, img)


def main():
    os.makedirs(OUT, exist_ok=True)
    checker_png(os.path.join(OUT, "checker.png"))
    leaf_png(os.path.join(OUT, "leaf.png"))

    bpos, bnrm, buv, bidx = box_geometry()
    qpos, qnrm, quv, qidx = quad_geometry()

    # buffer layout:
    #   [0]  box interleaved  (pos f32x3 | nrm f32x3 | uv f32x2) x 24, stride 32
    #   [a]  box indices u16
    #   [b]  quad pos / nrm / uv tightly packed
    #   [c]  quad indices u16
    inter = np.concatenate([bpos, bnrm, buv], axis=1).astype(np.float32)
    blob = bytearray(inter.tobytes())

    def align(n=4):
        while len(blob) % n:
            blob.append(0)

    o_bidx = len(blob); blob += bidx.tobytes(); align()
    o_qpos = len(blob); blob += qpos.tobytes(); align()
    o_qnrm = len(blob); blob += qnrm.tobytes(); align()
    o_quv = len(blob); blob += quv.tobytes(); align()
    o_qidx = len(blob); blob += qidx.tobytes(); align()

    with open(os.path.join(OUT, "scene.bin"), "wb") as f:
        f.write(bytes(blob))

    FLOAT, USHORT = 5126, 5123
    ARRAY, ELEMENT = 34962, 34963
    gltf = {
        "asset": {"version": "2.0", "generator": "vk_renderer_tpu fixture"},
        "scene": 0,
        "scenes": [{"nodes": [0]}],
        "nodes": [
            # root: MATRIX transform (scale 1, translate y=+0.5)
            {"matrix": [1, 0, 0, 0,  0, 1, 0, 0,  0, 0, 1, 0,  0, 0.5, 0, 1],
             "children": [1, 2]},
            # box child: TRS
            {"mesh": 0, "translation": [0, 0, -4],
             "rotation": [0.0, 0.3826834, 0.0, 0.9238795],   # 45 deg yaw
             "scale": [1.2, 1.2, 1.2]},
            # leaf quad child
            {"mesh": 1, "translation": [1.2, -0.5, -3.0]},
        ],
        "meshes": [
            {"name": "box", "primitives": [{
                "attributes": {"POSITION": 0, "NORMAL": 1, "TEXCOORD_0": 2},
                "indices": 3, "material": 0}]},
            {"name": "leaf", "primitives": [{
                "attributes": {"POSITION": 4, "NORMAL": 5, "TEXCOORD_0": 6},
                "indices": 7, "material": 1}]},
        ],
        "materials": [
            {"name": "checker_opaque",
             "pbrMetallicRoughness": {
                 "baseColorTexture": {"index": 0},
                 "metallicFactor": 0.1, "roughnessFactor": 0.8}},
            {"name": "leaf_mask", "alphaMode": "MASK", "alphaCutoff": 0.5,
             "doubleSided": True,
             "pbrMetallicRoughness": {
                 "baseColorTexture": {"index": 1},
                 "metallicFactor": 0.0, "roughnessFactor": 1.0}},
        ],
        "textures": [{"source": 0, "sampler": 0}, {"source": 1, "sampler": 0}],
        "images": [{"uri": "checker.png"}, {"uri": "leaf.png"}],
        "samplers": [{"magFilter": 9729, "minFilter": 9987,
                      "wrapS": 10497, "wrapT": 10497}],
        "buffers": [{"uri": "scene.bin", "byteLength": len(blob)}],
        "bufferViews": [
            {"buffer": 0, "byteOffset": 0, "byteLength": inter.nbytes,
             "byteStride": 32, "target": ARRAY},                       # 0 interleaved
            {"buffer": 0, "byteOffset": o_bidx, "byteLength": bidx.nbytes,
             "target": ELEMENT},                                       # 1
            {"buffer": 0, "byteOffset": o_qpos, "byteLength": qpos.nbytes,
             "target": ARRAY},                                         # 2
            {"buffer": 0, "byteOffset": o_qnrm, "byteLength": qnrm.nbytes,
             "target": ARRAY},                                         # 3
            {"buffer": 0, "byteOffset": o_quv, "byteLength": quv.nbytes,
             "target": ARRAY},                                         # 4
            {"buffer": 0, "byteOffset": o_qidx, "byteLength": qidx.nbytes,
             "target": ELEMENT},                                       # 5
        ],
        "accessors": [
            {"bufferView": 0, "byteOffset": 0, "componentType": FLOAT,
             "count": 24, "type": "VEC3",
             "min": bpos.min(0).tolist(), "max": bpos.max(0).tolist()},  # 0 pos
            {"bufferView": 0, "byteOffset": 12, "componentType": FLOAT,
             "count": 24, "type": "VEC3"},                               # 1 nrm
            {"bufferView": 0, "byteOffset": 24, "componentType": FLOAT,
             "count": 24, "type": "VEC2"},                               # 2 uv
            {"bufferView": 1, "componentType": USHORT, "count": int(bidx.size),
             "type": "SCALAR"},                                          # 3 idx
            {"bufferView": 2, "componentType": FLOAT, "count": 4,
             "type": "VEC3", "min": qpos.min(0).tolist(),
             "max": qpos.max(0).tolist()},                               # 4
            {"bufferView": 3, "componentType": FLOAT, "count": 4,
             "type": "VEC3"},                                            # 5
            {"bufferView": 4, "componentType": FLOAT, "count": 4,
             "type": "VEC2"},                                            # 6
            {"bufferView": 5, "componentType": USHORT, "count": int(qidx.size),
             "type": "SCALAR"},                                          # 7
        ],
    }
    with open(os.path.join(OUT, "scene.gltf"), "w") as f:
        json.dump(gltf, f, indent=1)
    print(f"wrote fixture to {OUT} ({len(blob)} B buffer)")


if __name__ == "__main__":
    main()
