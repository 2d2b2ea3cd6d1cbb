"""Builder for the production-shaped golden asset: a SciFiHelmet-like GLB
(multi-primitive, full PBR texture set, TRS node hierarchy) written through
io.gltf.write_glb_multi so the writer is exercised end-to-end against the
loader (reference ingest: SceneManager.cpp:195-459; asset shape:
reference README.md:44)."""

from __future__ import annotations

import io as _io

import numpy as np


def _png(arr_u8):
    from PIL import Image

    buf = _io.BytesIO()
    Image.fromarray(arr_u8).save(buf, format="PNG")
    return buf.getvalue()


def _textures(rng, n=96):
    base = (rng.uniform(0.1, 0.9, (n, n, 4)) * 255).astype(np.uint8)
    base[..., 3] = 255
    nrm = np.zeros((n, n, 3), np.uint8)
    nrm[..., 0] = (rng.uniform(0.4, 0.6, (n, n)) * 255).astype(np.uint8)
    nrm[..., 1] = (rng.uniform(0.4, 0.6, (n, n)) * 255).astype(np.uint8)
    nrm[..., 2] = 230
    mr = np.zeros((n, n, 3), np.uint8)
    mr[..., 1] = (rng.uniform(0.2, 0.8, (n, n)) * 255).astype(np.uint8)
    mr[..., 2] = (rng.uniform(0.0, 1.0, (n, n)) * 255).astype(np.uint8)
    return _png(base), _png(nrm), _png(mr)


def _uv_sphere(rows, cols, radius=1.0):
    th = np.linspace(0.12, np.pi - 0.12, rows + 1)
    ph = np.linspace(0.0, 2 * np.pi, cols + 1)
    tg, pg = np.meshgrid(th, ph, indexing="ij")
    x = radius * np.sin(tg) * np.cos(pg)
    y = radius * np.cos(tg)
    z = radius * np.sin(tg) * np.sin(pg)
    verts = np.stack([x, y, z], -1).reshape(-1, 3).astype(np.float32)
    normals = verts / np.linalg.norm(verts, axis=-1, keepdims=True)
    uvs = np.stack(
        [pg / (2 * np.pi), tg / np.pi], -1
    ).reshape(-1, 2).astype(np.float32)
    idx = []
    for i in range(rows):
        for j in range(cols):
            a = i * (cols + 1) + j
            b = (i + 1) * (cols + 1) + j
            idx.append([a, b, b + 1])
            idx.append([a, b + 1, a + 1])
    return verts, normals.astype(np.float32), uvs, np.asarray(idx, np.uint32)


def _ring(segs, r0=1.05, r1=1.25, y=0.0):
    ph = np.linspace(0, 2 * np.pi, segs + 1)
    inner = np.stack([r0 * np.cos(ph), np.full_like(ph, y), r0 * np.sin(ph)], -1)
    outer = np.stack([r1 * np.cos(ph), np.full_like(ph, y), r1 * np.sin(ph)], -1)
    verts = np.concatenate([inner, outer]).astype(np.float32)
    normals = np.broadcast_to(
        np.asarray([0, 1, 0], np.float32), verts.shape
    ).copy()
    uvs = np.concatenate([
        np.stack([ph / (2 * np.pi), np.zeros_like(ph)], -1),
        np.stack([ph / (2 * np.pi), np.ones_like(ph)], -1),
    ]).astype(np.float32)
    n = segs + 1
    idx = []
    for j in range(segs):
        idx.append([j, n + j, n + j + 1])
        idx.append([j, n + j + 1, j + 1])
    return verts, normals, uvs, np.asarray(idx, np.uint32)


def _visor(nx=8, ny=6):
    xs = np.linspace(-0.6, 0.6, nx + 1)
    ys = np.linspace(-0.3, 0.3, ny + 1)
    xg, yg = np.meshgrid(xs, ys, indexing="ij")
    verts = np.stack([xg, yg, np.full_like(xg, 0.0)], -1).reshape(-1, 3)
    normals = np.broadcast_to(
        np.asarray([0, 0, 1.0], np.float32), verts.shape
    ).copy()
    uvs = np.stack(
        [(xg + 0.6) / 1.2, (yg + 0.3) / 0.6], -1
    ).reshape(-1, 2)
    idx = []
    for i in range(nx):
        for j in range(ny):
            a = i * (ny + 1) + j
            b = (i + 1) * (ny + 1) + j
            idx.append([a, b, b + 1])
            idx.append([a, b + 1, a + 1])
    return (verts.astype(np.float32), normals.astype(np.float32),
            uvs.astype(np.float32), np.asarray(idx, np.uint32))


def build_helmet_glb(path, tri_scale=1):
    """Write the golden GLB; returns expected triangle count.
    tri_scale > 1 scales the sphere tessellation (for the production-scale
    bench config: tri_scale=8 -> ~100k triangles)."""
    from mesh2splat_tpu.io.gltf import write_glb_multi

    rng = np.random.default_rng(42)
    prims = []
    total_tris = 0
    for build, trs in (
        (lambda: _uv_sphere(24 * tri_scale, 36 * tri_scale),
         dict(translation=[0, 0.1, 0], scale=[1, 1.1, 1])),
        (lambda: _ring(48 * tri_scale),
         dict(rotation=[0.0, 0.0, 0.2588190451, 0.96592582629],  # 30deg roll
              translation=[0, -0.2, 0])),
        (lambda: _visor(8 * tri_scale, 6 * tri_scale),
         dict(translation=[0, 0.1, 1.02])),
    ):
        verts, normals, uvs, idx = build()
        b, n, m = _textures(rng)
        prims.append(dict(
            positions=verts, normals=normals, uvs=uvs, indices=idx,
            base_color_png=b, normal_png=n, metallic_roughness_png=m,
            base_color_factor=[1.0, 0.95, 0.9, 1.0],
            metallic_factor=1.0, roughness_factor=1.0,
        ))
        total_tris += idx.shape[0]
    write_glb_multi(path, prims, node_trs=[p for _, p in (
        (0, dict(translation=[0, 0.1, 0], scale=[1, 1.1, 1])),
        (1, dict(rotation=[0.0, 0.0, 0.2588190451, 0.96592582629],
                 translation=[0, -0.2, 0])),
        (2, dict(translation=[0, 0.1, 1.02])),
    )])
    return total_tris
