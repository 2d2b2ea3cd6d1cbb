"""GLB loader tests: round trip through our writer, transform bake, fallbacks
(SURVEY.md section 4 item 2)."""

import io as _io

import numpy as np
import pytest

from mesh2splat_tpu.io import gltf


def quad_geometry():
    pos = np.array([[0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0]], np.float32)
    idx = np.array([[0, 1, 2], [0, 2, 3]], np.uint32)
    nrm = np.broadcast_to([0, 0, 1.0], (4, 3)).astype(np.float32).copy()
    uv = pos[:, :2].copy()
    tan = np.broadcast_to([1, 0, 0, 1.0], (4, 4)).astype(np.float32).copy()
    return pos, idx, nrm, uv, tan


def test_roundtrip_full_attributes(tmp_path):
    pos, idx, nrm, uv, tan = quad_geometry()
    p = tmp_path / "quad.glb"
    gltf.write_glb(p, pos, idx, normals=nrm, uvs=uv, tangents=tan,
                   base_color_factor=(0.5, 0.6, 0.7, 1.0),
                   metallic_factor=0.3, roughness_factor=0.9)
    prims = gltf.load_glb(p)
    assert len(prims) == 1
    pr = prims[0]
    assert pr.num_triangles == 2
    np.testing.assert_allclose(pr.tri_pos, pos[idx], atol=1e-6)
    np.testing.assert_allclose(pr.tri_normal, nrm[idx], atol=1e-6)
    np.testing.assert_allclose(pr.tri_uv, uv[idx], atol=1e-6)
    np.testing.assert_allclose(pr.tri_tangent, tan[idx], atol=1e-6)
    np.testing.assert_allclose(pr.base_color_factor, [0.5, 0.6, 0.7, 1.0])
    assert pr.metallic_factor == pytest.approx(0.3)
    assert pr.roughness_factor == pytest.approx(0.9)


def test_node_transform_bake(tmp_path):
    """World transform applied to positions; normal matrix to normals
    (SceneManager.cpp:290, :397-400)."""
    pos, idx, nrm, uv, tan = quad_geometry()
    m = np.eye(4, dtype=np.float32)
    m[:3, :3] = np.diag([2.0, 3.0, 1.0])  # nonuniform scale
    m[:3, 3] = [10, 20, 30]
    p = tmp_path / "scaled.glb"
    gltf.write_glb(p, pos, idx, normals=nrm, uvs=uv, node_matrix=m)
    pr = gltf.load_glb(p)[0]
    expected = pos[idx] * np.array([2, 3, 1]) + np.array([10, 20, 30])
    np.testing.assert_allclose(pr.tri_pos, expected, atol=1e-5)
    # +Z normal survives nonuniform XY scale after normal-matrix transform
    np.testing.assert_allclose(pr.tri_normal, nrm[idx], atol=1e-6)


def test_flat_normal_fallback(tmp_path):
    pos, idx, _, uv, _ = quad_geometry()
    p = tmp_path / "nonorm.glb"
    gltf.write_glb(p, pos, idx, uvs=uv)
    pr = gltf.load_glb(p)[0]
    np.testing.assert_allclose(
        pr.tri_normal, np.broadcast_to([0, 0, 1.0], (2, 3, 3)), atol=1e-6
    )


def test_tangent_fallback(tmp_path):
    """UV-derived per-face tangent (SceneManager.cpp:424-451): for UV == XY,
    tangent = +X with handedness +1."""
    pos, idx, nrm, uv, _ = quad_geometry()
    p = tmp_path / "notan.glb"
    gltf.write_glb(p, pos, idx, normals=nrm, uvs=uv)
    pr = gltf.load_glb(p)[0]
    np.testing.assert_allclose(
        pr.tri_tangent, np.broadcast_to([1, 0, 0, 1.0], (2, 3, 4)), atol=1e-5
    )


def test_texture_decode(tmp_path):
    from PIL import Image

    pos, idx, nrm, uv, tan = quad_geometry()
    tex = np.zeros((8, 8, 4), np.uint8)
    tex[..., 0] = np.arange(8)[:, None] * 32
    tex[..., 3] = 255
    buf = _io.BytesIO()
    Image.fromarray(tex).save(buf, format="PNG")
    p = tmp_path / "tex.glb"
    gltf.write_glb(p, pos, idx, normals=nrm, uvs=uv, base_color_png=buf.getvalue())
    pr = gltf.load_glb(p)[0]
    assert pr.base_color_tex is not None
    assert pr.base_color_tex.shape == (8, 8, 4)
    np.testing.assert_allclose(pr.base_color_tex * 255, tex, atol=0.5)


def test_glb_conversion_end_to_end(tmp_path):
    """GLB -> device pytrees -> conversion -> splats (the reference's
    LoadModel -> conversion call stack, SURVEY.md 3.2)."""
    import jax.numpy as jnp
    from mesh2splat_tpu.ops.conversion import ConversionConfig, convert

    pos, idx, nrm, uv, tan = quad_geometry()
    p = tmp_path / "e2e.glb"
    gltf.write_glb(p, pos, idx, normals=nrm, uvs=uv, tangents=tan)
    pr = gltf.load_glb(p)[0]
    mesh, mat = gltf.to_device(pr)
    lo, hi = pr.bbox()
    cfg = ConversionConfig(resolution=32, layers=3)
    sp = convert(mesh, mat, jnp.asarray(lo), jnp.asarray(hi), cfg)
    assert int(sp.count()) == 32 * 32
