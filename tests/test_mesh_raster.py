"""Mesh rasterizer (depth prepass + mesh G-buffer) tests."""

import numpy as np
import jax.numpy as jnp

from mesh2splat_tpu.types import Material, TriangleMesh, make_camera
from mesh2splat_tpu.render.mesh_raster import rasterize_mesh


def quad(z=0.0, size=0.5):
    v = np.array(
        [[-size, -size, z], [size, -size, z], [size, size, z], [-size, size, z]],
        np.float32,
    )
    tris = np.array([[0, 1, 2], [0, 2, 3]])
    return TriangleMesh(
        tri_pos=jnp.asarray(v[tris]),
        tri_normal=jnp.asarray(np.broadcast_to([0, 0, 1.0], (2, 3, 3)).copy().astype(np.float32)),
        tri_tangent=jnp.asarray(np.broadcast_to([1, 0, 0, 1.0], (2, 3, 4)).copy().astype(np.float32)),
        tri_uv=jnp.asarray((v[tris][..., :2] / (2 * size) + 0.5).copy()),
    )


def cam(eye=(0, 0, 2)):
    return make_camera(eye=list(eye), center=[0, 0, 0], up=[0, 1, 0],
                       fov_y_rad=np.pi / 3, width=64, height=64)


def test_coverage_and_depth():
    g, depth = rasterize_mesh(quad(), Material.default(), cam(), 64, 64)
    alb = np.asarray(g["albedo"])
    # center covered, corners not
    assert alb[32, 32, 3] == 1.0
    assert alb[1, 1, 3] == 0.0
    d = np.asarray(depth)
    assert d[32, 32] < 1.0 and d[1, 1] == 1.0
    # view depth = 2.0 at the quad plane
    np.testing.assert_allclose(np.asarray(g["depth"])[32, 32, 0], 2.0, atol=1e-3)
    # encoded +Z normal
    np.testing.assert_allclose(
        np.asarray(g["normal"])[32, 32, :3], [0.5, 0.5, 1.0], atol=1e-4
    )
    # position interpolation: center pixel ~ (0, 0, 0)
    np.testing.assert_allclose(np.asarray(g["position"])[32, 32, :3], 0.0, atol=0.05)


def test_z_buffer_two_quads():
    """Nearer quad wins the z-test."""
    q1 = quad(z=0.0)
    q2 = quad(z=0.5, size=0.25)  # nearer to the camera at z=2
    mesh = TriangleMesh(
        tri_pos=jnp.concatenate([q1.tri_pos, q2.tri_pos]),
        tri_normal=jnp.concatenate([q1.tri_normal, q2.tri_normal]),
        tri_tangent=jnp.concatenate([q1.tri_tangent, q2.tri_tangent]),
        tri_uv=jnp.concatenate([q1.tri_uv, q2.tri_uv]),
    )
    g, _ = rasterize_mesh(mesh, Material.default(), cam(), 64, 64)
    # center shows the nearer quad (view depth 1.5)
    np.testing.assert_allclose(np.asarray(g["depth"])[32, 32, 0], 1.5, atol=1e-3)
    # off-center inside big quad but outside small one: depth 2.0
    np.testing.assert_allclose(np.asarray(g["depth"])[32, 42, 0], 2.0, atol=1e-3)


def test_opaque_only_excludes_transparent():
    m = Material.default()
    m2 = Material(
        base_color_factor=jnp.asarray([1.0, 1, 1, 0.5]),
        metallic_factor=m.metallic_factor, roughness_factor=m.roughness_factor,
        base_color=m.base_color, normal=m.normal,
        metallic_roughness=m.metallic_roughness,
    )
    _, depth = rasterize_mesh(quad(), m2, cam(), 64, 64, opaque_only=True)
    assert np.all(np.asarray(depth) == 1.0)  # transparent mesh skipped


def test_render_modes_g15():
    """Per-mode mesh coloring parity (meshRenderPS.glsl:72-86): the albedo
    target carries the mode visualization so split-screen compares
    like-for-like in every mode."""
    from mesh2splat_tpu.types import RenderMode, exponential_depth

    m = quad()
    c = cam()
    outs = {
        mode: np.asarray(
            rasterize_mesh(m, Material.default(), c, 64, 64,
                           render_mode=mode)[0]["albedo"]
        )
        for mode in RenderMode
    }

    center = (32, 32)
    # ALBEDO / PBR / FINAL: base color (default material = white)
    for mode in (RenderMode.ALBEDO, RenderMode.PBR, RenderMode.FINAL):
        np.testing.assert_allclose(outs[mode][center][:3], 1.0, atol=1e-6)

    # DEPTH: exponential view depth (quad plane at view depth 2.0)
    expd = float(exponential_depth(jnp.asarray(2.0), c.near, c.far))
    np.testing.assert_allclose(outs[RenderMode.DEPTH][center][:3], expd,
                               atol=1e-3)

    # NORMAL: encoded +Z normal = (0.5, 0.5, 1.0)
    np.testing.assert_allclose(outs[RenderMode.NORMAL][center][:3],
                               [0.5, 0.5, 1.0], atol=1e-3)

    # GEOMETRY: constant within a triangle, different across the two
    geo = outs[RenderMode.GEOMETRY]
    c0 = geo[44, 40][:3]   # below the BL->TR diagonal = triangle 0
    c1 = geo[20, 24][:3]   # above the diagonal = triangle 1
    assert (geo[..., :3] >= 0).all() and (geo[..., :3] < 1).all()
    np.testing.assert_allclose(geo[40, 44][:3], c0, atol=1e-6)
    assert np.abs(c0 - c1).max() > 1e-3

    # OVERDRAW: the constant overdraw fragment color
    np.testing.assert_allclose(outs[RenderMode.OVERDRAW][center][:3],
                               [0.01, 0.005, 0.0], atol=1e-6)

    # background stays zero in all modes
    for mode in RenderMode:
        assert outs[mode][1, 1, 3] == 0.0


def test_mesh_normal_mapping():
    """has_normal materials perturb the G-buffer normal through the
    interpolated TBN (meshRenderPS.glsl:43-52)."""
    mat = Material.default()
    import dataclasses

    # map pointing along tangent-space +X => world +X for the +Z quad
    nmap = np.zeros((1, 1, 3), np.float32)
    nmap[..., 0] = 1.0   # r=1 -> x=+1
    nmap[..., 1] = 0.5   # g=.5 -> y=0
    nmap[..., 2] = 0.5   # b=.5 -> z=0
    mat = dataclasses.replace(mat, normal=jnp.asarray(nmap), has_normal=True)
    g, _ = rasterize_mesh(quad(), mat, cam(), 64, 64)
    enc = np.asarray(g["normal"])[32, 32, :3]
    # encoded +X normal = (1.0, 0.5, 0.5)
    np.testing.assert_allclose(enc, [1.0, 0.5, 0.5], atol=2e-2)
