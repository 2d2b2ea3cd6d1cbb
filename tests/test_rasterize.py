"""Forward rasterizer semantics vs the reference's compositing rules
(SURVEY.md section 4 test item 3): sorted "under" blending, premultiplied
G-buffer, EWA projection."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mesh2splat_tpu.types import (
    Camera,
    RenderMode,
    SplatFormat,
    Splats,
    make_camera,
)
from mesh2splat_tpu.ops.projection import project_splats
from mesh2splat_tpu.render.rasterize import rasterize_dense

W = H = 64


def make_cam():
    return make_camera(
        eye=[0, 0, 5], center=[0, 0, 0], up=[0, 1, 0],
        fov_y_rad=np.pi / 3, width=W, height=H, near=0.1, far=100.0,
    )


def make_splats(pos, color, scale=0.1, quat=None, n_pad=0):
    pos = np.atleast_2d(np.asarray(pos, np.float32))
    color = np.atleast_2d(np.asarray(color, np.float32))
    n = pos.shape[0]
    if quat is None:
        quat = np.tile([1.0, 0, 0, 0], (n, 1)).astype(np.float32)
    scale_arr = np.full((n, 3), scale, np.float32)
    total = n + n_pad
    return Splats(
        pos=jnp.asarray(np.pad(pos, ((0, n_pad), (0, 0)))),
        color=jnp.asarray(np.pad(color, ((0, n_pad), (0, 0)))),
        scale=jnp.asarray(np.pad(scale_arr, ((0, n_pad), (0, 0)))),
        normal=jnp.asarray(
            np.pad(np.tile([0, 0, 1.0], (n, 1)), ((0, n_pad), (0, 0))).astype(np.float32)
        ),
        quat=jnp.asarray(np.pad(quat, ((0, n_pad), (0, 0)))),
        pbr=jnp.asarray(np.pad(np.tile([0.3, 0.6], (n, 1)), ((0, n_pad), (0, 0))).astype(np.float32)),
        valid=jnp.asarray(np.arange(total) < n),
    )


def render(splats, mode=RenderMode.ALBEDO):
    cam = make_cam()
    proj = project_splats(
        splats, cam, std_dev=1.0, render_mode=mode,
        splat_format=SplatFormat.PLY_3DGS, has_pbr=True,
    )
    return proj, rasterize_dense(proj, W, H, render_mode=mode)


def expected_center_gaussian(scale, z_dist, alpha):
    """Analytic alpha*g at the 4 center pixels for an isotropic splat at the
    image center: cov2d = (f*s/z)^2 + 0.3, d = (0.5, 0.5)."""
    f = (1.0 / np.tan(np.pi / 6)) * H / 2  # P11 * H/2
    var = (f * scale / z_dist) ** 2 + 0.3
    g = np.exp(-0.5 * (0.5**2 + 0.5**2) / var)
    return alpha * g


def test_single_splat_center_symmetry_and_value():
    sp = make_splats([0, 0, 0], [1, 0, 0, 0.8], scale=0.1)
    proj, out = render(sp)
    assert bool(proj.valid[0])
    a = np.asarray(out["albedo"])
    # image center (32, 32) is a pixel corner: 4-fold symmetry
    c = a[31:33, 31:33, 3]
    np.testing.assert_allclose(c, c[0, 0], rtol=1e-5)
    np.testing.assert_allclose(
        c[0, 0], expected_center_gaussian(0.1, 5.0, 0.8), rtol=1e-4
    )
    # premultiplied red
    np.testing.assert_allclose(a[31, 31, 0], c[0, 0], rtol=1e-5)
    np.testing.assert_allclose(a[31, 31, 1], 0.0, atol=1e-7)


def test_under_compositing_two_splats():
    """Front (red, a=0.5) at z=1, back (blue, a=0.9) at z=0: under operator
    gives c = a_f*g_f*red + (1 - a_f*g_f)*a_b*g_b*blue at the center."""
    sp = make_splats(
        [[0, 0, 1.0], [0, 0, 0.0]],
        [[1, 0, 0, 0.5], [0, 0, 1, 0.9]],
        scale=0.2,
    )
    _, out = render(sp)
    a = np.asarray(out["albedo"])
    ag_f = expected_center_gaussian(0.2, 4.0, 0.5)
    ag_b = expected_center_gaussian(0.2, 5.0, 0.9)
    np.testing.assert_allclose(a[31, 31, 0], ag_f, rtol=1e-4)
    np.testing.assert_allclose(a[31, 31, 2], (1 - ag_f) * ag_b, rtol=1e-4)
    np.testing.assert_allclose(a[31, 31, 3], ag_f + (1 - ag_f) * ag_b, rtol=1e-4)


def test_order_invariance():
    """Input order must not matter — the rasterizer sorts by depth (the
    reference's radix-sort invariant, radixSortPrepass.glsl:29-32)."""
    rng = np.random.default_rng(0)
    pos = rng.uniform(-0.5, 0.5, (20, 3)).astype(np.float32)
    col = rng.uniform(0.1, 1.0, (20, 4)).astype(np.float32)
    sp1 = make_splats(pos, col, scale=0.15)
    perm = rng.permutation(20)
    sp2 = make_splats(pos[perm], col[perm], scale=0.15)
    _, o1 = render(sp1)
    _, o2 = render(sp2)
    np.testing.assert_allclose(
        np.asarray(o1["albedo"]), np.asarray(o2["albedo"]), atol=1e-5
    )


def test_alpha_bounded():
    rng = np.random.default_rng(1)
    pos = rng.uniform(-0.3, 0.3, (50, 3)).astype(np.float32)
    col = rng.uniform(0.5, 1.0, (50, 4)).astype(np.float32)
    sp = make_splats(pos, col, scale=0.3)
    _, out = render(sp)
    a = np.asarray(out["albedo"])[..., 3]
    assert a.max() <= 1.0 + 1e-5
    t = np.asarray(out["transmittance"])
    np.testing.assert_allclose(t, 1.0 - a, atol=1e-5)


def test_invalid_splats_ignored():
    sp = make_splats([0, 0, 0], [1, 1, 1, 1.0], scale=0.2, n_pad=10)
    _, o1 = render(sp)
    sp2 = make_splats([0, 0, 0], [1, 1, 1, 1.0], scale=0.2)
    _, o2 = render(sp2)
    np.testing.assert_allclose(
        np.asarray(o1["albedo"]), np.asarray(o2["albedo"]), atol=1e-6
    )


def test_frustum_cull():
    sp = make_splats([[0, 0, 0], [100, 0, 0], [0, 0, 50]],
                     [[1, 0, 0, 1]] * 3, scale=0.1)
    proj, _ = render(sp)
    v = np.asarray(proj.valid)
    assert v[0] and not v[1] and not v[2]


def test_gbuffer_channels():
    sp = make_splats([0.2, -0.1, 0.3], [0.9, 0.5, 0.2, 1.0], scale=0.15)
    _, out = render(sp)
    pos_buf = np.asarray(out["position"])
    mr = np.asarray(out["metal_rough"])
    nr = np.asarray(out["normal"])
    dep = np.asarray(out["depth"])
    # at the splat's brightest pixel, ws position / pbr recoverable by
    # dividing by the g-accumulation channel
    ij = np.unravel_index(np.argmax(pos_buf[..., 3]), pos_buf[..., 3].shape)
    g = pos_buf[ij][3]
    assert g > 0.1
    np.testing.assert_allclose(pos_buf[ij][:3] / g, [0.2, -0.1, 0.3], atol=1e-5)
    np.testing.assert_allclose(mr[ij][:2] / mr[ij][3], [0.3, 0.6], atol=1e-5)
    # encoded +Z normal = (0.5, 0.5, 1.0); depth rgb = view depth * g
    a_acc = np.asarray(out["albedo"])[ij][3]
    np.testing.assert_allclose(nr[ij][:3] / g, [0.5, 0.5, 1.0], atol=1e-4)
    np.testing.assert_allclose(dep[ij][0] / g, 5.0 - 0.3, atol=1e-3)


def test_overdraw_mode():
    sp = make_splats([[0, 0, 0], [0, 0, 0.5]], [[1, 0, 0, 1]] * 2, scale=0.2)
    _, out = render(sp, mode=RenderMode.OVERDRAW)
    a = np.asarray(out["albedo"])
    # additive: center covered by both splats -> exactly 2 * 0.01 in red
    np.testing.assert_allclose(a[31, 31, 0], 0.02, atol=1e-6)
    np.testing.assert_allclose(a[31, 31, 1], 0.01, atol=1e-6)


def test_rasterizer_differentiable():
    def loss(dx):
        sp = make_splats([0, 0, 0], [1, 0, 0, 0.8], scale=0.15)
        sp = Splats(
            pos=sp.pos + jnp.asarray([dx, 0.0, 0.0]),
            color=sp.color, scale=sp.scale, normal=sp.normal,
            quat=sp.quat, pbr=sp.pbr, valid=sp.valid,
        )
        cam = make_cam()
        proj = project_splats(sp, cam, splat_format=SplatFormat.PLY_3DGS)
        out = rasterize_dense(proj, W, H)
        # weighted-x centroid of the alpha image moves with dx
        xs = jnp.arange(W, dtype=jnp.float32)
        a = out["albedo"][..., 3]
        return jnp.sum(a * xs[None, :]) / jnp.sum(a)

    g = jax.grad(loss)(0.0)
    assert np.isfinite(float(g))
    assert float(g) > 1.0  # moving right in world moves centroid right
