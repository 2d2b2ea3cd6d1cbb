"""End-to-end texture optimization: gradients flow from rendered pixels
through the rasterizer AND the conversion back to the source texture
(BASELINE north star; VERDICT round 1 item 9). The forward-only reference
has no equivalent."""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from mesh2splat_tpu.ops.conversion import ConversionConfig, convert
from mesh2splat_tpu.train.fit import (
    FitTexturesConfig, fit_textures, render_rgb,
)
from mesh2splat_tpu.types import Material, SplatFormat, TriangleMesh, make_camera


def _quad():
    v = np.array(
        [[-0.5, -0.5, 0], [0.5, -0.5, 0], [0.5, 0.5, 0], [-0.5, 0.5, 0]],
        np.float32,
    )
    tris = np.array([[0, 1, 2], [0, 2, 3]])
    return TriangleMesh(
        tri_pos=jnp.asarray(v[tris]),
        tri_normal=jnp.asarray(
            np.broadcast_to([0, 0, 1.0], (2, 3, 3)).copy().astype(np.float32)
        ),
        tri_tangent=jnp.asarray(
            np.broadcast_to([1, 0, 0, 1.0], (2, 3, 4)).copy().astype(np.float32)
        ),
        tri_uv=jnp.asarray((v[tris][..., :2] + 0.5).copy()),
    )


def test_fit_textures_recovers_target():
    mesh = _quad()
    cfg = ConversionConfig(resolution=16, layers=2)
    lo, hi = mesh.bbox()

    # ground-truth texture: two-tone pattern
    tex_gt = np.full((8, 8, 4), 1.0, np.float32)
    tex_gt[:, :4, 0] = 0.9
    tex_gt[:, :4, 1] = 0.1
    tex_gt[:, :4, 2] = 0.1
    tex_gt[:, 4:, 0] = 0.1
    tex_gt[:, 4:, 1] = 0.2
    tex_gt[:, 4:, 2] = 0.8
    mat_gt = dataclasses.replace(
        Material.default(), base_color=jnp.asarray(tex_gt),
        has_base_color=True,
    )

    cams = [
        make_camera(eye=[0, 0, 1.6], center=[0, 0, 0], up=[0, 1, 0],
                    fov_y_rad=np.pi / 3, width=32, height=32),
        make_camera(eye=[0.4, 0.2, 1.5], center=[0, 0, 0], up=[0, 1, 0],
                    fov_y_rad=np.pi / 3, width=32, height=32),
    ]
    cameras = jax.tree.map(lambda *xs: jnp.stack(xs), *cams)

    splats_gt = convert(mesh, mat_gt, lo, hi, cfg)

    def render(cam_tree):
        return render_rgb(
            splats_gt, cam_tree, 32, 32, std_dev=cfg.scale_multiplier,
            splat_format=SplatFormat.MESH2SPLAT, use_tiled=True,
        )

    targets = jax.vmap(render)(cameras)

    # init: flat gray texture
    mat0 = dataclasses.replace(
        Material.default(),
        base_color=jnp.full((8, 8, 4), 0.5, jnp.float32),
        has_base_color=True,
    )
    fit_cfg = FitTexturesConfig(steps=40, lr=8e-2, width=32, height=32)
    fitted, hist = fit_textures(mesh, mat0, cfg, cameras, targets, fit_cfg)

    assert np.isfinite(hist).all()
    assert hist[-1] < 0.5 * hist[0], f"loss {hist[0]} -> {hist[-1]}"

    # the fitted texture moved decisively toward the two-tone ground truth
    ft = np.asarray(fitted.base_color)
    assert ft[4, 1, 0] > 0.6 and ft[4, 1, 2] < 0.4     # red half
    assert ft[4, 6, 2] > 0.5 and ft[4, 6, 0] < 0.4     # blue half
