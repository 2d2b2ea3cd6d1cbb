"""Full-frame pipeline: render_frame modes, depth-prepass occlusion culling,
split-screen compare, shadows integration."""

import numpy as np
import jax.numpy as jnp

from mesh2splat_tpu.types import Material, RenderMode, TriangleMesh, make_camera
from mesh2splat_tpu.ops.conversion import ConversionConfig, convert
from mesh2splat_tpu.render.pipeline import (
    FrameConfig, image_diff_metrics, render_frame, render_split_screen,
)


def quad_mesh():
    v = np.array([[-0.5, -0.5, 0], [0.5, -0.5, 0], [0.5, 0.5, 0], [-0.5, 0.5, 0]],
                 np.float32)
    tris = np.array([[0, 1, 2], [0, 2, 3]])
    return TriangleMesh(
        tri_pos=jnp.asarray(v[tris]),
        tri_normal=jnp.asarray(np.broadcast_to([0, 0, 1.0], (2, 3, 3)).copy().astype(np.float32)),
        tri_tangent=jnp.asarray(np.broadcast_to([1, 0, 0, 1.0], (2, 3, 4)).copy().astype(np.float32)),
        tri_uv=jnp.asarray((v[tris][..., :2] + 0.5).copy()),
    )


def setup(res=16):
    mesh = quad_mesh()
    cfg = ConversionConfig(resolution=res, layers=2)
    splats = convert(mesh, Material.default(), *mesh.bbox(), cfg)
    cam = make_camera(eye=[0, 0, 2], center=[0, 0, 0], up=[0, 1, 0],
                      fov_y_rad=np.pi / 3, width=64, height=64)
    return mesh, splats, cam, cfg


def test_render_frame_final_with_shadows():
    mesh, splats, cam, cfg = setup()
    fc = FrameConfig(width=64, height=64, render_mode=RenderMode.FINAL,
                     gaussian_std=1.0, resolution_target=cfg.resolution,
                     use_tiled=False, shadows=True, shadow_size=32)
    img = render_frame(splats, cam, fc)
    img = np.asarray(img)
    assert img.shape == (64, 64, 3)
    assert np.isfinite(img).all()
    assert img[32, 32].mean() > 0.02


def test_split_screen_divider_and_similarity():
    mesh, splats, cam, cfg = setup(res=32)
    fc = FrameConfig(width=64, height=64, render_mode=RenderMode.ALBEDO,
                     resolution_target=cfg.resolution, use_tiled=False)
    img = render_split_screen(splats, mesh, Material.default(), cam, fc)
    img = np.asarray(img)
    # white divider column at the split
    assert np.allclose(img[:, 32], 1.0) or np.allclose(img[:, 31], 1.0)
    # mesh half and splat half are both white-ish quads: crude similarity
    left = img[:, :30].mean()
    right = img[:, 34:].mean()
    assert abs(left - right) < 0.15


def test_mesh_vs_splat_diff_metric():
    """The split screen as a number: a converted quad should reproduce the
    rasterized mesh within loose tolerance (the built-in eyeball test of the
    reference, made quantitative)."""
    from mesh2splat_tpu.render.mesh_raster import rasterize_mesh
    from mesh2splat_tpu.render.pipeline import render_gbuffer
    from mesh2splat_tpu.render.lighting import PointLight, deferred_resolve

    mesh, splats, cam, cfg = setup(res=32)
    fc = FrameConfig(width=64, height=64, render_mode=RenderMode.ALBEDO,
                     resolution_target=cfg.resolution, use_tiled=False)
    mg, _ = rasterize_mesh(mesh, Material.default(), cam, 64, 64)
    sg = render_gbuffer(splats, cam, fc)
    m = image_diff_metrics(mg["albedo"][..., :3], sg["albedo"][..., :3])
    assert float(m["psnr"]) > 15.0, float(m["psnr"])


def test_depth_prepass_occlusion_culling():
    """Splats behind an opaque mesh surface are culled (G4:79-91): put the
    mesh in front of the splats; with depth_test_mesh the splats vanish."""
    mesh, splats, cam, cfg = setup(res=16)
    # move the occluder quad closer to the camera than the splats
    front = TriangleMesh(
        tri_pos=mesh.tri_pos + jnp.asarray([0, 0, 0.5]),
        tri_normal=mesh.tri_normal,
        tri_tangent=mesh.tri_tangent,
        tri_uv=mesh.tri_uv,
    )
    fc_off = FrameConfig(width=64, height=64, render_mode=RenderMode.ALBEDO,
                         resolution_target=cfg.resolution, use_tiled=False,
                         depth_test_mesh=False)
    fc_on = FrameConfig(width=64, height=64, render_mode=RenderMode.ALBEDO,
                        resolution_target=cfg.resolution, use_tiled=False,
                        depth_test_mesh=True)
    img_off = np.asarray(render_frame(splats, cam, fc_off, mesh=front,
                                      material=Material.default()))
    img_on = np.asarray(render_frame(splats, cam, fc_on, mesh=front,
                                     material=Material.default()))
    assert img_off[32, 32].mean() > 0.5      # splats visible without culling
    assert img_on[32, 32].mean() < 1e-3      # culled behind the occluder
