"""End-to-end: convert a textured quad -> project -> rasterize -> deferred
resolve (BASELINE.json configs 1-2; reference call stack SURVEY.md 3.2-3.3)."""

import numpy as np
import jax
import jax.numpy as jnp

from mesh2splat_tpu.types import (
    Material, RenderMode, SplatFormat, TriangleMesh, make_camera,
)
from mesh2splat_tpu.ops.conversion import ConversionConfig, convert
from mesh2splat_tpu.ops.projection import project_splats
from mesh2splat_tpu.render.rasterize import rasterize_dense
from mesh2splat_tpu.render.lighting import PointLight, deferred_resolve


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


def test_quad_end_to_end():
    mesh = quad_mesh()
    cfg = ConversionConfig(resolution=32, layers=3, gaussian_std=1.0)
    splats = convert(mesh, Material.default(), *mesh.bbox(), cfg)
    assert int(splats.count()) == 32 * 32

    cam = make_camera(
        eye=[0, 0, 2], center=[0, 0, 0], up=[0, 1, 0],
        fov_y_rad=np.pi / 3, width=64, height=64,
    )
    proj = project_splats(
        splats, cam, std_dev=cfg.scale_multiplier,
        render_mode=RenderMode.ALBEDO, splat_format=SplatFormat.MESH2SPLAT,
    )
    out = rasterize_dense(proj, 64, 64)
    a = np.asarray(out["albedo"])

    # quad spans |x|,|y| <= 0.5 at z=0 seen from z=2 with fov 60:
    # half-extent on screen = 0.5/ (2*tan30) of half-view -> ~0.433 ndc
    # center pixels must be opaque white-ish; corners empty
    assert a[32, 32, 3] > 0.95
    assert a[1, 1, 3] < 1e-3
    # white albedo premultiplied = alpha
    np.testing.assert_allclose(a[32, 32, 0], a[32, 32, 3], rtol=1e-5)

    # FINAL deferred resolve produces a finite, lit image
    img = deferred_resolve(
        out, camera_pos=jnp.asarray([0.0, 0, 2]), light=PointLight.default(),
        render_mode=RenderMode.FINAL,
    )
    img = np.asarray(img)
    assert img.shape == (64, 64, 3)
    assert np.isfinite(img).all()
    assert img[32, 32].mean() > 0.05  # lit surface


def test_render_modes_resolve():
    mesh = quad_mesh()
    cfg = ConversionConfig(resolution=16, layers=3)
    splats = convert(mesh, Material.default(), *mesh.bbox(), cfg)
    cam = make_camera(
        eye=[0, 0, 2], center=[0, 0, 0], up=[0, 1, 0],
        fov_y_rad=np.pi / 3, width=32, height=32,
    )
    for mode in (RenderMode.ALBEDO, RenderMode.DEPTH, RenderMode.NORMAL,
                 RenderMode.GEOMETRY, RenderMode.PBR):
        proj = project_splats(
            splats, cam, std_dev=cfg.scale_multiplier, render_mode=mode,
        )
        out = rasterize_dense(proj, 32, 32, render_mode=mode)
        img = deferred_resolve(
            out, camera_pos=jnp.asarray([0.0, 0, 2]),
            light=PointLight.default(), render_mode=mode,
        )
        assert np.isfinite(np.asarray(img)).all(), mode
    # NORMAL mode: center shows encoded +Z normal (0.5, 0.5, 1.0)
    proj = project_splats(splats, cam, std_dev=cfg.scale_multiplier,
                          render_mode=RenderMode.NORMAL)
    out = rasterize_dense(proj, 32, 32)
    a = np.asarray(out["albedo"])
    np.testing.assert_allclose(
        a[16, 16, :3] / a[16, 16, 3], [0.5, 0.5, 1.0], atol=1e-3
    )


def test_gradient_flows_mesh_to_pixels():
    """North star: pixel gradients w.r.t. source mesh/texture through the
    full conversion + rasterization pipeline."""
    mesh = quad_mesh()
    cfg = ConversionConfig(resolution=16, layers=2)
    cam = make_camera(
        eye=[0, 0, 2], center=[0, 0, 0], up=[0, 1, 0],
        fov_y_rad=np.pi / 3, width=32, height=32,
    )

    def loss(factor):
        mat = Material(
            base_color_factor=factor,
            metallic_factor=jnp.float32(1.0),
            roughness_factor=jnp.float32(1.0),
            base_color=jnp.ones((1, 1, 4)),
            normal=jnp.full((1, 1, 3), 0.5),
            metallic_roughness=jnp.zeros((1, 1, 3)),
        )
        splats = convert(mesh, mat, *mesh.bbox(), cfg)
        proj = project_splats(splats, cam, std_dev=cfg.scale_multiplier)
        out = rasterize_dense(proj, 32, 32)
        return jnp.mean(out["albedo"][..., 0])

    g = jax.grad(loss)(jnp.ones(4))
    assert np.isfinite(np.asarray(g)).all()
    assert float(g[0]) > 0  # brighter red factor -> brighter red channel


def test_fly_camera_controller():
    """FlyCamera reproduces IoHandler/Camera semantics: movement along the
    look basis, pitch clamp, fov clamp, and renders through make_camera."""
    import numpy as np

    from mesh2splat_tpu.utils.camera_controller import FlyCamera

    cam = FlyCamera.create([0, 0, 3])
    front0, right0, up0 = cam.basis()
    np.testing.assert_allclose(front0, [0, 0, -1], atol=1e-6)  # yaw -90
    cam.move(dt=1.0, forward=1.0)
    np.testing.assert_allclose(cam.position, [0, 0, 0.5], atol=1e-6)
    cam.look(dx_px=900, dy_px=0)  # +90 deg yaw
    f, _, _ = cam.basis()
    np.testing.assert_allclose(f, [1, 0, 0], atol=1e-6)
    cam.look(0, 10000)
    assert cam.pitch_deg == -89.0  # clamp (Camera.cpp:58-62)
    cam.zoom(1000)
    assert cam.fov_deg == 1.0      # clamp (Camera.cpp:65-74)
    c = cam.camera(64, 48)
    assert c.width == 64 and c.height == 48


def test_model_transform_matches_moved_camera():
    """render_frame(model_to_world=translate(d)) must equal rendering the
    untransformed model from a camera shifted by -d — the reference's gizmo
    semantics (UpdateTransforms -> renderer.cpp:178-206) exposed through
    Scene/FrameConfig (round-4 verdict missing #5)."""
    from mesh2splat_tpu.render.pipeline import FrameConfig, render_frame
    from mesh2splat_tpu.types import compose_trs

    mesh = quad_mesh()
    cfg = ConversionConfig(resolution=32, layers=3)
    lo, hi = mesh.bbox()
    sp = convert(mesh, Material.default(), lo, hi, cfg)

    d = np.array([0.3, -0.2, 0.1], np.float32)
    fc = FrameConfig(width=128, height=128, render_mode=RenderMode.ALBEDO,
                     splat_format=SplatFormat.MESH2SPLAT,
                     resolution_target=cfg.resolution, use_tiled=False)

    cam = make_camera(eye=[0, 0, 2], center=[0, 0, 0], up=[0, 1, 0],
                      fov_y_rad=np.pi / 3, width=128, height=128)
    moved = render_frame(
        sp, cam, fc, model_to_world=compose_trs(translation=d)
    )

    cam_shift = make_camera(eye=[0, 0, 2] - d, center=[0, 0, 0] - d,
                            up=[0, 1, 0], fov_y_rad=np.pi / 3,
                            width=128, height=128)
    equiv = render_frame(sp, cam_shift, fc)
    np.testing.assert_allclose(np.asarray(moved), np.asarray(equiv),
                               atol=1e-4)
    # and the transform must actually change the image vs identity
    base = render_frame(sp, cam, fc)
    assert float(jnp.abs(moved - base).max()) > 1e-2


def test_scene_render_accepts_trs(tmp_path):
    """Scene.render(model_transform=TRS tuple) goes through compose_trs and
    renders without error (CLI --translate/--rotate/--scale-model path)."""
    import sys
    sys.path.insert(0, str(__import__("pathlib").Path(__file__).parent))
    from golden_asset import build_helmet_glb

    from mesh2splat_tpu.scene import Scene

    path = tmp_path / "m.glb"
    build_helmet_glb(str(path))
    sc = Scene.from_glb(str(path))
    sp = sc.convert(resolution=64, layers=4)
    img = sc.render(sp, eye=[0, 0, 3], width=96, height=64,
                    model_transform=((0.1, 0, 0), (1, 0, 0, 0), (1, 1, 1.2)))
    assert np.isfinite(np.asarray(img)).all()
