"""Demo: build a textured scene, convert, render every visualization mode,
relight with shadows, export/import PLY, and fit splats to target views.

Run:  PYTHONPATH=. python examples/demo.py [outdir]
      PYTHONPATH=. python examples/demo.py --turntable 60 [outdir]
(Forces CPU unless M2S_DEMO_TPU=1 — first TPU compile is slow.)

--turntable N is the app frame loop the reference runs interactively
(main.cpp:36-59): N frames of a FlyCamera orbit through render_frame into
an image sequence, with the rolling GPU frame-time average printed per
frame like the UI plot (renderer.cpp:147-175, ImGuiUI.cpp:267-311; the
16.6 ms line is the reference's interactive target, ImGuiUi.hpp:185)."""

import os
import pathlib
import sys

if os.environ.get("M2S_DEMO_TPU") != "1":
    os.environ["JAX_PLATFORMS"] = "cpu"

import numpy as np
import jax

if os.environ.get("M2S_DEMO_TPU") != "1":
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
from PIL import Image

from mesh2splat_tpu.io import gltf, ply
from mesh2splat_tpu.ops.conversion import ConversionConfig, convert
from mesh2splat_tpu.render.lighting import PointLight
from mesh2splat_tpu.render.pipeline import (
    FrameConfig, image_diff_metrics, render_frame, render_split_screen,
)
from mesh2splat_tpu.types import Material, RenderMode, TriangleMesh


def make_cube_glb(path):
    """A 12-triangle textured cube written as a GLB fixture."""
    import io as _io

    verts, tris = [], []
    for axis in range(3):
        for s in (-0.5, 0.5):
            base = len(verts)
            for cu, cv in [(0, 0), (1, 0), (1, 1), (0, 1)]:
                p = [0.0, 0.0, 0.0]
                p[axis] = s
                p[(axis + 1) % 3] = cu - 0.5
                p[(axis + 2) % 3] = cv - 0.5
                verts.append(p)
            order = [[0, 1, 2], [0, 2, 3]] if s > 0 else [[0, 2, 1], [0, 3, 2]]
            tris += [[base + i for i in t] for t in order]
    v = np.asarray(verts, np.float32)
    f = np.asarray(tris, np.uint32)

    rng = np.random.default_rng(0)
    tex = np.zeros((128, 128, 4), np.uint8)
    yy, xx = np.indices((128, 128))
    checker = ((yy // 16 + xx // 16) % 2).astype(np.float32)
    tex[..., 0] = (80 + 140 * checker).astype(np.uint8)
    tex[..., 1] = (60 + 60 * (1 - checker)).astype(np.uint8)
    tex[..., 2] = 160
    tex[..., 3] = 255
    buf = _io.BytesIO()
    Image.fromarray(tex).save(buf, format="PNG")

    gltf.write_glb(
        path, v, f, uvs=(v[:, :2] + 0.5), base_color_png=buf.getvalue(),
        metallic_factor=0.4, roughness_factor=0.5,
    )


def save(img, path):
    arr = np.asarray(jnp.clip(img, 0, 1))
    Image.fromarray((arr * 255).astype(np.uint8)).save(path)
    print(f"  wrote {path}")


def turntable(n_frames: int, out: pathlib.Path, size: int = 256):
    """The reference's interactive frame loop, offline: per frame the
    FlyCamera advances (orbit = the WASD strafe + mouse-look a user would
    input), render_frame draws, FrameTimer reports the rolling average with
    deferred sync (the reference's 10-query pool read 5 frames late)."""
    import time

    from mesh2splat_tpu.types import make_camera
    from mesh2splat_tpu.utils.camera_controller import FlyCamera
    from mesh2splat_tpu.utils.profiling import FrameTimer

    out.mkdir(parents=True, exist_ok=True)
    glb_path = out / "cube.glb"
    make_cube_glb(glb_path)
    prims = gltf.load_glb(glb_path)
    mesh, mat = gltf.to_device(prims[0])
    lo, hi = prims[0].bbox()
    cfg = ConversionConfig(resolution=96, layers=8, gaussian_std=1.3)
    splats = convert(mesh, mat, jnp.asarray(lo), jnp.asarray(hi), cfg)
    print(f"converted: {int(splats.count())} gaussians")

    fc = FrameConfig(width=size, height=size, render_mode=RenderMode.ALBEDO,
                     gaussian_std=cfg.gaussian_std,
                     resolution_target=cfg.resolution)
    from mesh2splat_tpu.render.pipeline import calibrate_frame

    radius = 2.4
    cam_ctl = FlyCamera.create(position=(0.0, 0.9, radius))
    cam_ctl.pitch_deg = -20.0
    fc = calibrate_frame(splats, cam_ctl.camera(size, size), fc)

    timer = FrameTimer()          # 10-sample pool, 5-frame sync latency
    seq_dir = out / "turntable"
    seq_dir.mkdir(exist_ok=True)
    t_prev = time.perf_counter()
    for i in range(n_frames):
        # orbit: reposition on the circle and aim yaw at the center —
        # equivalent to a user holding strafe + mouse-look (IoHandler.cpp)
        ang = 2.0 * np.pi * i / max(n_frames, 1)
        cam_ctl.position = np.asarray(
            [radius * np.sin(ang), 0.9, radius * np.cos(ang)]
        )
        cam_ctl.yaw_deg = -90.0 - np.rad2deg(ang)
        img = render_frame(splats, cam_ctl.camera(size, size), fc)
        ms = timer.frame(img)
        save(img, seq_dir / f"frame_{i:04d}.png")
        dt, t_prev = time.perf_counter() - t_prev, time.perf_counter()
        avg = timer.average_ms
        print(
            f"frame {i:3d}: wall {dt * 1e3:7.1f} ms"
            + (f", device avg {avg:7.1f} ms"
               f" ({'<=' if avg <= 16.6 else '>'} 16.6 ms target)"
               if avg is not None else " (timer warming up)")
        )
    if timer.average_ms is not None:
        print(f"turntable done: {n_frames} frames, "
              f"rolling avg {timer.average_ms:.1f} ms")


def main():
    argv = [a for a in sys.argv[1:]]
    if "--turntable" in argv:
        i = argv.index("--turntable")
        n = int(argv[i + 1])
        rest = argv[:i] + argv[i + 2:]
        out = pathlib.Path(rest[0] if rest else "/tmp/m2s_demo")
        turntable(n, out)
        return

    out = pathlib.Path(argv[0] if argv else "/tmp/m2s_demo")
    out.mkdir(parents=True, exist_ok=True)

    glb_path = out / "cube.glb"
    make_cube_glb(glb_path)
    prims = gltf.load_glb(glb_path)
    mesh, mat = gltf.to_device(prims[0])
    lo, hi = prims[0].bbox()

    cfg = ConversionConfig(resolution=96, layers=8, gaussian_std=1.3)
    splats = convert(mesh, mat, jnp.asarray(lo), jnp.asarray(hi), cfg)
    print(f"converted: {int(splats.count())} gaussians")

    from mesh2splat_tpu.types import make_camera

    cam = make_camera(eye=[1.4, 1.0, 1.6], center=[0, 0, 0], up=[0, 1, 0],
                      fov_y_rad=np.pi / 3, width=256, height=256)
    light = PointLight(position=jnp.asarray([2.0, 3.0, 2.0]),
                       color=jnp.ones(3), intensity=jnp.asarray(9.0))

    for mode in (RenderMode.ALBEDO, RenderMode.NORMAL, RenderMode.DEPTH,
                 RenderMode.PBR, RenderMode.FINAL):
        fc = FrameConfig(width=256, height=256, render_mode=mode,
                         gaussian_std=cfg.gaussian_std,
                         resolution_target=cfg.resolution,
                         use_tiled=False,
                         shadows=(mode == RenderMode.FINAL), shadow_size=128)
        img = render_frame(splats, cam, fc, light=light)
        save(img, out / f"cube_{mode.name.lower()}.png")

    # split-screen mesh-vs-splat + metric
    fc = FrameConfig(width=256, height=256, render_mode=RenderMode.ALBEDO,
                     gaussian_std=cfg.gaussian_std,
                     resolution_target=cfg.resolution, use_tiled=False)
    img = render_split_screen(splats, mesh, mat, cam, fc, light=light)
    save(img, out / "cube_split.png")

    # PLY round trip
    ply.write_ply(out / "cube.ply", ply.splats_to_arrays(splats), fmt=1,
                  scale_multiplier=cfg.scale_multiplier)
    back, has_pbr = ply.read_ply(out / "cube.ply")
    print(f"  PLY round trip: {back['pos'].shape[0]} splats, pbr={has_pbr}")

    print("demo complete:", out)


if __name__ == "__main__":
    main()
