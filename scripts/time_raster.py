"""Delta-timing + optional xprof trace of the 1080p tiled rasterizer on the
bench scene (20k-tri sphere -> 1.53M splats)."""
import sys, time
sys.path.insert(0, ".")
import numpy as np
import jax, jax.numpy as jnp
from bench import synth_mesh
from mesh2splat_tpu.ops.conversion import ConversionConfig, calibrate, convert
from mesh2splat_tpu.ops.projection import project_splats
from mesh2splat_tpu.render.binning import calibrate_overflow
from mesh2splat_tpu.render.tiled import rasterize_tiled
from mesh2splat_tpu.types import RenderMode, SplatFormat, make_camera

mesh, mat = synth_mesh()
lo, hi = mesh.bbox()
cfg = calibrate(mesh, lo, hi, ConversionConfig(resolution=512, layers=6))
sp = jax.jit(lambda m: convert(m, mat, lo, hi, cfg))(mesh)

wpx, hpx = 1920, 1080
cam = make_camera(eye=[0, 0, 3.2], center=[0, 0, 0], up=[0, 1, 0],
                  fov_y_rad=np.pi / 3, width=wpx, height=hpx)

def project(splats):
    return project_splats(splats, cam, std_dev=cfg.scale_multiplier,
                          render_mode=RenderMode.ALBEDO,
                          splat_format=SplatFormat.MESH2SPLAT)

pair_cap = calibrate_overflow(jax.jit(project)(sp), wpx, hpx)
print(f"pair budget={pair_cap}", file=sys.stderr)

def fwd(splats):
    return rasterize_tiled(project(splats), wpx, hpx,
                           pair_capacity=pair_cap, albedo_only=True)["albedo"]

fn = jax.jit(fwd)

def run(n):
    t0 = time.perf_counter()
    for _ in range(n):
        img = fn(sp)
    _ = float(np.asarray(img[0, 0, 0]))
    return time.perf_counter() - t0

run(2)
t1 = min(run(1) for _ in range(2))
tn = run(11)
print(f"raster fwd 1080p: {(tn - t1)/10*1e3:.2f} ms/iter")

if "--trace" in sys.argv:
    jax.profiler.start_trace("/tmp/m2s_raster_trace")
    for _ in range(2):
        img = fn(sp)
    _ = float(np.asarray(img[0, 0, 0]))
    jax.profiler.stop_trace()
    print("trace written to /tmp/m2s_raster_trace")
