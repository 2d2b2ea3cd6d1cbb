"""Stage-level raster profiling on the bench scene (real TPU), with SALTED
inputs per iteration (identical repeated dispatches can be memoized by the
runtime and report bogus ~0ms times — see round-2 sort measurements)."""
import sys, time
sys.path.insert(0, ".")
import dataclasses
import jax, jax.numpy as jnp
import numpy as np
from bench import synth_mesh
from mesh2splat_tpu.ops.conversion import ConversionConfig, calibrate, convert
from mesh2splat_tpu.ops.projection import project_splats
from mesh2splat_tpu.render import binning as B
from mesh2splat_tpu.render import composite as C
from mesh2splat_tpu.render.tiled import rasterize_tiled
from mesh2splat_tpu.types import RenderMode, SplatFormat, make_camera

t00 = time.perf_counter()
def ts(msg):
    print(f"[{time.perf_counter()-t00:6.1f}s] {msg}", flush=True)

mesh, mat = synth_mesh()
lo, hi = mesh.bbox()
cfg = calibrate(mesh, lo, hi, ConversionConfig(resolution=512, layers=6))
sp = jax.jit(lambda m: convert(m, mat, lo, hi, cfg))(mesh)
wpx, hpx = 1920, 1080
cam = make_camera(eye=[0, 0, 3.2], center=[0, 0, 0], up=[0, 1, 0],
                  fov_y_rad=np.pi / 3, width=wpx, height=hpx)
proj_f = jax.jit(lambda s, eps: project_splats(
    dataclasses.replace(s, color=s.color + eps), cam,
    std_dev=cfg.scale_multiplier,
    render_mode=RenderMode.ALBEDO, splat_format=SplatFormat.MESH2SPLAT))
salts = [jax.device_put(np.float32(i * 1e-7)) for i in range(16)]
proj = proj_f(sp, salts[0])
jax.block_until_ready(proj)
c_cap = B.calibrate_overflow(proj, wpx, hpx)
ts(f"setup done; overflow budget {c_cap}")

ITERS = 8

def timeit(f, *a, salted=True):
    out = f(salts[9], *a)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for i in range(ITERS):
        out = f(salts[i if salted else 0], *a)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / ITERS * 1e3

ms = timeit(lambda e, s: proj_f(s, e), sp)
ts(f"project      : {ms:8.2f} ms")

bin_f = jax.jit(lambda e, s: B.bin_pairs(
    proj_f(s, e), wpx, hpx, c_cap, variant="albedo"))
ms = timeit(bin_f, sp)
binned = bin_f(salts[0], sp)
jax.block_until_ready(binned.fields)
ts(f"proj+bin     : {ms:8.2f} ms  pairs={int(binned.num_pairs)}")

ty, tx = B.tiles_for(wpx, hpx)
h_arr = jnp.asarray([hpx], jnp.int32)
comp_f = jax.jit(lambda e, f, s: C.composite_tiles(
    f + e, s, h_arr, ty, tx, False, True))
ms = timeit(comp_f, binned.fields, binned.tile_starts)
ts(f"composite alb: {ms:8.2f} ms")

full_f = jax.jit(lambda e, s, p: rasterize_tiled(
    dataclasses.replace(p, color=p.color + e + s * 0), wpx, hpx,
    pair_capacity=c_cap, albedo_only=True)["albedo"])
ms = timeit(full_f, sp.pos[0, 0], proj)
ts(f"fwd total    : {ms:8.2f} ms")

nc = np.asarray(binned.tile_counts)
al = np.asarray(binned.tile_starts)[:-1] % 128
chunks = np.ceil((nc + al) / 128).sum()
ts(f"tiles={len(nc)} live={nc.sum()} chunks={int(chunks)} max/tile={nc.max()}")
