"""Stage-level raster profiling on the bench scene (real TPU):
projection / bin_pairs / composite / full fwd / fwd+bwd."""
import sys, time
sys.path.insert(0, ".")
import jax, jax.numpy as jnp
import numpy as np
from bench import synth_mesh
from mesh2splat_tpu.ops.conversion import ConversionConfig, calibrate, convert
from mesh2splat_tpu.ops.projection import project_splats
from mesh2splat_tpu.render import binning as B
from mesh2splat_tpu.render import composite as C
from mesh2splat_tpu.render.tiled import rasterize_tiled
from mesh2splat_tpu.types import RenderMode, SplatFormat, make_camera

mesh, mat = synth_mesh()
lo, hi = mesh.bbox()
cfg = calibrate(mesh, lo, hi, ConversionConfig(resolution=512, layers=6))
sp = jax.jit(lambda m: convert(m, mat, lo, hi, cfg))(mesh)
wpx, hpx = 1920, 1080
cam = make_camera(eye=[0, 0, 3.2], center=[0, 0, 0], up=[0, 1, 0],
                  fov_y_rad=np.pi / 3, width=wpx, height=hpx)
proj_f = jax.jit(lambda s: project_splats(
    s, cam, std_dev=cfg.scale_multiplier,
    render_mode=RenderMode.ALBEDO, splat_format=SplatFormat.MESH2SPLAT))
proj = proj_f(sp)
jax.block_until_ready(proj)
c_cap = B.calibrate_overflow(proj, wpx, hpx)
print("overflow budget", c_cap, flush=True)


def timeit(f, *a, iters=10):
    out = f(*a)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = f(*a)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters * 1e3


print(f"project      : {timeit(proj_f, sp):8.2f} ms", flush=True)

bin_f = jax.jit(lambda p: B.bin_pairs(p, wpx, hpx, c_cap, variant="albedo"))
binned = bin_f(proj)
jax.block_until_ready(binned.fields)
print(f"bin_pairs    : {timeit(bin_f, proj):8.2f} ms  "
      f"pairs={int(binned.num_pairs)} cap={binned.capacity}", flush=True)

# binning without the differentiable rowid carry
bin_nd = jax.jit(lambda p: B.bin_pairs(p, wpx, hpx, c_cap, variant="albedo",
                                       differentiable=False))
print(f"bin (fwdonly): {timeit(bin_nd, proj):8.2f} ms", flush=True)

ty, tx = B.tiles_for(wpx, hpx)
h_arr = jnp.asarray([hpx], jnp.int32)
comp_f = jax.jit(lambda f, s: C.composite_tiles(f, s, h_arr, ty, tx, False, True))
print(f"composite alb: {timeit(comp_f, binned.fields, binned.tile_starts):8.2f} ms",
      flush=True)

full_f = jax.jit(lambda p: rasterize_tiled(
    p, wpx, hpx, pair_capacity=c_cap, albedo_only=True)["albedo"])
print(f"fwd total    : {timeit(full_f, proj):8.2f} ms", flush=True)

nc = np.asarray(binned.tile_counts)
al = np.asarray(binned.tile_starts)[:-1] % 128
chunks = np.ceil((nc + al) / 128).sum()
print(f"tiles={len(nc)} live={nc.sum()} chunks={int(chunks)} "
      f"max/tile={nc.max()}", flush=True)
