"""Binning sub-stage profiling on the bench scene (real TPU)."""
import sys, time
sys.path.insert(0, ".")
import jax, jax.numpy as jnp
import numpy as np
from bench import synth_mesh
from mesh2splat_tpu.ops.conversion import ConversionConfig, calibrate, convert
from mesh2splat_tpu.ops.projection import project_splats
from mesh2splat_tpu.render import binning as B
from mesh2splat_tpu.ops import segments
from mesh2splat_tpu.types import RenderMode, SplatFormat, make_camera

mesh, mat = synth_mesh()
lo, hi = mesh.bbox()
cfg = calibrate(mesh, lo, hi, ConversionConfig(resolution=512, layers=6))
sp = jax.jit(lambda m: convert(m, mat, lo, hi, cfg))(mesh)
wpx, hpx = 1920, 1080
cam = make_camera(eye=[0, 0, 3.2], center=[0, 0, 0], up=[0, 1, 0],
                  fov_y_rad=np.pi / 3, width=wpx, height=hpx)
proj = jax.jit(lambda s: project_splats(
    s, cam, std_dev=cfg.scale_multiplier,
    render_mode=RenderMode.ALBEDO, splat_format=SplatFormat.MESH2SPLAT))(sp)
jax.block_until_ready(proj)
c_cap = B.calibrate_overflow(proj, wpx, hpx)
n = proj.capacity
print("N =", n, "c_cap =", c_cap, flush=True)


def timeit(f, *a, iters=10):
    out = f(*a)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = f(*a)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters * 1e3


variant = "albedo"
ty, tx = B.tiles_for(wpx, hpx)
num_tiles = ty * tx

# stage a: geometry + rank
def stage_a(proj):
    mean_px, tx0, ty0, sx, sy, valid = B._tile_geom(proj, wpx, hpx)
    order = jnp.argsort(jnp.where(valid, proj.depth, jnp.inf), stable=True)
    rank = jnp.zeros((n,), jnp.int32).at[order].set(jnp.arange(n, dtype=jnp.int32))
    return rank, mean_px
print(f"geom+rank    : {timeit(jax.jit(stage_a), proj):8.2f} ms", flush=True)

# stage a2: geometry only
def stage_a2(proj):
    return B._tile_geom(proj, wpx, hpx)
print(f"geom only    : {timeit(jax.jit(stage_a2), proj):8.2f} ms", flush=True)

# full bin fwd-only for reference
bin_nd = jax.jit(lambda p: B.bin_pairs(p, wpx, hpx, c_cap, variant=variant,
                                       differentiable=False))
print(f"bin fwd-only : {timeit(bin_nd, proj):8.2f} ms", flush=True)
bin_d = jax.jit(lambda p: B.bin_pairs(p, wpx, hpx, c_cap, variant=variant))
print(f"bin diff     : {timeit(bin_d, proj):8.2f} ms", flush=True)

# isolated sort cost at the real row count / operand count
rows = n * B.K_SLOTS + int(c_cap)
key = np.random.default_rng(0).integers(0, 2**31, rows).astype(np.uint32)
keyj = jnp.asarray(key)
vals9 = [jnp.asarray(np.random.rand(rows).astype(np.float32)) for _ in range(9)]
rowid = jnp.arange(rows, dtype=jnp.int32)

f_sort1 = jax.jit(lambda k, *v: jax.lax.sort((k, *v), num_keys=1))
print(f"sort 1k+9v   : {timeit(f_sort1, keyj, *vals9):8.2f} ms  rows={rows}", flush=True)
f_sort2 = jax.jit(lambda k, r, *v: jax.lax.sort((k, r, *v), num_keys=1))
print(f"sort 1k+r+9v : {timeit(f_sort2, keyj, rowid, *vals9):8.2f} ms", flush=True)
key2 = jnp.asarray((key >> 11).astype(np.int32))
f_sort2k = jax.jit(lambda a, b, *v: jax.lax.sort((a, b, *v), num_keys=2))
print(f"sort 2k+9v   : {timeit(f_sort2k, key2, keyj, *vals9):8.2f} ms", flush=True)
f_sortk = jax.jit(lambda k: jax.lax.sort((k,), num_keys=1))
print(f"sort key only: {timeit(f_sortk, keyj):8.2f} ms", flush=True)
