"""Span statistics + composite overhead probes on the bench scene (TPU)."""
import sys, time
sys.path.insert(0, ".")
import jax, jax.numpy as jnp
import numpy as np
from bench import synth_mesh
from mesh2splat_tpu.ops.conversion import ConversionConfig, calibrate, convert
from mesh2splat_tpu.ops.projection import project_splats
from mesh2splat_tpu.render import binning as B
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


def spans(proj, tile_h, tile_w):
    ty, tx = -(-hpx // tile_h), -(-wpx // tile_w)
    res_half = jnp.asarray([wpx, hpx], jnp.float32) * 0.5
    mean_px = (proj.mean_ndc + 1.0) * res_half
    ext = jnp.abs(proj.axes_px[:, 0]) + jnp.abs(proj.axes_px[:, 1])
    x_lo = mean_px[:, 0] - ext[:, 0]; x_hi = mean_px[:, 0] + ext[:, 0]
    row_c = jnp.asarray(hpx, jnp.float32) - mean_px[:, 1]
    y_lo = row_c - ext[:, 1]; y_hi = row_c + ext[:, 1]
    tx0 = jnp.clip(jnp.floor(x_lo / tile_w).astype(jnp.int32), 0, tx - 1)
    tx1 = jnp.clip(jnp.floor(x_hi / tile_w).astype(jnp.int32), 0, tx - 1)
    ty0 = jnp.clip(jnp.floor(y_lo / tile_h).astype(jnp.int32), 0, ty - 1)
    ty1 = jnp.clip(jnp.floor(y_hi / tile_h).astype(jnp.int32), 0, ty - 1)
    on = (x_hi >= 0) & (x_lo < wpx) & (y_hi >= 0) & (y_lo < hpx)
    v = np.asarray(proj.valid & on)
    sx = np.asarray(tx1 - tx0 + 1)[v]
    sy = np.asarray(ty1 - ty0 + 1)[v]
    return sx, sy


for th, tw in ((8, 128), (16, 128), (8, 256)):
    sx, sy = spans(proj, th, tw)
    pairs = sx * sy
    n = len(sx)
    print(f"tile ({th},{tw}): valid={n} pairs={pairs.sum()} "
          f"mean={pairs.mean():.2f}")
    for desc, mask in [
        ("1x1", (sx == 1) & (sy == 1)),
        ("<=2 pairs", pairs <= 2),
        ("<=2x2", (sx <= 2) & (sy <= 2)),
        ("<=2x3 (sy<=3,sx<=2)", (sx <= 2) & (sy <= 3)),
        ("<=2x4", (sx <= 2) & (sy <= 4)),
    ]:
        rest = ~mask
        print(f"    {desc:22s}: {mask.mean()*100:5.1f}% of splats; "
              f"rest carries {pairs[rest].sum()} pairs")

# ---- composite chunk-loop overhead probe: time composite with the real
# pair buffer vs one where all tiles are empty (counts=0) -> fixed overhead
from mesh2splat_tpu.render import composite as C

pair_cap, row_cap = B.calibrate_pairs(proj, wpx, hpx)
binned = jax.jit(lambda p: B.bin_splats(p, wpx, hpx, pair_cap,
                                        row_capacity=row_cap))(proj)
jax.block_until_ready(binned.pair_data)
ty, tx = B.tiles_for(wpx, hpx)
h_arr = jnp.asarray([hpx], jnp.int32)


def timeit(f, *a, iters=10):
    out = f(*a); jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters): out = f(*a)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters * 1e3

for name, counts in [("real", binned.tile_counts),
                     ("empty", jnp.zeros_like(binned.tile_counts)),
                     ("128each", jnp.full_like(binned.tile_counts, 128))]:
    t = timeit(
        jax.jit(lambda pd, ts, tc: C.composite_tiles(
            pd, ts, tc, h_arr, ty, tx, False, True)),
        binned.pair_data, binned.tile_starts, counts)
    print(f"composite albedo_only counts={name:8s}: {t:8.2f} ms")

nc = np.asarray(binned.tile_counts)
print(f"chunks total={((nc + 127) // 128).sum()} tiles={len(nc)} "
      f"live pairs={nc.sum()}")
