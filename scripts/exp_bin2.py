"""Binning experiment round 2: tile-shape span histograms, drop-mode fill,
updated bin_pairs timing. Temporary."""

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np


def timeit(f, *a, iters=10):
    out = f(*a)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = f(*a)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters * 1e3


def main():
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
        render_mode=RenderMode.ALBEDO,
        splat_format=SplatFormat.MESH2SPLAT))(sp)
    jax.block_until_ready(proj)

    # ---- span histograms per tile shape ----------------------------------
    mean_ndc = np.asarray(proj.mean_ndc)
    axes_px = np.asarray(proj.axes_px)
    valid = np.asarray(proj.valid)
    res_half = np.asarray([wpx, hpx], np.float32) * 0.5
    mean_px = (mean_ndc + 1.0) * res_half
    ext = np.abs(axes_px[:, 0]) + np.abs(axes_px[:, 1]) + 1e-3
    row_c = hpx - mean_px[:, 1]
    x_lo, x_hi = mean_px[:, 0] - ext[:, 0], mean_px[:, 0] + ext[:, 0]
    y_lo, y_hi = row_c - ext[:, 1], row_c + ext[:, 1]
    on = valid & (x_hi >= 0) & (x_lo < wpx) & (y_hi >= 0) & (y_lo < hpx)

    for th, tw in ((8, 128), (16, 64), (32, 32), (16, 128), (8, 64),
                   (64, 16)):
        ty_n, tx_n = -(-hpx // th), -(-wpx // tw)
        tx0 = np.clip(np.floor(x_lo / tw).astype(int), 0, tx_n - 1)
        tx1 = np.clip(np.floor(x_hi / tw).astype(int), 0, tx_n - 1)
        ty0 = np.clip(np.floor(y_lo / th).astype(int), 0, ty_n - 1)
        ty1 = np.clip(np.floor(y_hi / th).astype(int), 0, ty_n - 1)
        pn = np.where(on, (tx1 - tx0 + 1) * (ty1 - ty0 + 1), 0)
        tot = pn.sum()
        for K in (3, 4):
            a_rows = K * len(pn)
            c_pairs = pn[pn > K].sum()
            rows = a_rows + c_pairs
            print(f"tile {th:3d}x{tw:3d}: pairs={tot/1e6:5.2f}M  K={K}: "
                  f"rows={(rows)/1e6:5.2f}M  c={c_pairs/1e6:5.2f}M  "
                  f"tiles={ty_n*tx_n}", flush=True)

    # ---- fill_value: clip-to-sentinel vs drop-mode scatter ----------------
    n = proj.capacity
    c_capacity = int(B.calibrate_overflow(proj, wpx, hpx))
    rng = np.random.default_rng(1)
    counts = np.zeros(n, np.int32)
    hot = rng.choice(n, 90_000, replace=False)
    counts[hot] = rng.integers(4, 9, 90_000)
    counts = jnp.asarray(counts)
    value = jnp.arange(n, dtype=jnp.int32)

    def fill_clip(offsets, counts, capacity, value):
        starts = jnp.where(counts > 0, offsets, capacity)
        idx = jnp.clip(starts, 0, capacity)
        marks = jnp.zeros((capacity + 1,), jnp.int32).at[idx].max(value + 1)
        return jax.lax.cummax(marks[:capacity]) - 1

    def fill_drop(offsets, counts, capacity, value):
        idx = jnp.where(counts > 0, jnp.minimum(offsets, capacity),
                        capacity + 1)
        marks = jnp.zeros((capacity + 1,), jnp.int32).at[idx].max(
            value + 1, mode="drop")
        return jax.lax.cummax(marks[:capacity]) - 1

    offsets = jnp.cumsum(counts) - counts
    f1 = jax.jit(lambda o, c, v: fill_clip(o, c, c_capacity, v))
    f2 = jax.jit(lambda o, c, v: fill_drop(o, c, c_capacity, v))
    r1 = f1(offsets, counts, value)
    r2 = f2(offsets, counts, value)
    same = bool(jnp.all(r1 == r2))
    print(f"fill clip: {timeit(f1, offsets, counts, value):7.2f} ms  "
          f"drop: {timeit(f2, offsets, counts, value):7.2f} ms  same={same}",
          flush=True)

    # ---- updated bin_pairs (unstable sort + merged class-C gather) --------
    bin_f = jax.jit(lambda p: B.bin_pairs(p, wpx, hpx, c_capacity,
                                          variant="albedo"))
    jax.block_until_ready(bin_f(proj).fields)
    print(f"bin_pairs now : {timeit(bin_f, proj):7.2f} ms", flush=True)

    bin_full = jax.jit(lambda p: B.bin_pairs(p, wpx, hpx, c_capacity,
                                             variant="full"))
    jax.block_until_ready(bin_full(proj).fields)
    print(f"bin full-var  : {timeit(bin_full, proj):7.2f} ms", flush=True)


if __name__ == "__main__":
    main()
