"""Binning dissection: where do the 84 ms go? Temporary experiment."""

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
    c_cap = B.calibrate_overflow(proj, wpx, hpx)
    n = proj.capacity
    rows = B.K_SLOTS * n + c_cap
    print(f"n={n} c_cap={c_cap} rows={rows}", flush=True)

    # synthetic operands with realistic distributions
    rng = np.random.default_rng(0)
    num_tiles = 2026
    tiles = jnp.asarray(
        np.sort(rng.integers(0, num_tiles, rows)).astype(np.int32)[::-1].copy()
    )  # reverse-sorted worst-ish case; also test random below
    tiles_r = jnp.asarray(rng.integers(0, num_tiles, rows).astype(np.int32))
    depth = jnp.asarray(rng.random(rows, np.float32))
    rowid = jnp.arange(rows, dtype=jnp.int32)
    vals = [jnp.asarray(rng.random(rows, np.float32)) for _ in range(9)]

    for stable in (True, False):
        f = jax.jit(lambda t, d, r, *v, s=stable: jax.lax.sort(
            (t, d, r, *v), num_keys=3, is_stable=s))
        ms = timeit(f, tiles_r, depth, rowid, *vals)
        print(f"sort 3k+9c stable={stable}: {ms:7.2f} ms", flush=True)

    f = jax.jit(lambda t, d, r: jax.lax.sort((t, d, r), num_keys=3))
    print(f"sort 3k+0c: {timeit(f, tiles_r, depth, rowid):7.2f} ms",
          flush=True)

    f = jax.jit(lambda t, d, r, *v: jax.lax.sort(
        (t, d, r, *v), num_keys=3))
    print(f"sort 3k+4c: {timeit(f, tiles_r, depth, rowid, *vals[:4]):7.2f} ms",
          flush=True)

    # packed single key (tile<<21 | depth_hi21) + rowid + 9 carries
    def packkey(t, d):
        bits = jax.lax.bitcast_convert_type(d, jnp.uint32)
        return (t.astype(jnp.uint32) << 21) | (bits >> 11)

    f = jax.jit(lambda t, d, r, *v: jax.lax.sort(
        (packkey(t, d), r, *v), num_keys=1))
    print(f"sort 1kpacked+1k+9c: "
          f"{timeit(f, tiles_r, depth, rowid, *vals):7.2f} ms", flush=True)

    # full bin + the operand-build-only prefix (sort replaced by identity)
    bin_f = jax.jit(lambda p: B.bin_pairs(p, wpx, hpx, c_cap,
                                          variant="albedo"))
    jax.block_until_ready(bin_f(proj).fields)
    print(f"bin_pairs full : {timeit(bin_f, proj):7.2f} ms", flush=True)

    import mesh2splat_tpu.render.binning as BB
    orig = BB._sort_carry

    def fake_sort(num_keys, *ops):
        return ops

    BB._sort_carry = fake_sort
    nosort_f = jax.jit(lambda p: B.bin_pairs(p, wpx, hpx, c_cap,
                                             variant="albedo"))
    jax.block_until_ready(nosort_f(proj).fields)
    print(f"bin no-sort    : {timeit(nosort_f, proj):7.2f} ms", flush=True)
    BB._sort_carry = orig


if __name__ == "__main__":
    main()
