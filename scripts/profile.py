"""Consolidated stage-level profiler for the bench scene (real TPU).

Replaces the 18 round-1..3 one-off scripts (profile_convert*.py,
profile_raster*.py, profile_binning*.py, ubench*.py, ...) the kernel
docstrings cite measured numbers from. Subcommands:

  python scripts/profile.py raster    # project / bin / composite fwd / bwd
  python scripts/profile.py convert   # calibration, expansion, kernels A/B
  python scripts/profile.py shadow    # cubemap shadow pass
  python scripts/profile.py sort      # lax.sort cost vs operand count
  python scripts/profile.py gather    # gather tiers (rows x width)

Each prints per-stage wall times from deferred-sync timing (compile
excluded; `--iters N` to change averaging).
"""

from __future__ import annotations

import argparse
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


def bench_scene():
    from bench import synth_mesh
    from mesh2splat_tpu.ops.conversion import ConversionConfig, calibrate

    mesh, mat = synth_mesh()
    lo, hi = mesh.bbox()
    cfg = calibrate(mesh, lo, hi, ConversionConfig(resolution=512, layers=6))
    return mesh, mat, lo, hi, cfg


def cmd_raster(args):
    from mesh2splat_tpu.ops.conversion import convert
    from mesh2splat_tpu.ops.projection import project_splats
    from mesh2splat_tpu.render import binning as B
    from mesh2splat_tpu.render import composite as C
    from mesh2splat_tpu.render.tiled import rasterize_tiled
    from mesh2splat_tpu.types import RenderMode, SplatFormat, make_camera

    mesh, mat, lo, hi, cfg = bench_scene()
    sp = jax.jit(lambda m: convert(m, mat, lo, hi, cfg))(mesh)
    wpx, hpx = args.width, args.height
    cam = make_camera(eye=[0, 0, 3.2], center=[0, 0, 0], up=[0, 1, 0],
                      fov_y_rad=np.pi / 3, width=wpx, height=hpx)
    proj_f = jax.jit(lambda s: project_splats(
        s, cam, std_dev=cfg.scale_multiplier,
        render_mode=RenderMode.ALBEDO, splat_format=SplatFormat.MESH2SPLAT))
    proj = proj_f(sp)
    jax.block_until_ready(proj)
    c_cap = B.calibrate_overflow(proj, wpx, hpx)
    print(f"splats={int(sp.count())} overflow budget={c_cap}", flush=True)

    it = args.iters
    print(f"project      : {timeit(proj_f, sp, iters=it):8.2f} ms", flush=True)

    bin_f = jax.jit(lambda p: B.bin_pairs(p, wpx, hpx, c_cap,
                                          variant="albedo"))
    binned = bin_f(proj)
    jax.block_until_ready(binned.fields)
    print(f"bin_pairs    : {timeit(bin_f, proj, iters=it):8.2f} ms  "
          f"pairs={int(binned.num_pairs)} cap={binned.capacity}", flush=True)

    ty, tx = B.tiles_for(wpx, hpx)
    h_arr = jnp.asarray([hpx], jnp.int32)
    comp_f = jax.jit(
        lambda f, s: C.composite_tiles(f, s, h_arr, ty, tx, False, True))
    print(f"composite alb: "
          f"{timeit(comp_f, binned.fields, binned.tile_starts, iters=it):8.2f}"
          " ms", flush=True)

    full_f = jax.jit(lambda p: rasterize_tiled(
        p, wpx, hpx, pair_capacity=c_cap, albedo_only=True)["albedo"])
    t_fwd = timeit(full_f, proj, iters=it)
    print(f"fwd total    : {t_fwd:8.2f} ms", flush=True)

    import dataclasses

    def loss(pos, color, scale, quat):
        s2 = dataclasses.replace(sp, pos=pos, color=color, scale=scale,
                                 quat=quat)
        p = project_splats(s2, cam, std_dev=cfg.scale_multiplier,
                           render_mode=RenderMode.ALBEDO,
                           splat_format=SplatFormat.MESH2SPLAT)
        return jnp.mean(rasterize_tiled(
            p, wpx, hpx, pair_capacity=c_cap, albedo_only=True)["albedo"])

    grad_j = jax.jit(jax.grad(loss, argnums=(0, 1, 2, 3)))
    t_fb = timeit(grad_j, sp.pos, sp.color, sp.scale, sp.quat, iters=it)
    print(f"fwd+bwd      : {t_fb:8.2f} ms  bwd/fwd "
          f"{max(t_fb - t_fwd, 0) / t_fwd:.2f}", flush=True)

    nc = np.asarray(binned.tile_counts)
    al = np.asarray(binned.tile_starts)[:-1] % B.CHUNK
    chunks = np.ceil((nc + al) / B.CHUNK).sum()
    print(f"tiles={len(nc)} live={nc.sum()} chunks={int(chunks)} "
          f"max/tile={nc.max()}", flush=True)


def cmd_convert(args):
    import dataclasses

    from mesh2splat_tpu.ops import segments
    from mesh2splat_tpu.ops.conversion import (
        _expand_slots, convert, required_rec_window, required_rows,
        required_slots,
    )

    mesh, mat, lo, hi, cfg = bench_scene()
    it = args.iters
    print(f"capacity={cfg.capacity} rows={cfg.row_capacity} "
          f"rec_window={cfg.rec_window}", flush=True)

    rr = jax.jit(lambda m: required_rows(m, lo, hi, cfg))
    print(f"required_rows : {timeit(rr, mesh, iters=it):7.2f} ms", flush=True)
    rs = jax.jit(lambda m: required_slots(m, lo, hi, cfg))
    print(f"required_slots: {timeit(rs, mesh, iters=it):7.2f} ms", flush=True)

    exp = jax.jit(lambda m: _expand_slots(m, lo, hi, cfg)["tri_id_safe"])
    print(f"expand_slots  : {timeit(exp, mesh, iters=it):7.2f} ms", flush=True)

    conv = jax.jit(lambda m: convert(m, mat, lo, hi, cfg))
    print(f"convert total : {timeit(conv, mesh, iters=it):7.2f} ms", flush=True)

    # texture-free convert isolates the tap-atlas+gather+sampling cost
    from mesh2splat_tpu.types import Material

    conv_nt = jax.jit(
        lambda m: convert(m, Material.default(), lo, hi, cfg))
    print(f"convert noTex : {timeit(conv_nt, mesh, iters=it):7.2f} ms",
          flush=True)

    # tap-atlas build + the fast-tier gather, timed in isolation
    from mesh2splat_tpu.ops import fragment
    from mesh2splat_tpu.ops.conversion import _material_stack

    stack = jax.jit(_material_stack)(mat)
    m_, th_, tw_, _ = stack.shape
    k_ = fragment.pack_factor(m_ * th_ * tw_)
    atl = jax.jit(lambda s: fragment.build_pair_atlas(
        s, k_, packed=True, mips=True)[0])
    atlasT = atl(stack)
    print(f"atlas build   : {timeit(atl, stack, iters=it):7.2f} ms  "
          f"shape={atlasT.shape} k={k_} (packed bf16, mips)", flush=True)

    rng = np.random.default_rng(0)
    idxr = jnp.asarray(
        rng.integers(0, atlasT.shape[1], cfg.capacity), jnp.int32)
    gat = jax.jit(lambda a, i: a[:, i])
    jax.block_until_ready(gat(atlasT, idxr))
    print(f"tap gather    : {timeit(gat, atlasT, idxr, iters=it):7.2f} ms  "
          f"({cfg.capacity} idx x {atlasT.shape[0]}f)", flush=True)


def cmd_shadow(args):
    from mesh2splat_tpu.ops.conversion import convert
    from mesh2splat_tpu.render.shadows import render_shadow_cubemap
    from mesh2splat_tpu.render.lighting import PointLight

    mesh, mat, lo, hi, cfg = bench_scene()
    sp = jax.jit(lambda m: convert(m, mat, lo, hi, cfg))(mesh)
    light = PointLight(position=jnp.asarray([2.0, 3.0, 2.0]),
                       color=jnp.ones(3), intensity=jnp.asarray(9.0))
    f = lambda s: render_shadow_cubemap(
        s, light.position, 10.0, cfg.scale_multiplier,
        size=args.shadow_size)
    print(f"shadow cubemap {args.shadow_size}^2 x6: "
          f"{timeit(f, sp, iters=args.iters):8.2f} ms", flush=True)


def cmd_sort(args):
    n = args.n
    keys = jnp.asarray(np.random.default_rng(0).integers(0, 1 << 20, n),
                       jnp.int32)
    vals = [jnp.asarray(np.random.default_rng(i).random(n), jnp.float32)
            for i in range(1, 13)]
    for k in (1, 4, 8, 12):
        f = jax.jit(lambda kk, *vs: jax.lax.sort((kk, *vs), num_keys=1))
        ms = timeit(f, keys, *vals[:k], iters=args.iters)
        print(f"sort {n} rows, {k} carried ops: {ms:7.2f} ms", flush=True)


def cmd_gather(args):
    rng = np.random.default_rng(0)
    idx = jnp.asarray(rng.integers(0, 1 << 14, args.n), jnp.int32)
    for rows in (1 << 14, 1 << 17, 1 << 19, 1 << 21):
        tab = jnp.asarray(rng.random((rows, 16), np.float32))
        ii = jnp.clip(idx, 0, rows - 1)
        f = jax.jit(lambda t, i: t[i])
        ms = timeit(f, tab, ii, iters=args.iters)
        print(f"gather {args.n} idx from {rows} rows x16f: {ms:7.2f} ms",
              flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("cmd", choices=["raster", "convert", "shadow", "sort",
                                    "gather"])
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--width", type=int, default=1920)
    ap.add_argument("--height", type=int, default=1080)
    ap.add_argument("--shadow-size", type=int, default=1024)
    ap.add_argument("--n", type=int, default=3_500_000)
    args = ap.parse_args()
    {"raster": cmd_raster, "convert": cmd_convert, "shadow": cmd_shadow,
     "sort": cmd_sort, "gather": cmd_gather}[args.cmd](args)


if __name__ == "__main__":
    main()
