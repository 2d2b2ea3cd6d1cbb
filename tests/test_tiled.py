"""Tiled Pallas rasterizer vs the dense reference implementation: forward
allclose + hand-written VJP vs autodiff gradients (SURVEY.md section 4
item 3; BASELINE north star 'pixel gradients allclose')."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mesh2splat_tpu.types import RenderMode, SplatFormat, Splats, make_camera
from mesh2splat_tpu.ops.projection import project_splats
from mesh2splat_tpu.render.rasterize import rasterize_dense
from mesh2splat_tpu.render.tiled import rasterize_tiled
from mesh2splat_tpu.render import binning

W, H = 256, 64  # 2x2 grid of (8,128) tiles vertically stacked 8x


def make_cam(w=W, h=H):
    return make_camera(
        eye=[0, 0, 5], center=[0, 0, 0], up=[0, 1, 0],
        fov_y_rad=np.pi / 3, width=w, height=h,
    )


def random_splats(n, seed=0, spread=1.0, alpha_max=0.95):
    rng = np.random.default_rng(seed)
    pos = rng.uniform(-spread, spread, (n, 3)).astype(np.float32)
    q = rng.normal(size=(n, 4)).astype(np.float32)
    q /= np.linalg.norm(q, axis=-1, keepdims=True)
    return Splats(
        pos=jnp.asarray(pos),
        color=jnp.asarray(
            rng.uniform(0.05, 1.0, (n, 4)).astype(np.float32)
            * np.array([1, 1, 1, alpha_max], np.float32)
        ),
        scale=jnp.asarray(rng.uniform(0.02, 0.3, (n, 3)).astype(np.float32)),
        normal=jnp.asarray(
            (lambda v: v / np.linalg.norm(v, axis=-1, keepdims=True))(
                rng.normal(size=(n, 3))
            ).astype(np.float32)
        ),
        quat=jnp.asarray(q),
        pbr=jnp.asarray(rng.uniform(0, 1, (n, 2)).astype(np.float32)),
        valid=jnp.ones((n,), bool),
    )


def project(sp, w=W, h=H):
    return project_splats(
        sp, make_cam(w, h), std_dev=1.0,
        splat_format=SplatFormat.PLY_3DGS, has_pbr=True,
    )


@pytest.mark.parametrize("n,seed", [(40, 0), (200, 1)])
def test_tiled_matches_dense_forward(n, seed):
    proj = project(random_splats(n, seed))
    dense = rasterize_dense(proj, W, H)
    tiled = rasterize_tiled(proj, W, H, interpret=True)
    for key in ("albedo", "position", "normal", "depth", "metal_rough"):
        np.testing.assert_allclose(
            np.asarray(tiled[key]), np.asarray(dense[key]), atol=5e-3,
            err_msg=key,
        )


def test_tiled_early_exit_opaque():
    """Fully opaque stacked splats: early-out must not change the image
    beyond the 1/255 threshold."""
    sp = random_splats(100, 3, spread=0.2, alpha_max=1.0)
    proj = project(sp)
    dense = rasterize_dense(proj, W, H)
    tiled = rasterize_tiled(proj, W, H, interpret=True)
    np.testing.assert_allclose(
        np.asarray(tiled["albedo"]), np.asarray(dense["albedo"]), atol=2e-2
    )


def test_binning_pairs_cover_dense_coverage():
    """Every pixel the dense rasterizer touches must lie in a tile whose
    pair list contains that splat."""
    sp = random_splats(30, 2)
    proj = project(sp)
    binned = binning.bin_pairs(proj, W, H, c_capacity=30 * 16)
    counts = np.asarray(binned.tile_counts)
    dense = rasterize_dense(proj, W, H)
    covered = np.asarray(dense["albedo"])[..., 3] > 0
    ty, tx = binning.tiles_for(W, H)
    tiles_with_coverage = np.zeros((ty, tx), bool)
    for r in range(H):
        for c in range(W):
            if covered[r, c]:
                tiles_with_coverage[
                    r // binning.TILE_H, c // binning.TILE_W
                ] = True
    assert np.all(counts.reshape(ty, tx)[tiles_with_coverage] > 0)


def test_tiled_gradients_match_dense():
    """The hand-written backward kernel must agree with XLA autodiff through
    the dense reference implementation."""
    sp = random_splats(25, 4, alpha_max=0.9)
    wgt = jnp.asarray(
        np.random.default_rng(9).uniform(0, 1, (H, W, 4)).astype(np.float32)
    )

    def loss_via(rasterizer):
        def f(pos, color):
            s2 = Splats(pos=pos, color=color, scale=sp.scale, normal=sp.normal,
                        quat=sp.quat, pbr=sp.pbr, valid=sp.valid)
            proj = project(s2)
            out = rasterizer(proj)
            return (
                jnp.sum(out["albedo"] * wgt)
                + 0.3 * jnp.sum(out["normal"][..., :3])
                + 0.2 * jnp.sum(out["position"][..., :3] * wgt[..., :3])
                + 0.1 * jnp.sum(out["depth"][..., 0])
                + 0.1 * jnp.sum(out["metal_rough"][..., :2])
            )
        return f

    dense_fn = loss_via(lambda p: rasterize_dense(p, W, H))
    tiled_fn = loss_via(lambda p: rasterize_tiled(p, W, H, interpret=True))

    gd_pos, gd_col = jax.grad(dense_fn, argnums=(0, 1))(sp.pos, sp.color)
    gt_pos, gt_col = jax.grad(tiled_fn, argnums=(0, 1))(sp.pos, sp.color)

    np.testing.assert_allclose(
        np.asarray(gt_col), np.asarray(gd_col), rtol=2e-2, atol=2e-3
    )
    np.testing.assert_allclose(
        np.asarray(gt_pos), np.asarray(gd_pos), rtol=2e-2, atol=2e-2
    )


def test_tiled_gradient_finite_differences():
    """Direct finite-difference check of the custom VJP (independent of the
    dense implementation)."""
    sp = random_splats(10, 5, alpha_max=0.8)

    def f(color):
        s2 = Splats(pos=sp.pos, color=color, scale=sp.scale, normal=sp.normal,
                    quat=sp.quat, pbr=sp.pbr, valid=sp.valid)
        out = rasterize_tiled(project(s2), W, H, interpret=True)
        return jnp.sum(out["albedo"][..., 0] ** 2)

    g = jax.grad(f)(sp.color)
    eps = 1e-3
    rng = np.random.default_rng(0)
    for _ in range(3):
        i = rng.integers(0, 10)
        j = rng.integers(0, 4)
        e = np.zeros((10, 4), np.float32)
        e[i, j] = eps
        fd = (float(f(sp.color + jnp.asarray(e))) - float(f(sp.color - jnp.asarray(e)))) / (2 * eps)
        assert abs(fd - float(g[i, j])) < 5e-2 * max(1.0, abs(fd)), (i, j, fd, float(g[i, j]))


def test_albedo_only_matches_full():
    """albedo_only fast path: identical rgba + matching gradients."""
    sp = random_splats(60, 7)
    proj = project(sp)
    full = rasterize_tiled(proj, W, H, interpret=True)
    fast = rasterize_tiled(proj, W, H, interpret=True, albedo_only=True)
    np.testing.assert_allclose(
        np.asarray(fast["albedo"]), np.asarray(full["albedo"]), atol=1e-6
    )

    def loss(color, albedo_only):
        s2 = Splats(pos=sp.pos, color=color, scale=sp.scale, normal=sp.normal,
                    quat=sp.quat, pbr=sp.pbr, valid=sp.valid)
        out = rasterize_tiled(project(s2), W, H, interpret=True,
                              albedo_only=albedo_only)
        return jnp.sum(out["albedo"] ** 2)

    g_full = jax.grad(lambda c: loss(c, False))(sp.color)
    g_fast = jax.grad(lambda c: loss(c, True))(sp.color)
    np.testing.assert_allclose(np.asarray(g_fast), np.asarray(g_full),
                               rtol=1e-4, atol=1e-6)


def test_overdraw_tiled_matches_dense():
    import numpy as np
    import jax.numpy as jnp

    from mesh2splat_tpu.render.rasterize import rasterize_dense
    from mesh2splat_tpu.render.tiled import rasterize_tiled
    from mesh2splat_tpu.types import RenderMode

    proj = project(random_splats(300, seed=123))
    dense = rasterize_dense(proj, W, H, render_mode=RenderMode.OVERDRAW)
    tiled = rasterize_tiled(proj, W, H, render_mode=RenderMode.OVERDRAW,
                            interpret=True)
    np.testing.assert_allclose(
        np.asarray(tiled["albedo"]), np.asarray(dense["albedo"]), atol=1e-5
    )


def test_closeup_class_c_no_silent_drops():
    """A close-up camera pushes most splats to multi-tile spans (class C):
    the calibrated budget must render identically to dense with a zero
    dropped-pair count, and an undersized budget must REPORT its drops
    (round-2 weak #3: drops used to be silent)."""
    sp = random_splats(120, seed=7, spread=0.6)
    cam = make_camera(
        eye=[0, 0, 1.2], center=[0, 0, 0], up=[0, 1, 0],
        fov_y_rad=np.pi / 2.2, width=W, height=H,
    )
    proj = project_splats(
        sp, cam, std_dev=1.0, splat_format=SplatFormat.PLY_3DGS, has_pbr=True
    )
    # most splats must span multiple tiles for this test to bite
    n_c = int(binning.required_overflow(proj, W, H))
    assert n_c > 360

    cap = int(np.ceil(n_c / 128)) * 128
    dense = rasterize_dense(proj, W, H)
    tiled = rasterize_tiled(proj, W, H, pair_capacity=cap, interpret=True)
    assert int(tiled["dropped_pairs"]) == 0
    np.testing.assert_allclose(
        np.asarray(tiled["albedo"]), np.asarray(dense["albedo"]), atol=5e-3
    )

    starved = rasterize_tiled(
        proj, W, H, pair_capacity=cap // 4, interpret=True
    )
    assert int(starved["dropped_pairs"]) == n_c - cap // 4


def test_binner_rejects_oversized_image():
    """packed_geom carries tx0/ty0/sx in 7+11+7 bits; images beyond that
    must be rejected loudly instead of corrupting tiles."""
    sp = random_splats(8, seed=3)
    proj = project(sp)
    with pytest.raises(ValueError, match="packed-geometry"):
        binning.bin_pairs(proj, 128 * 130, 64)


@pytest.mark.parametrize("variant", list(binning.VARIANT_FIELDS))
def test_bitcast_gather_roundtrip(variant):
    """On-device guard for the class-C merged gather's int32->f32 bitcast
    lanes (binning.py): the packed geometry ints are OR'd with bit 30 so the
    f32 lane is a NORMAL bit pattern (raw values < 2^25 are denormals, which
    XLA does not promise to preserve through f32 data movement on TPU). This
    exercises the exact op chain — stack / bitcast / concatenate / gather /
    bitcast — at each variant's record width and asserts bit-exactness."""
    nf = len(binning.VARIANT_FIELDS[variant])
    n, c = 4096, 8192
    rng = np.random.default_rng(7)
    off = jnp.asarray(rng.integers(0, 1 << 24, n, dtype=np.int32))
    geom = jnp.asarray(rng.integers(0, 1 << 25, n, dtype=np.int32))
    vals = jnp.asarray(rng.standard_normal((n, nf + 1)).astype(np.float32))
    owner = jnp.asarray(rng.integers(0, n, c, dtype=np.int32))

    b30 = np.int32(1 << 30)

    @jax.jit
    def chain(off, geom, vals, owner):
        geom2f = jax.lax.bitcast_convert_type(
            jnp.stack([off | b30, geom | b30], axis=1), jnp.float32
        )
        rec = jnp.concatenate([geom2f, vals], axis=1)
        rec_c = jax.lax.optimization_barrier(rec[owner])
        gc = jax.lax.bitcast_convert_type(rec_c[:, 0:2], jnp.int32) & ~b30
        return gc[:, 0], gc[:, 1], rec_c[:, 2:]

    off_c, geom_c, vals_c = chain(off, geom, vals, owner)
    np.testing.assert_array_equal(np.asarray(off_c), np.asarray(off)[np.asarray(owner)])
    np.testing.assert_array_equal(np.asarray(geom_c), np.asarray(geom)[np.asarray(owner)])
    np.testing.assert_array_equal(np.asarray(vals_c), np.asarray(vals)[np.asarray(owner)])


def test_composite_rejects_unaligned_pair_axis():
    """Kernel windows are CHUNK-aligned DMAs; an unpadded pair axis would
    let the last window overrun the array, where pl.ds clamps the start and
    silently composites shifted rows (found in round 5 when the compact
    N + cap layout removed round-4's 3N slack). bin_pairs pads; direct
    callers must be rejected loudly."""
    from mesh2splat_tpu.render import composite as C

    proj = project(random_splats(20, seed=11))
    binned = binning.bin_pairs(proj, W, H, c_capacity=256, variant="full")
    assert binned.fields.shape[1] % binning.CHUNK == 0

    bad = binned.fields[:, :-8]  # strip the pad -> unaligned
    ty, tx = binning.tiles_for(W, H)
    with pytest.raises(ValueError, match="multiple of"):
        C.composite_tiles(bad, binned.tile_starts,
                          jnp.asarray([H], jnp.int32), ty, tx, True, False)


def test_binning_alignment_shift_invariance():
    """The composited image must not depend on where tile windows fall
    relative to CHUNK boundaries: prepending CHUNK dead rows (shifting every
    start) must reproduce the image bit-for-bit up to f32 association."""
    from mesh2splat_tpu.render import composite as C

    proj = project(random_splats(150, seed=13, spread=0.5))
    binned = binning.bin_pairs(proj, W, H, c_capacity=1024, variant="full")
    ty, tx = binning.tiles_for(W, H)
    h_arr = jnp.asarray([H], jnp.int32)
    img = C.composite_tiles(binned.fields, binned.tile_starts, h_arr,
                            ty, tx, True, False)
    shifted_fields = jnp.pad(binned.fields, ((0, 0), (binning.CHUNK, 0)))
    img2 = C.composite_tiles(shifted_fields,
                             binned.tile_starts + binning.CHUNK, h_arr,
                             ty, tx, True, False)
    np.testing.assert_allclose(np.asarray(img2), np.asarray(img), atol=1e-5)
