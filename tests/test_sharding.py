"""Distributed tests on the 8-virtual-device CPU mesh (SURVEY.md section 4
item 4): sharded conversion equivalence, data-parallel training step,
multichip dryrun."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mesh2splat_tpu.types import Material, Splats, TriangleMesh, make_camera
from mesh2splat_tpu.ops.conversion import ConversionConfig, convert
from mesh2splat_tpu.parallel.sharding import (
    convert_sharded, make_mesh, shard_batch,
)
from mesh2splat_tpu.train.fit import (
    FitConfig, SplatParams, fit_splats, render_rgb,
)


def quad_mesh():
    v = np.array([[-0.5, -0.5, 0], [0.5, -0.5, 0], [0.5, 0.5, 0], [-0.5, 0.5, 0]],
                 np.float32)
    tris = np.array([[0, 1, 2], [0, 2, 3]])
    return TriangleMesh(
        tri_pos=jnp.asarray(v[tris]),
        tri_normal=jnp.asarray(np.broadcast_to([0, 0, 1.0], (2, 3, 3)).copy().astype(np.float32)),
        tri_tangent=jnp.asarray(np.broadcast_to([1, 0, 0, 1.0], (2, 3, 4)).copy().astype(np.float32)),
        tri_uv=jnp.asarray((v[tris][..., :2] + 0.5).copy()),
    )


def test_eight_devices():
    assert len(jax.devices()) == 8


def test_sharded_conversion_matches_single():
    """Conversion sharded over triangles must produce the same set of live
    splats as single-device conversion."""
    mesh = quad_mesh()
    cfg = ConversionConfig(resolution=16, layers=2)
    lo, hi = mesh.bbox()
    single = convert(mesh, Material.default(), lo, hi, cfg)

    dev_mesh = make_mesh(2)
    sharded = convert_sharded(mesh, Material.default(), lo, hi, cfg, dev_mesh)
    assert int(sharded.count()) == int(single.count())

    def live_set(s):
        v = np.asarray(s.valid)
        rows = np.concatenate(
            [np.asarray(s.pos)[v], np.asarray(s.color)[v], np.asarray(s.scale)[v]],
            axis=-1,
        )
        return set(map(tuple, np.round(rows, 5).tolist()))

    assert live_set(sharded) == live_set(single)


def test_data_parallel_training_step_matches_single():
    """pmean'd sharded loss/grads == single-device loss/grads."""
    from mesh2splat_tpu.train.fit import l2_loss

    mesh = quad_mesh()
    cfg = ConversionConfig(resolution=8, layers=2)
    splats = convert(mesh, Material.default(), *mesh.bbox(), cfg)
    params = SplatParams.from_splats(splats)

    n_views = 8
    cams = [
        make_camera(
            eye=[np.sin(a), 0.2, 1.5 + 0.1 * np.cos(a)], center=[0, 0, 0],
            up=[0, 1, 0], fov_y_rad=np.pi / 3, width=16, height=16,
        )
        for a in np.linspace(0, 1, n_views)
    ]
    cameras = jax.tree.map(lambda *xs: jnp.stack(xs), *cams)
    targets = jnp.zeros((n_views, 16, 16, 3))

    single_loss, single_grads = jax.value_and_grad(l2_loss)(
        params, splats.valid, cameras, targets, 16, 16,
        std_dev=cfg.scale_multiplier,
    )

    from jax.sharding import PartitionSpec as P

    dev_mesh = make_mesh(8)

    def sharded(params, valid, cameras, targets):
        def local(params, valid, cameras, targets):
            return jax.lax.pmean(
                l2_loss(params, valid, cameras, targets, 16, 16,
                        std_dev=cfg.scale_multiplier),
                "dp",
            )
        return jax.shard_map(
            local, mesh=dev_mesh, in_specs=(P(), P(), P("dp"), P("dp")),
            out_specs=P(), check_vma=False,
        )(params, valid, cameras, targets)

    sh_loss, sh_grads = jax.jit(jax.value_and_grad(sharded))(
        params, splats.valid, cameras, targets
    )

    np.testing.assert_allclose(float(sh_loss), float(single_loss), rtol=1e-5)
    for a, b in zip(jax.tree.leaves(sh_grads), jax.tree.leaves(single_grads)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6)


def test_fit_splats_reduces_loss():
    """Optimizing splat color toward a black target must reduce loss."""
    mesh = quad_mesh()
    cfg = ConversionConfig(resolution=8, layers=2)
    splats = convert(mesh, Material.default(), *mesh.bbox(), cfg)

    cams = [
        make_camera(eye=[0, 0, 2], center=[0, 0, 0], up=[0, 1, 0],
                    fov_y_rad=np.pi / 3, width=16, height=16)
    ]
    cameras = jax.tree.map(lambda *xs: jnp.stack(xs), *cams)
    targets = jnp.zeros((1, 16, 16, 3))

    _, history = fit_splats(
        splats, cameras, targets,
        FitConfig(steps=15, lr=5e-2, width=16, height=16,
                  std_dev=cfg.scale_multiplier),
    )
    assert history[-1] < history[0] * 0.7, history


def test_dryrun_multichip():
    import sys
    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)


def test_rasterize_sharded_matches_single_device():
    """Image-tile (band) sharded rasterization == single-device tiled."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from mesh2splat_tpu.ops.conversion import ConversionConfig, convert
    from mesh2splat_tpu.ops.projection import project_splats
    from mesh2splat_tpu.parallel.sharding import make_mesh, rasterize_sharded
    from mesh2splat_tpu.render.tiled import rasterize_tiled
    from mesh2splat_tpu.types import (
        Material, RenderMode, SplatFormat, TriangleMesh, make_camera,
    )

    v = np.array([[-0.5, -0.5, 0], [0.5, -0.5, 0], [0.5, 0.5, 0], [-0.5, 0.5, 0]],
                 np.float32)
    tris = np.array([[0, 1, 2], [0, 2, 3]])
    mesh_geom = TriangleMesh(
        tri_pos=jnp.asarray(v[tris]),
        tri_normal=jnp.asarray(
            np.broadcast_to([0, 0, 1.0], (2, 3, 3)).copy().astype(np.float32)),
        tri_tangent=jnp.asarray(
            np.broadcast_to([1, 0, 0, 1.0], (2, 3, 4)).copy().astype(np.float32)),
        tri_uv=jnp.asarray((v[tris][..., :2] + 0.5).copy()),
    )
    cfg = ConversionConfig(resolution=32, layers=3)
    lo, hi = mesh_geom.bbox()
    sp = convert(mesh_geom, Material.default(), lo, hi, cfg)
    # jitter depths to be unique: a flat quad puts many splats at EXACTLY
    # equal view depth, where composite order falls to the tie-break — and
    # band binning's class-A/C split (hence tie order) legitimately differs
    # from the single-device split (the documented binning.py caveat).
    # This test guards band DECOMPOSITION equivalence, not tie order.
    import dataclasses as _dc

    # strictly increasing spacing (1e-5 >> f32 ulp at depth ~2) so no two
    # splats share a depth even after f32 rounding
    zj = (np.arange(sp.pos.shape[0]) * 1e-5).astype(np.float32)
    sp = _dc.replace(
        sp, pos=sp.pos + jnp.asarray(zj)[:, None] * jnp.asarray([0, 0, 1.0])
    )

    w, h = 128, 256  # 8 devices x TILE_H=32 -> band 32 rows
    cam = make_camera(eye=[0.4, 0.3, 2], center=[0, 0, 0], up=[0, 1, 0],
                      fov_y_rad=np.pi / 3, width=w, height=h)
    proj = project_splats(sp, cam, std_dev=cfg.scale_multiplier,
                          render_mode=RenderMode.ALBEDO,
                          splat_format=SplatFormat.MESH2SPLAT)

    single = rasterize_tiled(proj, w, h, albedo_only=True)["albedo"]
    dev_mesh = make_mesh(len(jax.devices()))
    banded = rasterize_sharded(proj, w, h, dev_mesh, albedo_only=True)
    # atol: banded tiles' pair lists start at different absolute offsets, so
    # the composite kernel's CHUNK boundaries (f32 association of the
    # transmittance products, and the 1/255 early-exit cut) fall differently
    # — a decomposition artifact bounded well below one 8-bit step (1/255 ~
    # 3.9e-3); observed <= ~2e-4, so 5e-4 keeps ~2x headroom while still
    # catching a real decomposition regression
    np.testing.assert_allclose(
        np.asarray(banded), np.asarray(single), atol=5e-4
    )


def _random_params(n, seed=0):
    from mesh2splat_tpu.train.fit import SplatParams

    rng = np.random.default_rng(seed)
    return SplatParams(
        pos=jnp.asarray(rng.uniform(-0.5, 0.5, (n, 3)), jnp.float32),
        color=jnp.asarray(rng.uniform(0, 1, (n, 3)), jnp.float32),
        opacity_logit=jnp.zeros((n,), jnp.float32),
        log_scale=jnp.full((n, 3), -4.0, jnp.float32),
        quat=jnp.tile(jnp.asarray([1.0, 0, 0, 0], jnp.float32), (n, 1)),
        normal=jnp.tile(jnp.asarray([0.0, 0, 1], jnp.float32), (n, 1)),
        pbr=jnp.zeros((n, 2), jnp.float32),
    )


def test_scaling_bound_compiled_program():
    """Structural scaling guard (round-2 weak #5, reworked in round 4): the
    compiled 8-device data-parallel training step must (a) reduce gradients
    with a real collective on the PRODUCTION tiled path, and (b) do ~1/8 of
    the single-device FLOPs per device on a representative workload (100k
    splats, 256^2 views).

    The FLOPs-scaling half runs on the dense rasterizer (use_tiled=False):
    XLA's cost_analysis counts a vmapped Pallas custom call ONCE regardless
    of the batch dimension (measured round 4: tiled loss = 27.2M fixed +
    0.7M/view while the pure-XLA dense loss = 21.4M/view exactly), so
    per-device FLOPs on the tiled path can never reflect view sharding.
    The dense path has the same train-step structure (to_splats -> vmap over
    views -> project -> rasterize -> L2 -> pmean/psum), is costed honestly,
    and compiles without executing, so representative scale is free.
    Gradient-equivalence of the tiled sharded step is executed for real in
    test_data_parallel_training_step_matches_single."""
    from jax.sharding import PartitionSpec as P

    from mesh2splat_tpu.train.fit import l2_loss, train_step_fn

    n_splats = 100_000
    params = _random_params(n_splats)
    valid = jnp.ones((n_splats,), bool)

    n_views, w, h = 8, 256, 256
    cams = [
        make_camera(
            eye=[np.sin(a), 0.2, 1.5], center=[0, 0, 0], up=[0, 1, 0],
            fov_y_rad=np.pi / 3, width=w, height=h,
        )
        for a in np.linspace(0, 1, n_views)
    ]
    cameras = jax.tree.map(lambda *xs: jnp.stack(xs), *cams)
    targets = jnp.zeros((n_views, h, w, 3))

    dev_mesh = make_mesh(8)

    # ---- (a) production tiled step: real collective over the mesh --------
    import optax

    step = train_step_fn(optax.sgd(1e-3), w, h, std_dev=1.0, use_tiled=True,
                         mesh=dev_mesh, pair_capacity=1 << 15)
    tx = optax.sgd(1e-3)
    opt_state = tx.init(params)
    c_tiled = jax.jit(step).lower(
        params, opt_state, valid, cameras, targets
    ).compile()
    hlo = c_tiled.as_text()
    assert "all-reduce" in hlo, "sharded tiled step lost its gradient all-reduce"

    # ---- (b) per-device FLOPs scale on the honestly-costed dense path ----
    def single(params, valid, cameras, targets):
        return l2_loss(params, valid, cameras, targets, w, h,
                       use_tiled=False)

    def sharded(params, valid, cameras, targets):
        def local(params, valid, cameras, targets):
            return jax.lax.pmean(
                l2_loss(params, valid, cameras, targets, w, h,
                        use_tiled=False),
                "dp",
            )
        return jax.shard_map(
            local, mesh=dev_mesh, in_specs=(P(), P(), P("dp"), P("dp")),
            out_specs=P(), check_vma=False,
        )(params, valid, cameras, targets)

    args = (params, valid, cameras, targets)
    c_single = jax.jit(jax.value_and_grad(single)).lower(*args).compile()
    c_sharded = jax.jit(jax.value_and_grad(sharded)).lower(*args).compile()
    assert "all-reduce" in c_sharded.as_text()

    f_single = c_single.cost_analysis()["flops"]
    f_sharded = c_sharded.cost_analysis()["flops"]
    # ideal 0.125; 0.2 leaves room for the replicated to_splats/optimizer
    # prologue while still failing if any per-view work is replicated
    assert f_sharded < f_single * 0.2, (
        f"per-device flops {f_sharded:.3g} vs single {f_single:.3g}: "
        "the view-parallel work is no longer sharded"
    )
