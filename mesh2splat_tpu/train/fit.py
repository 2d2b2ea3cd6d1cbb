"""Differentiable splat refinement: optimize splat parameters (and,
optionally, source textures through conversion) against target images.

This is NEW capability over the forward-only reference (SURVEY.md: "no
training, no autodiff") and the core of the BASELINE north star: a
differentiable pipeline with hand-written rasterizer VJP, data-parallel over
cameras with gradient psum.

Parameterization follows 3DGS storage conventions (types.py docstring):
opacity through a sigmoid (logit params), scale through exp (log params),
quaternions normalized on use.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import optax

from ..types import Camera, RenderMode, SplatFormat, Splats, inv_sigmoid, sigmoid
from ..ops.projection import project_splats
from ..render.rasterize import rasterize_dense
from ..render.tiled import rasterize_tiled


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class SplatParams:
    """Unconstrained optimization view of Splats."""

    pos: jax.Array        # (N, 3)
    color: jax.Array      # (N, 3) rgb
    opacity_logit: jax.Array  # (N,)
    log_scale: jax.Array  # (N, 3)
    quat: jax.Array       # (N, 4) unnormalized wxyz
    normal: jax.Array     # (N, 3)
    pbr: jax.Array        # (N, 2)

    @staticmethod
    def from_splats(s: Splats) -> "SplatParams":
        return SplatParams(
            pos=s.pos,
            color=s.color[:, :3],
            opacity_logit=inv_sigmoid(jnp.clip(s.color[:, 3], 1e-4, 1.0 - 1e-4)),
            log_scale=jnp.log(jnp.maximum(s.scale, 1e-12)),
            quat=s.quat,
            normal=s.normal,
            pbr=s.pbr,
        )

    def to_splats(self, valid) -> Splats:
        q = self.quat / (jnp.linalg.norm(self.quat, axis=-1, keepdims=True) + 1e-12)
        return Splats(
            pos=self.pos,
            color=jnp.concatenate(
                [self.color, sigmoid(self.opacity_logit)[:, None]], axis=-1
            ),
            scale=jnp.exp(self.log_scale),
            normal=self.normal,
            quat=q,
            pbr=self.pbr,
            valid=valid,
        )


def render_rgb(
    splats: Splats,
    camera: Camera,
    width: int,
    height: int,
    std_dev: float = 1.0,
    splat_format: SplatFormat = SplatFormat.PLY_3DGS,
    use_tiled: bool = True,
    pair_capacity: int = 0,
):
    """Differentiable RGB render (premultiplied albedo over black)."""
    proj = project_splats(
        splats, camera, std_dev=std_dev, render_mode=RenderMode.ALBEDO,
        splat_format=splat_format,
    )
    if use_tiled:
        out = rasterize_tiled(
            proj, width, height, albedo_only=True,
            pair_capacity=pair_capacity,
        )
    else:
        out = rasterize_dense(proj, width, height)
    return out["albedo"][..., :3]


def l2_loss(params: SplatParams, valid, cameras: Camera, targets, width, height,
            std_dev=1.0, use_tiled=True, pair_capacity=0):
    """Mean L2 over a *batch* of cameras (leading dim) and target images."""
    splats = params.to_splats(valid)

    def one(cam_tree, target):
        img = render_rgb(splats, cam_tree, width, height, std_dev,
                         use_tiled=use_tiled, pair_capacity=pair_capacity)
        return jnp.mean((img - target) ** 2)

    losses = jax.vmap(one)(cameras, targets)
    return jnp.mean(losses)


@dataclasses.dataclass
class FitConfig:
    steps: int = 100
    lr: float = 1e-2
    width: int = 128
    height: int = 128
    std_dev: float = 1.0
    use_tiled: bool = True


def fit_splats(
    splats: Splats,
    cameras: Camera,        # batched pytree (leading dim = #views)
    targets: jax.Array,     # (V, H, W, 3)
    config: FitConfig,
    devices_mesh=None,      # jax.sharding.Mesh for data-parallel views
):
    """Adam refinement of splat params. With a device mesh, views are sharded
    over 'dp' and gradients all-reduced (psum overlapped with backward by
    XLA's scheduler)."""
    params = SplatParams.from_splats(splats)
    valid = splats.valid
    tx = optax.adam(config.lr)
    opt_state = tx.init(params)

    pair_cap = 0
    if config.use_tiled:
        # size the class-C overflow budget to the worst view: ONE vmapped
        # projection over all views + max of required_overflow, one compile
        # and one host readback (round-4 weak #7: this used to be V
        # sequential jit dispatches with V readbacks)
        from ..render.binning import required_overflow

        @jax.jit
        def worst_view_need(splats, cameras):
            def one(cam_tree):
                proj = project_splats(
                    splats, cam_tree, std_dev=config.std_dev,
                    render_mode=RenderMode.ALBEDO,
                )
                return required_overflow(proj, config.width, config.height)

            return jnp.max(jax.vmap(one)(cameras))

        need_p = int(worst_view_need(splats, cameras))
        from ..render.binning import round_pow2_budget

        pair_cap = round_pow2_budget(need_p)

    step = jax.jit(
        train_step_fn(
            tx, config.width, config.height, std_dev=config.std_dev,
            use_tiled=config.use_tiled, mesh=devices_mesh,
            pair_capacity=pair_cap,
        )
    )

    history = []
    for _ in range(config.steps):
        params, opt_state, loss = step(params, opt_state, valid, cameras, targets)
        history.append(float(loss))
    return params.to_splats(valid), history


def train_step_fn(tx, width, height, std_dev=1.0, use_tiled=True, mesh=None,
                  pair_capacity=0):
    """Returns a jittable (params, opt_state, valid, cameras, targets) ->
    (params, opt_state, loss) step — the building block the multichip dryrun
    compiles over an N-device mesh."""
    loss_fn = partial(l2_loss, width=width, height=height, std_dev=std_dev,
                      use_tiled=use_tiled, pair_capacity=pair_capacity)

    if mesh is not None:
        from jax.sharding import PartitionSpec as P

        def wrapped(params, valid, cameras, targets):
            def local(params, valid, cameras, targets):
                return jax.lax.pmean(loss_fn(params, valid, cameras, targets), "dp")

            return jax.shard_map(
                local, mesh=mesh, in_specs=(P(), P(), P("dp"), P("dp")),
                out_specs=P(), check_vma=False,
            )(params, valid, cameras, targets)

        grad_fn = jax.value_and_grad(wrapped)
    else:
        grad_fn = jax.value_and_grad(loss_fn)

    def step(params, opt_state, valid, cameras, targets):
        loss, grads = grad_fn(params, valid, cameras, targets)
        updates, opt_state = tx.update(grads, opt_state)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return step


# ---------------------------------------------------------------------------
# end-to-end texture optimization (north star: "gradients flow ... through
# conversion to source textures")
# ---------------------------------------------------------------------------


@dataclasses.dataclass
class FitTexturesConfig:
    steps: int = 60
    lr: float = 5e-2
    width: int = 64
    height: int = 64
    use_tiled: bool = True


def fit_textures(
    mesh_geom,              # TriangleMesh
    material,               # Material (base_color is the init guess)
    conv_config,            # ConversionConfig
    cameras: Camera,        # batched pytree (leading dim = #views)
    targets: jax.Array,     # (V, H, W, 3)
    config: FitTexturesConfig,
):
    """Optimize the SOURCE base-color texture by differentiating the full
    mesh -> convert -> project -> rasterize -> L2 pipeline. The reference
    cannot do this at all (forward-only GL); it is the defining new
    capability of the differentiable conversion (BASELINE north star).

    Returns (material with fitted texture, loss history)."""
    from ..ops.conversion import convert

    lo, hi = mesh_geom.bbox()
    tex0 = material.base_color
    tx = optax.adam(config.lr)
    opt_state = tx.init(tex0)

    def loss_fn(tex):
        mat = dataclasses.replace(material, base_color=tex,
                                  has_base_color=True)
        splats = convert(mesh_geom, mat, lo, hi, conv_config)

        def one(cam_tree, target):
            img = render_rgb(
                splats, cam_tree, config.width, config.height,
                std_dev=conv_config.scale_multiplier,
                splat_format=SplatFormat.MESH2SPLAT,
                use_tiled=config.use_tiled,
            )
            return jnp.mean((img - target) ** 2)

        return jnp.mean(jax.vmap(one)(cameras, targets))

    @jax.jit
    def step(tex, opt_state):
        loss, grad = jax.value_and_grad(loss_fn)(tex)
        updates, opt_state = tx.update(grad, opt_state)
        tex = optax.apply_updates(tex, updates)
        tex = jnp.clip(tex, 0.0, 1.0)
        return tex, opt_state, loss

    tex = tex0
    history = []
    for _ in range(config.steps):
        tex, opt_state, loss = step(tex, opt_state)
        history.append(float(loss))
    fitted = dataclasses.replace(material, base_color=tex,
                                 has_base_color=True)
    return fitted, history
