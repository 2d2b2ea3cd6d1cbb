"""Deferred PBR resolve: full-screen GGX point-light shading over the splat
G-buffer (reference: src/shaders/rendering/gaussianSplattingDeferredPS.glsl).

Pure element-wise jnp — XLA fuses this into a handful of VPU loops; there is
no benefit to a hand-written kernel here.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp

from ..types import RenderMode

# The reference literally defines PI as 22/7 (deferredPS:8); keep it for
# output parity.
PI_REF = 22.0 / 7.0


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class PointLight:
    position: jax.Array   # (3,)
    color: jax.Array      # (3,)
    intensity: jax.Array  # scalar

    @staticmethod
    def default() -> "PointLight":
        return PointLight(
            position=jnp.asarray([2.0, 2.0, 2.0]),
            color=jnp.ones(3),
            intensity=jnp.asarray(10.0),
        )


def _fresnel_schlick(cos_theta, f0):
    return f0 + (1.0 - f0) * jnp.clip(1.0 - cos_theta, 0.0, 1.0) ** 5


def _distribution_ggx(n_dot_h, roughness):
    a2 = (roughness * roughness) ** 2
    denom = n_dot_h * n_dot_h * (a2 - 1.0) + 1.0
    return a2 / (PI_REF * denom * denom)


def _geometry_schlick_ggx(n_dot_v, roughness):
    r = roughness + 1.0
    k = (r * r) / 8.0
    return n_dot_v / (n_dot_v * (1.0 - k) + k)


def deferred_resolve(
    gbuffer: dict,
    camera_pos: jax.Array,
    light: PointLight,
    render_mode: RenderMode = RenderMode.FINAL,
    shadow_factor: jax.Array | None = None,
) -> jax.Array:
    """G-buffer -> final (H, W, 3) image (deferredPS:101-165).

    shadow_factor: optional (H, W) in [0,1] from the cubemap shadow pass;
    0 (fully lit) when omitted.
    """
    albedo = gbuffer["albedo"][..., :3]
    mode = int(render_mode)

    if mode == int(RenderMode.PBR):
        # metallic/roughness visualization (deferredPS:105-109)
        mr = gbuffer["metal_rough"]
        return jnp.concatenate(
            [mr[..., 0:1], mr[..., 1:2], jnp.zeros_like(mr[..., :1])], axis=-1
        )
    if mode != int(RenderMode.FINAL):
        # all non-FINAL modes show raw accumulated albedo (deferredPS:113-117)
        return albedo

    pos = gbuffer["position"][..., :3]
    n = gbuffer["normal"][..., :3] * 2.0 - 1.0
    n = n / (jnp.linalg.norm(n, axis=-1, keepdims=True) + 1e-12)
    # Deviation (documented): the reference reads metallic from the G-buffer's
    # blue channel which is always written 0 (deferredPS:121 vs PS:45), so its
    # FINAL mode effectively shades with metallic=0. We read the channel that
    # actually stores metallic.
    metallic = gbuffer["metal_rough"][..., 0:1]
    roughness = gbuffer["metal_rough"][..., 1:2]

    shadow = 0.0 if shadow_factor is None else shadow_factor[..., None]

    # linearize albedo with the reference's pow-2.2 approximation (:130)
    albedo_lin = jnp.clip(albedo, 0.0, None) ** 2.2

    l_vec = light.position - pos
    d = jnp.linalg.norm(l_vec, axis=-1, keepdims=True)
    L = l_vec / (d + 1e-12)
    v_vec = camera_pos - pos
    V = v_vec / (jnp.linalg.norm(v_vec, axis=-1, keepdims=True) + 1e-12)
    H = L + V
    H = H / (jnp.linalg.norm(H, axis=-1, keepdims=True) + 1e-12)

    attenuation = 1.0 / jnp.maximum(d * d, 1e-12)
    radiance = light.color * light.intensity * attenuation

    n_dot_l = jnp.clip(jnp.sum(n * L, axis=-1, keepdims=True), 0.0, None)
    n_dot_v = jnp.clip(jnp.sum(n * V, axis=-1, keepdims=True), 0.0, None)
    n_dot_h = jnp.clip(jnp.sum(n * H, axis=-1, keepdims=True), 0.0, None)
    h_dot_v = jnp.clip(jnp.sum(H * V, axis=-1, keepdims=True), 0.0, None)

    f0 = 0.04 * (1.0 - metallic) + albedo_lin * metallic
    F = _fresnel_schlick(h_dot_v, f0)
    ndf = _distribution_ggx(n_dot_h, roughness)
    geo = _geometry_schlick_ggx(n_dot_v, roughness) * _geometry_schlick_ggx(
        n_dot_l, roughness
    )
    specular = (ndf * geo * F) / (4.0 * n_dot_v * n_dot_l + 1e-4)

    k_d = (1.0 - F) * (1.0 - metallic)
    lo = (k_d * albedo_lin / PI_REF + specular) * radiance * n_dot_l * (1.0 - shadow)

    ambient = 0.3 * albedo_lin  # deferredPS:159
    color = ambient + lo
    color = color / (color + 1.0)          # Reinhard (:161)
    return jnp.clip(color, 0.0, 1.0) ** (1.0 / 2.2)  # gamma (:162)
