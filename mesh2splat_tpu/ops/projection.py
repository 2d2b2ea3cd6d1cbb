"""EWA splat projection: the TPU-native replacement for the per-gaussian
culling/projection compute shader (reference:
src/shaders/rendering/gaussianSplattingPrepassCS.glsl). One dense vmapped
pass over all splats; atomic-append compaction becomes a validity mask.

All formulas are transcribed exactly (Jacobian signs, +0.3 low-pass, the
closed-form 2x2 eigendecomposition, the 1024 px axis clamp, the 1.05*w
frustum margin), with deviations documented inline.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp

from ..types import (
    Camera,
    RenderMode,
    SplatFormat,
    Splats,
    encode_normal,
    exponential_depth,
)
from .quat import quat_to_mat


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class ProjectedSplats:
    """Per-splat screen-space quantities, the analogue of
    ``QuadNdcTransformation`` (reference: gaussianSplattingPrepassCS.glsl:17-24)."""

    mean_ndc: jax.Array   # (N, 2)
    axes_px: jax.Array    # (N, 2, 2): [major, minor] half-axes in pixels
    conic: jax.Array      # (N, 3): inverse cov2d (a, b, c)
    depth: jax.Array      # (N,) positive view-space depth (-z_view)
    color: jax.Array      # (N, 4) render-mode-dependent rgba
    normal: jax.Array     # (N, 3) encoded normal in [0, 1]
    wspos: jax.Array      # (N, 3) world-space position
    pbr: jax.Array        # (N, 2) metallic, roughness
    valid: jax.Array      # (N,) bool

    @property
    def capacity(self):
        return self.mean_ndc.shape[0]


def _hash_random2d(co):
    """common.glsl:13-20 random2d, for GEOMETRY debug coloring."""
    dt = co[..., 0] * 12.9898 + co[..., 1] * 78.233
    sn = jnp.mod(dt, 3.14)
    return jnp.mod(jnp.sin(sn) * 43758.5453, 1.0)


@partial(
    jax.jit,
    static_argnames=("render_mode", "splat_format", "has_pbr"),
)
def project_splats(
    splats: Splats,
    camera: Camera,
    std_dev: float | jax.Array = 1.0,
    render_mode: RenderMode = RenderMode.ALBEDO,
    splat_format: SplatFormat = SplatFormat.MESH2SPLAT,
    has_pbr: bool = True,
    model_to_world: jax.Array | None = None,
    depth_map: jax.Array | None = None,
) -> ProjectedSplats:
    """Project all splats to screen space (reference: G4 main(), :58-204).

    depth_map: optional (H, W) mesh depth prepass for occlusion culling of
    opaque format-0 gaussians (reference: G4:79-91).
    """
    width, height = camera.width, camera.height
    res = jnp.asarray([width, height], jnp.float32)
    P = camera.view_to_clip
    Wv = camera.world_to_view

    if model_to_world is None:
        model_to_world = jnp.eye(4, dtype=jnp.float32)

    pos_h = jnp.concatenate(
        [splats.pos, jnp.ones_like(splats.pos[:, :1])], axis=-1
    )
    ws = pos_h @ model_to_world.T
    vs = ws @ Wv.T                          # (N, 4) view space
    clip_pos = vs @ P.T                     # (N, 4)

    # frustum cull at 1.05 * w (G4:72-76)
    margin = 1.05 * clip_pos[:, 3]
    inside = (
        (clip_pos[:, 2] >= -margin)
        & (clip_pos[:, 0] >= -margin)
        & (clip_pos[:, 0] <= margin)
        & (clip_pos[:, 1] >= -margin)
        & (clip_pos[:, 1] <= margin)
    )
    valid = jnp.logical_and(splats.valid, inside)

    # optional mesh-occlusion depth test (G4:79-91)
    if depth_map is not None and int(splat_format) == 0:
        ndc = clip_pos[:, :2] / clip_pos[:, 3:4]
        uv = ndc * 0.5 + 0.5
        # depth_map row 0 = bottom (GL window coords) by convention here
        px = jnp.clip((uv[:, 0] * width).astype(jnp.int32), 0, width - 1)
        py = jnp.clip((uv[:, 1] * height).astype(jnp.int32), 0, height - 1)
        mesh_depth = depth_map[py, px]
        my_depth = (clip_pos[:, 2] / clip_pos[:, 3]) * 0.5 + 0.5
        occluded = jnp.logical_and(
            splats.color[:, 3] > 0.95, my_depth > mesh_depth + 2e-5
        )
        valid = jnp.logical_and(valid, ~occluded)

    # scale decode (G4:93-95). Deviation: the reference computes modelScale as
    # (|col0|, |col0|, |col1|) — a transcription slip; we use (|c0|,|c1|,|c2|).
    multiplier = std_dev if int(splat_format) in (0, 3) else 1.0
    model_scale = jnp.linalg.norm(model_to_world[:3, :3], axis=0)
    scale = splats.scale * multiplier * (model_scale * model_scale)

    # cov3d = R S^2 R^T in world space, with model rotation folded in
    # (G4:97-109; common.glsl:49-60)
    R = quat_to_mat(splats.quat)            # (N, 3, 3)
    model_rot = model_to_world[:3, :3] / jnp.maximum(model_scale, 1e-12)
    R_world = model_rot @ R
    cov3d = jnp.einsum("nij,nj,nkj->nik", R_world, scale * scale, R_world)

    # EWA Jacobian (G4:152-162); z_view is negative in front of the camera
    z = vs[:, 2]
    z_safe = jnp.where(jnp.abs(z) < 1e-8, -1e-8, z)
    p00 = P[0, 0]
    p11 = P[1, 1]
    jsx = -(p00 * width) / (2.0 * z_safe)
    jsy = -(p11 * height) / (2.0 * z_safe)
    jtx = (p00 * vs[:, 0] * width) / (2.0 * z_safe * z_safe)
    jty = (p11 * vs[:, 1] * height) / (2.0 * z_safe * z_safe)

    W3 = Wv[:3, :3]
    # JW rows: row0 = (jsx,0,jtx) @ W3 ; row1 = (0,jsy,jty) @ W3
    jw0 = jsx[:, None] * W3[0] + jtx[:, None] * W3[2]
    jw1 = jsy[:, None] * W3[1] + jty[:, None] * W3[2]
    a = jnp.einsum("ni,nij,nj->n", jw0, cov3d, jw0) + 0.3
    b = jnp.einsum("ni,nij,nj->n", jw0, cov3d, jw1)
    c = jnp.einsum("ni,nij,nj->n", jw1, cov3d, jw1) + 0.3

    # closed-form eigen axes (G4:175-189)
    mid = a + c
    delta = jnp.sqrt((a - c) ** 2 + (2.0 * b) ** 2)
    lam1 = 0.5 * (mid + delta)
    lam2 = 0.5 * (mid - delta)
    valid = jnp.logical_and(valid, lam2 >= 0.0)

    dv_den = b - c + lam1
    dv_den = jnp.where(jnp.abs(dv_den) < 1e-12, 1e-12, dv_den)
    dv = jnp.stack([jnp.ones_like(a), (-a + b + lam1) / dv_den], axis=-1)
    dv = dv / (jnp.linalg.norm(dv, axis=-1, keepdims=True) + 1e-12)
    major = jnp.minimum(3.0 * jnp.sqrt(jnp.maximum(lam1, 0.0)), 1024.0)[:, None] * dv
    minor = (
        jnp.minimum(3.0 * jnp.sqrt(jnp.maximum(lam2, 0.0)), 1024.0)[:, None]
        * jnp.stack([dv[:, 1], -dv[:, 0]], axis=-1)
    )
    axes_px = jnp.stack([major, minor], axis=1)  # (N, 2, 2)

    # conic = inverse(cov2d) (G4:197; common.glsl:62-78)
    det = a * c - b * b
    det_safe = jnp.where(jnp.abs(det) < 1e-20, 1.0, det)
    conic = jnp.where(
        (jnp.abs(det) < 1e-20)[:, None],
        jnp.zeros((a.shape[0], 3)),
        jnp.stack([c, -b, a], axis=-1) / det_safe[:, None],
    )

    w_safe = jnp.where(jnp.abs(clip_pos[:, 3]) < 1e-12, 1e-12, clip_pos[:, 3])
    mean_ndc = clip_pos[:, :2] / w_safe[:, None]
    depth = -z  # positive in front

    # normals (G4:111-130)
    normal_mat = jnp.linalg.inv(model_to_world).T[:3, :3]
    n_ws = splats.normal @ normal_mat.T
    use_mesh_normal = int(splat_format) in (0, 3) or (
        int(splat_format) == 1 and has_pbr
    )
    if use_mesh_normal:
        normal_enc = encode_normal(n_ws)
    else:
        # shortest-covariance-axis normal (cites arXiv:2311.17977).
        # Deviation: the reference indexes rows of the standard rotation
        # matrix (columns of its GLSL transpose); the geometric axis is the
        # *column* of R, which is what we take.
        min_idx = jnp.argmin(splats.scale, axis=-1)
        axis = jnp.take_along_axis(
            R_world, min_idx[:, None, None], axis=2
        ).squeeze(-1)
        normal_enc = encode_normal(axis)

    # exponential depth + per-mode color (G4:111-148)
    expdepth = exponential_depth(depth, camera.near, camera.far)
    alpha = splats.color[:, 3:4]
    mode = int(render_mode)
    if mode in (0, 6):
        color = splats.color
    elif mode == 1:
        color = jnp.concatenate([jnp.repeat(expdepth[:, None], 3, -1), alpha], -1)
    elif mode == 2:
        color = jnp.concatenate([normal_enc, alpha], axis=-1)
    elif mode == 3:
        gid = jnp.arange(splats.capacity, dtype=jnp.float32)
        co = jnp.stack([gid % 4096.0, gid // 4096.0], axis=-1)
        color = jnp.stack(
            [
                _hash_random2d(co),
                _hash_random2d(co[:, ::-1]),
                _hash_random2d(co[:, ::-1] * 1.234),
                jnp.ones_like(gid),
            ],
            axis=-1,
        )
    else:  # OVERDRAW and PBR resolve handled downstream
        color = splats.color

    return ProjectedSplats(
        mean_ndc=mean_ndc,
        axes_px=axes_px,
        conic=conic,
        depth=depth,
        color=color,
        normal=normal_enc,
        wspos=ws[:, :3],
        pbr=splats.pbr,
        valid=valid,
    )
