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


def axes_from_conic(ca, cb, cc):
    """3-sigma-clamped eigen half-axes of the 2D covariance, recovered from
    its inverse (the conic) — the same closed-form eigendecomposition as the
    reference prepass (G4:175-189), expressed on the conic so the compositing
    kernel can recompute axes from the 3 carried conic floats instead of
    carrying 4 axis floats per pair.

    project_splats routes its axes_px through this helper too, so the dense
    reference rasterizer, the tile binner and the Pallas kernel all see
    bit-identical axes. Degenerate conics (zeroed by the det_ok guard, or
    non-elliptic) yield zero axes => zero coverage.

    Inputs are broadcastable f32 columns; returns (mjx, mjy, mnx, mny)."""
    det_c = ca * cc - cb * cb
    ok = det_c > 1e-30
    dsafe = jnp.where(ok, det_c, 1.0)
    a = cc / dsafe
    b = -cb / dsafe
    c = ca / dsafe
    mid = a + c
    delta = jnp.sqrt((a - c) ** 2 + (2.0 * b) ** 2)
    lam1 = 0.5 * (mid + delta)
    lam2 = 0.5 * (mid - delta)
    dv_den = b - c + lam1
    dv_den = jnp.where(jnp.abs(dv_den) < 1e-12, 1e-12, dv_den)
    dvy = (-a + b + lam1) / dv_den
    rinv = jax.lax.rsqrt(1.0 + dvy * dvy + 1e-24)
    dvx, dvy = rinv, dvy * rinv
    len1 = jnp.minimum(3.0 * jnp.sqrt(jnp.maximum(lam1, 0.0)), 1024.0)
    len2 = jnp.minimum(3.0 * jnp.sqrt(jnp.maximum(lam2, 0.0)), 1024.0)
    len1 = jnp.where(ok, len1, 0.0)
    len2 = jnp.where(ok, len2, 0.0)
    return len1 * dvx, len1 * dvy, len2 * dvy, -len2 * dvx


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

    # ---- all per-splat math in flat 1-D columns ---------------------------
    # (N,3,3) rotation/covariance intermediates tile to (8,128) lanes on TPU
    # (up to 42x padded traffic when materialized), so everything below is
    # explicit columnwise arithmetic.
    px, py, pz = splats.pos[:, 0], splats.pos[:, 1], splats.pos[:, 2]

    identity_model = model_to_world is None
    if identity_model:
        model_to_world = jnp.eye(4, dtype=jnp.float32)
        wsx, wsy, wsz = px, py, pz
    else:
        M = model_to_world
        wsx = M[0, 0] * px + M[0, 1] * py + M[0, 2] * pz + M[0, 3]
        wsy = M[1, 0] * px + M[1, 1] * py + M[1, 2] * pz + M[1, 3]
        wsz = M[2, 0] * px + M[2, 1] * py + M[2, 2] * pz + M[2, 3]

    V = Wv
    vsx = V[0, 0] * wsx + V[0, 1] * wsy + V[0, 2] * wsz + V[0, 3]
    vsy = V[1, 0] * wsx + V[1, 1] * wsy + V[1, 2] * wsz + V[1, 3]
    vsz = V[2, 0] * wsx + V[2, 1] * wsy + V[2, 2] * wsz + V[2, 3]

    cx = P[0, 0] * vsx + P[0, 1] * vsy + P[0, 2] * vsz + P[0, 3]
    cy = P[1, 0] * vsx + P[1, 1] * vsy + P[1, 2] * vsz + P[1, 3]
    cz = P[2, 0] * vsx + P[2, 1] * vsy + P[2, 2] * vsz + P[2, 3]
    cw = P[3, 0] * vsx + P[3, 1] * vsy + P[3, 2] * vsz + P[3, 3]

    # frustum cull at 1.05 * w (G4:72-76)
    margin = 1.05 * cw
    inside = (
        (cz >= -margin)
        & (cx >= -margin)
        & (cx <= margin)
        & (cy >= -margin)
        & (cy <= margin)
    )
    valid = jnp.logical_and(splats.valid, inside)

    # optional mesh-occlusion depth test (G4:79-91)
    if depth_map is not None and int(splat_format) == 0:
        cw_s = jnp.where(jnp.abs(cw) < 1e-12, 1e-12, cw)
        u_px = jnp.clip(
            ((cx / cw_s * 0.5 + 0.5) * width).astype(jnp.int32), 0, width - 1
        )
        v_px = jnp.clip(
            ((cy / cw_s * 0.5 + 0.5) * height).astype(jnp.int32), 0, height - 1
        )
        mesh_depth = depth_map[v_px, u_px]
        my_depth = (cz / cw_s) * 0.5 + 0.5
        occluded = jnp.logical_and(
            splats.color[:, 3] > 0.95, my_depth > mesh_depth + 2e-5
        )
        valid = jnp.logical_and(valid, ~occluded)

    # scale decode (G4:93-95). Deviation: the reference computes modelScale as
    # (|col0|, |col0|, |col1|) — a transcription slip; we use (|c0|,|c1|,|c2|).
    multiplier = std_dev if int(splat_format) in (0, 3) else 1.0
    model_scale = jnp.linalg.norm(model_to_world[:3, :3], axis=0)
    s0 = splats.scale[:, 0] * multiplier * (model_scale[0] * model_scale[0])
    s1 = splats.scale[:, 1] * multiplier * (model_scale[1] * model_scale[1])
    s2 = splats.scale[:, 2] * multiplier * (model_scale[2] * model_scale[2])

    # rotation columns from the (w,x,y,z) quaternion (common.glsl:22-47)
    qw, qx, qy, qz = (
        splats.quat[:, 0], splats.quat[:, 1], splats.quat[:, 2], splats.quat[:, 3]
    )
    r00 = 1.0 - 2.0 * (qy * qy + qz * qz)
    r01 = 2.0 * (qx * qy - qw * qz)
    r02 = 2.0 * (qx * qz + qw * qy)
    r10 = 2.0 * (qx * qy + qw * qz)
    r11 = 1.0 - 2.0 * (qx * qx + qz * qz)
    r12 = 2.0 * (qy * qz - qw * qx)
    r20 = 2.0 * (qx * qz - qw * qy)
    r21 = 2.0 * (qy * qz + qw * qx)
    r22 = 1.0 - 2.0 * (qy * qy + qx * qx)

    if not identity_model:
        # fold the model rotation in: R_world = model_rot @ R (G4:97-109)
        mr = model_to_world[:3, :3] / jnp.maximum(model_scale, 1e-12)
        r00, r10, r20 = (
            mr[0, 0] * r00 + mr[0, 1] * r10 + mr[0, 2] * r20,
            mr[1, 0] * r00 + mr[1, 1] * r10 + mr[1, 2] * r20,
            mr[2, 0] * r00 + mr[2, 1] * r10 + mr[2, 2] * r20,
        )
        r01, r11, r21 = (
            mr[0, 0] * r01 + mr[0, 1] * r11 + mr[0, 2] * r21,
            mr[1, 0] * r01 + mr[1, 1] * r11 + mr[1, 2] * r21,
            mr[2, 0] * r01 + mr[2, 1] * r11 + mr[2, 2] * r21,
        )
        r02, r12, r22 = (
            mr[0, 0] * r02 + mr[0, 1] * r12 + mr[0, 2] * r22,
            mr[1, 0] * r02 + mr[1, 1] * r12 + mr[1, 2] * r22,
            mr[2, 0] * r02 + mr[2, 1] * r12 + mr[2, 2] * r22,
        )

    # cov3d = R S^2 R^T (6 unique entries; common.glsl:49-60)
    q0, q1, q2 = s0 * s0, s1 * s1, s2 * s2
    c00 = r00 * r00 * q0 + r01 * r01 * q1 + r02 * r02 * q2
    c01 = r00 * r10 * q0 + r01 * r11 * q1 + r02 * r12 * q2
    c02 = r00 * r20 * q0 + r01 * r21 * q1 + r02 * r22 * q2
    c11 = r10 * r10 * q0 + r11 * r11 * q1 + r12 * r12 * q2
    c12 = r10 * r20 * q0 + r11 * r21 * q1 + r12 * r22 * q2
    c22 = r20 * r20 * q0 + r21 * r21 * q1 + r22 * r22 * q2

    # EWA Jacobian (G4:152-162); z_view is negative in front of the camera
    z_safe = jnp.where(jnp.abs(vsz) < 1e-8, -1e-8, vsz)
    p00 = P[0, 0]
    p11 = P[1, 1]
    jsx = -(p00 * width) / (2.0 * z_safe)
    jsy = -(p11 * height) / (2.0 * z_safe)
    jtx = (p00 * vsx * width) / (2.0 * z_safe * z_safe)
    jty = (p11 * vsy * height) / (2.0 * z_safe * z_safe)

    W3 = Wv[:3, :3]
    # JW rows: row0 = (jsx,0,jtx) @ W3 ; row1 = (0,jsy,jty) @ W3
    u0 = jsx * W3[0, 0] + jtx * W3[2, 0]
    u1 = jsx * W3[0, 1] + jtx * W3[2, 1]
    u2 = jsx * W3[0, 2] + jtx * W3[2, 2]
    v0 = jsy * W3[1, 0] + jty * W3[2, 0]
    v1 = jsy * W3[1, 1] + jty * W3[2, 1]
    v2 = jsy * W3[1, 2] + jty * W3[2, 2]

    # quadratic forms u^T C u, u^T C v, v^T C v with the symmetric cov3d
    cu0 = c00 * u0 + c01 * u1 + c02 * u2
    cu1 = c01 * u0 + c11 * u1 + c12 * u2
    cu2 = c02 * u0 + c12 * u1 + c22 * u2
    a = u0 * cu0 + u1 * cu1 + u2 * cu2 + 0.3
    b = v0 * cu0 + v1 * cu1 + v2 * cu2
    cv0 = c00 * v0 + c01 * v1 + c02 * v2
    cv1 = c01 * v0 + c11 * v1 + c12 * v2
    cv2 = c02 * v0 + c12 * v1 + c22 * v2
    c = v0 * cv0 + v1 * cv1 + v2 * cv2 + 0.3

    # eigenvalue positivity check (G4:175-189)
    mid = a + c
    delta = jnp.sqrt((a - c) ** 2 + (2.0 * b) ** 2)
    lam2 = 0.5 * (mid - delta)
    valid = jnp.logical_and(valid, lam2 >= 0.0)

    # conic = inverse(cov2d) (G4:197; common.glsl:62-78)
    det = a * c - b * b
    det_ok = jnp.abs(det) >= 1e-20
    det_safe = jnp.where(det_ok, det, 1.0)
    zero = jnp.zeros_like(det)
    conic = jnp.stack(
        [
            jnp.where(det_ok, c / det_safe, zero),
            jnp.where(det_ok, -b / det_safe, zero),
            jnp.where(det_ok, a / det_safe, zero),
        ],
        axis=-1,
    )

    # closed-form eigen axes, recomputed from the conic so every consumer
    # (dense rasterizer / binner / Pallas kernel) shares one formula.
    # Deviation from round 1: splats whose 2D covariance is numerically
    # singular (det_ok False) now get ZERO axes (invisible) instead of
    # unclamped garbage axes with a unit falloff.
    mjx, mjy, mnx, mny = axes_from_conic(
        conic[:, 0], conic[:, 1], conic[:, 2]
    )
    axes_px = jnp.stack([mjx, mjy, mnx, mny], axis=-1).reshape(-1, 2, 2)

    w_safe = jnp.where(jnp.abs(cw) < 1e-12, 1e-12, cw)
    mean_ndc = jnp.stack([cx / w_safe, cy / w_safe], axis=-1)
    depth = -vsz  # positive in front
    ws = jnp.stack([wsx, wsy, wsz], axis=-1)

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
        ax0 = jnp.stack([r00, r10, r20], axis=-1)
        ax1 = jnp.stack([r01, r11, r21], axis=-1)
        ax2 = jnp.stack([r02, r12, r22], axis=-1)
        axis = jnp.where(
            (min_idx == 0)[:, None],
            ax0,
            jnp.where((min_idx == 1)[:, None], ax1, ax2),
        )
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
        wspos=ws,
        pbr=splats.pbr,
        valid=valid,
    )
