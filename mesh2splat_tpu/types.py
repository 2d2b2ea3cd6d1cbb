"""Core data types of the TPU-native mesh2splat framework.

The canonical splat model mirrors the reference's ``utils::GaussianDataSSBO``
wire format (reference: src/utils/utils.hpp:145-152, 6 x vec4 = 96 B), but as a
JAX pytree of SoA device arrays with an explicit validity mask instead of an
atomic-counter-compacted SSBO (reference: src/shaders/conversion/converterFS.glsl:46).

Scale/opacity conventions (reference: SURVEY.md section 2.3):
  * ``scale`` is the *raw* Jacobian column norm (|Ju|, |Jv|, 1e-7) -- sigma is
    multiplied in at render/export time (reference:
    src/renderer/renderPasses/GaussiansPrepass.cpp:18).
  * ``color[..., 3]`` is opacity in [0, 1]; PLY export applies inv-sigmoid and
    import applies sigmoid (reference: src/parsers/parsers.cpp:299,588).
  * ``quat`` is stored (w, x, y, z) (reference:
    src/shaders/conversion/converterGS.glsl:407).
"""

from __future__ import annotations

import dataclasses
import enum
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array

# SH DC coefficient (reference: src/utils/params.hpp:17).
SH_C0 = 0.28209479177387814

# Design capacity of the reference's sort/draw buffers (reference:
# src/renderer/renderPasses/RenderPass.hpp:9). We keep it as a default cap for
# conversion output capacity, not a hard architectural limit.
MAX_GAUSSIANS = 7_000_000


class SplatFormat(enum.IntEnum):
    """Reference ``format`` semantics (reference: src/renderer/renderPasses/RenderContext.hpp:65)."""

    MESH2SPLAT = 0      # freshly converted: raw scale, needs *sigma at use
    PLY_3DGS = 1        # imported classic 3DGS PLY: scale already in real units
    COMPRESSED_PBR = 2  # compressed PBR (export-only)
    MESH2SPLAT_ALT = 3  # treated like 0 in shaders


class RenderMode(enum.IntEnum):
    """Visualization modes (reference: src/imGuiUi/ImGuiUi.hpp:84-93)."""

    ALBEDO = 0
    DEPTH = 1
    NORMAL = 2
    GEOMETRY = 3
    OVERDRAW = 4
    PBR = 5
    FINAL = 6


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class Splats:
    """SoA 3D Gaussian splat model.

    All leaves share leading dim N (static capacity); ``valid`` masks live
    entries. This replaces the reference's atomic-counter + capacity-7M SSBO
    (reference: src/renderer/renderPasses/ConversionPass.cpp:20-24).
    """

    pos: Array      # (N, 3) float32 world-space mean
    color: Array    # (N, 4) float32 rgb + opacity
    scale: Array    # (N, 3) float32 raw scale (see module docstring)
    normal: Array   # (N, 3) float32 world-space normal (un-encoded)
    quat: Array     # (N, 4) float32 rotation (w, x, y, z)
    pbr: Array      # (N, 2) float32 (metallic, roughness)
    valid: Array    # (N,)  bool

    @property
    def capacity(self) -> int:
        return self.pos.shape[0]

    def count(self) -> Array:
        return jnp.sum(self.valid.astype(jnp.int32))

    @staticmethod
    def zeros(n: int, dtype=jnp.float32) -> "Splats":
        return Splats(
            pos=jnp.zeros((n, 3), dtype),
            color=jnp.zeros((n, 4), dtype),
            scale=jnp.zeros((n, 3), dtype),
            normal=jnp.zeros((n, 3), dtype),
            quat=jnp.concatenate(
                [jnp.ones((n, 1), dtype), jnp.zeros((n, 3), dtype)], axis=-1
            ),
            pbr=jnp.zeros((n, 2), dtype),
            valid=jnp.zeros((n,), jnp.bool_),
        )

    def compact(self) -> "Splats":
        """Stable-pack valid splats to the front (device-side, static shape).

        TPU-native replacement for atomic-append compaction: a stable argsort
        on the inverted validity mask.
        """
        order = jnp.argsort(~self.valid, stable=True)
        return jax.tree.map(lambda a: a[order], self)

    def take(self, n: int) -> "Splats":
        """Static prefix slice (host-side convenience)."""
        return jax.tree.map(lambda a: a[:n], self)

    def concat(self, other: "Splats") -> "Splats":
        return jax.tree.map(
            lambda a, b: jnp.concatenate([a, b], axis=0), self, other
        )


def concat_splats(parts: list) -> Splats:
    return jax.tree.map(lambda *xs: jnp.concatenate(xs, axis=0), *parts)


# ----------------------------------------------------------------------------
# Codecs: the exact numeric conventions of the reference, encoded once.
# ----------------------------------------------------------------------------

def sigmoid(x):
    """Opacity decode (reference: src/utils/utils.hpp:269)."""
    return 1.0 / (1.0 + jnp.exp(-x))


def inv_sigmoid(alpha):
    """Opacity encode, with the reference's clamp + eps
    (reference: src/utils/utils.hpp:270)."""
    alpha = jnp.clip(alpha, 0.0, 1.0)
    return -jnp.log(1.0 / (alpha + 1e-8) - 1.0)


def color_to_sh0(color):
    """(reference: src/utils/utils.cpp:45-49)"""
    return (color - 0.5) / SH_C0


def sh0_to_color(sh):
    """(reference: src/utils/utils.cpp:51-55)"""
    return sh * SH_C0 + 0.5


def encode_normal(n):
    """[-1,1] -> [0,1] (reference: src/shaders/rendering/common.glsl:86-88)."""
    return n * 0.5 + 0.5


def decode_normal(e):
    """(reference: src/shaders/rendering/common.glsl:90-92)"""
    return e * 2.0 - 1.0


def exponential_depth(view_depth, near, far):
    """(reference: src/shaders/rendering/common.glsl:80-84)"""
    t = jnp.clip((view_depth - near) / (far - near), 0.0, 1.0)
    return jnp.clip(jnp.exp(-20.0 * t), 0.0, 1.0)


def oct_encode(n):
    """Octahedral normal encode to [0,1]^2
    (reference: src/parsers/parsers.cpp:320-337).

    Deviation from the reference: its OctWrap applies a single *joint* sign
    ``(x>=0 && y>=0 ? 1 : -1)`` to both components (parsers.cpp:323), which is
    not invertible for mixed-sign lower-hemisphere normals (and the reference
    never decodes this format). We use the standard per-component sign so the
    codec round-trips; encodings agree wherever the reference's is invertible."""
    n = n / (jnp.abs(n[..., 0:1]) + jnp.abs(n[..., 1:2]) + jnp.abs(n[..., 2:3]) + 1e-8)
    xy = n[..., :2]
    sign = jnp.where(xy >= 0.0, 1.0, -1.0)
    wrapped = (1.0 - jnp.abs(xy[..., ::-1])) * sign
    res = jnp.where(n[..., 2:3] >= 0.0, xy, wrapped)
    return res * 0.5 + 0.5


def oct_decode(e):
    """Inverse of oct_encode (standard octahedral decode)."""
    f = e * 2.0 - 1.0
    n = jnp.stack(
        [f[..., 0], f[..., 1], 1.0 - jnp.abs(f[..., 0]) - jnp.abs(f[..., 1])],
        axis=-1,
    )
    t = jnp.clip(-n[..., 2:3], 0.0, 1.0)
    xy = n[..., :2] - jnp.where(n[..., :2] >= 0.0, t, -t)
    n = jnp.concatenate([xy, n[..., 2:3]], axis=-1)
    return n / (jnp.linalg.norm(n, axis=-1, keepdims=True) + 1e-12)


def srgb_to_linear(c):
    """(reference: src/utils/utils.cpp:117-132)"""
    return jnp.where(c <= 0.04045, c / 12.92, ((c + 0.055) / 1.055) ** 2.4)


def linear_to_srgb(c):
    """(reference: src/utils/utils.cpp:134-149)"""
    return jnp.where(c <= 0.0031308, c * 12.92, 1.055 * c ** (1.0 / 2.4) - 0.055)


# ----------------------------------------------------------------------------
# Camera
# ----------------------------------------------------------------------------

@jax.tree_util.register_dataclass
@dataclasses.dataclass
class Camera:
    """GL-convention camera: right-handed view space (camera looks down -Z),
    clip z in [-1, 1] (reference: src/utils/Camera.cpp + renderer.cpp:178-206)."""

    world_to_view: Array  # (4, 4)
    view_to_clip: Array   # (4, 4)
    near: Array           # scalar
    far: Array            # scalar
    width: int = dataclasses.field(metadata=dict(static=True), default=0)
    height: int = dataclasses.field(metadata=dict(static=True), default=0)

    @property
    def resolution(self):
        return (self.width, self.height)


def look_at(eye, center, up) -> np.ndarray:
    """glm::lookAt (right-handed)."""
    eye = np.asarray(eye, np.float32)
    center = np.asarray(center, np.float32)
    up = np.asarray(up, np.float32)
    f = center - eye
    f = f / np.linalg.norm(f)
    s = np.cross(f, up)
    s = s / np.linalg.norm(s)
    u = np.cross(s, f)
    m = np.eye(4, dtype=np.float32)
    m[0, :3] = s
    m[1, :3] = u
    m[2, :3] = -f
    m[0, 3] = -np.dot(s, eye)
    m[1, 3] = -np.dot(u, eye)
    m[2, 3] = np.dot(f, eye)
    return m


def perspective(fov_y_rad, aspect, near, far) -> np.ndarray:
    """glm::perspective (GL clip z in [-1, 1])."""
    t = 1.0 / np.tan(fov_y_rad / 2.0)
    m = np.zeros((4, 4), np.float32)
    m[0, 0] = t / aspect
    m[1, 1] = t
    m[2, 2] = -(far + near) / (far - near)
    m[2, 3] = -(2.0 * far * near) / (far - near)
    m[3, 2] = -1.0
    return m


def compose_trs(translation=(0, 0, 0), rotation_wxyz=(1, 0, 0, 0),
                scale=(1, 1, 1)):
    """Compose a 4x4 model-to-world matrix from translate/rotate/scale — the
    per-model gizmo transform of the reference (ImGuizmo panel ->
    UpdateTransforms -> renderer.cpp:178-206). Quaternion in the project's
    (w, x, y, z) convention (common.glsl:22-47). Traceable (jnp)."""
    t = jnp.asarray(translation, jnp.float32)
    s = jnp.asarray(scale, jnp.float32)
    q = jnp.asarray(rotation_wxyz, jnp.float32)
    q = q / jnp.maximum(jnp.linalg.norm(q), 1e-12)
    w, x, y, z = q[0], q[1], q[2], q[3]
    r = jnp.stack([
        jnp.stack([1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)]),
        jnp.stack([2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)]),
        jnp.stack([2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)]),
    ])
    m = jnp.eye(4, dtype=jnp.float32)
    m = m.at[:3, :3].set(r * s[None, :])
    m = m.at[:3, 3].set(t)
    return m


def make_camera(eye, center, up, fov_y_rad, width, height, near=0.1, far=100.0) -> Camera:
    return Camera(
        world_to_view=jnp.asarray(look_at(eye, center, up)),
        view_to_clip=jnp.asarray(perspective(fov_y_rad, width / height, near, far)),
        near=jnp.float32(near),
        far=jnp.float32(far),
        width=width,
        height=height,
    )


# ----------------------------------------------------------------------------
# Mesh: the host-side triangle-soup representation fed to conversion.
# Mirrors the semantic content of the reference's 17-float interleaved VBO
# (reference: src/utils/SceneManager.cpp:532-565) as SoA per-triangle arrays.
# ----------------------------------------------------------------------------

@jax.tree_util.register_dataclass
@dataclasses.dataclass
class TriangleMesh:
    """World-space triangle soup of one glTF primitive (one material)."""

    tri_pos: Array      # (T, 3, 3)
    tri_normal: Array   # (T, 3, 3) per-vertex shading normals
    tri_tangent: Array  # (T, 3, 4) xyz + handedness w
    tri_uv: Array       # (T, 3, 2) texture UVs (UV0)

    @property
    def num_triangles(self) -> int:
        return self.tri_pos.shape[0]

    def bbox(self):
        lo = jnp.min(self.tri_pos.reshape(-1, 3), axis=0)
        hi = jnp.max(self.tri_pos.reshape(-1, 3), axis=0)
        return lo, hi


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class Material:
    """Per-primitive material: factors + optional maps.

    Maps are always present as arrays (1x1 fallbacks when absent) so the
    conversion kernel stays static-shaped; ``has_*`` flags replicate the
    reference's uniform flags (reference: src/shaders/conversion/converterFS.glsl:15-17).
    """

    base_color_factor: Array        # (4,)
    metallic_factor: Array          # scalar
    roughness_factor: Array         # scalar
    base_color: Array               # (H, W, 4) in [0,1]
    normal: Array                   # (H, W, 3) in [0,1] tangent-space map
    metallic_roughness: Array       # (H, W, 3); .b = metallic, .g = roughness
    has_base_color: bool = dataclasses.field(metadata=dict(static=True), default=False)
    has_normal: bool = dataclasses.field(metadata=dict(static=True), default=False)
    has_metallic_roughness: bool = dataclasses.field(metadata=dict(static=True), default=False)

    @staticmethod
    def default() -> "Material":
        return Material(
            base_color_factor=jnp.ones((4,), jnp.float32),
            metallic_factor=jnp.float32(1.0),
            roughness_factor=jnp.float32(1.0),
            base_color=jnp.ones((1, 1, 4), jnp.float32),
            normal=jnp.full((1, 1, 3), 0.5, jnp.float32),
            metallic_roughness=jnp.zeros((1, 1, 3), jnp.float32),
        )
