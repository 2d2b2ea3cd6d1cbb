"""Frame pipeline: the TPU-native equivalent of the reference's renderer
core + pass scheduler (reference: src/renderer/renderer.cpp:145-176
``renderFrame`` running conversion -> depthPrepass -> meshRender ->
gaussianPrepass -> radixSort -> gaussianSplatting -> shadows -> relighting).

The mutable RenderContext god-struct (RenderContext.hpp:28-125) decomposes
into an immutable FrameConfig + pure functions; the per-frame pass-enable
flags become ordinary Python arguments. One ``render_frame`` call jits into a
handful of XLA programs (projection+binning+composite, shadows, resolve).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from ..types import Camera, Material, RenderMode, SplatFormat, Splats, TriangleMesh
from ..ops.projection import project_splats
from .lighting import PointLight, deferred_resolve
from .mesh_raster import rasterize_mesh
from .rasterize import rasterize_dense
from .shadows import pcf_shadow_factor, render_shadow_cubemap
from .tiled import rasterize_tiled


@dataclasses.dataclass(frozen=True)
class FrameConfig:
    """Static per-frame settings (the UI-controlled knobs of ImGuiUi)."""

    width: int = 1280
    height: int = 720
    render_mode: RenderMode = RenderMode.ALBEDO
    splat_format: SplatFormat = SplatFormat.MESH2SPLAT
    gaussian_std: float = 1.0          # sigma slider 0.1..2.0 (ImGuiUi.hpp:173)
    resolution_target: int = 256       # conversion res (for std_dev derivation)
    use_tiled: bool = True             # Pallas path vs dense reference path
    depth_test_mesh: bool = False      # mesh-occlusion culling (G4:79-91)
    shadows: bool = False
    shadow_size: int = 1024            # reference parity (GaussianShadowPass.cpp:14)
    has_pbr: bool = True
    pair_capacity: int = 0             # class-C overflow pair budget
                                       # (0 = 4N heuristic; see
                                       # render.binning.calibrate_overflow)

    @property
    def std_dev(self) -> float:
        """std_dev = gaussianStd / resolutionTarget (GaussiansPrepass.cpp:18)."""
        return self.gaussian_std / self.resolution_target


def render_gbuffer(
    splats: Splats,
    camera: Camera,
    config: FrameConfig,
    depth_map: jax.Array | None = None,
    model_to_world: jax.Array | None = None,
):
    """Prepass + sort/bin + composite -> splat G-buffer dict."""
    proj = project_splats(
        splats,
        camera,
        std_dev=config.std_dev,
        render_mode=config.render_mode,
        splat_format=config.splat_format,
        has_pbr=config.has_pbr,
        depth_map=depth_map,
        model_to_world=model_to_world,
    )
    if config.use_tiled:
        return rasterize_tiled(
            proj, config.width, config.height, render_mode=config.render_mode,
            pair_capacity=config.pair_capacity,
        )
    return rasterize_dense(
        proj, config.width, config.height, render_mode=config.render_mode
    )


import functools


@functools.partial(jax.jit, static_argnames=("config",))
def _frame_core(splats, camera, light, mesh, material, cubemap,
                config: FrameConfig, model_to_world=None):
    """Everything after shadow-map rendering, fused into ONE dispatch (eager
    op-by-op orchestration costs ~50ms/dispatch on a tunneled device)."""
    depth_map = None
    if mesh is not None and config.depth_test_mesh:
        if model_to_world is not None:
            # occlusion culling must test against the TRANSFORMED mesh
            # (renderer.cpp:178-206 applies the model matrix to both)
            M = model_to_world
            mesh = dataclasses.replace(
                mesh, tri_pos=mesh.tri_pos @ M[:3, :3].T + M[:3, 3]
            )
        _, depth_ndc = rasterize_mesh(
            mesh, material or Material.default(), camera,
            config.width, config.height, opaque_only=True,
        )
        # projection samples with v up from the bottom; our rows are
        # top-first, so flip
        depth_map = depth_ndc[::-1]

    gbuffer = render_gbuffer(splats, camera, config, depth_map=depth_map,
                             model_to_world=model_to_world)

    shadow = None
    if cubemap is not None:
        shadow = pcf_shadow_factor(cubemap, gbuffer["position"][..., :3])

    cam_pos = -(camera.world_to_view[:3, :3].T @ camera.world_to_view[:3, 3])
    return deferred_resolve(
        gbuffer, cam_pos, light,
        render_mode=config.render_mode, shadow_factor=shadow,
    )


def calibrate_frame(
    splats: Splats, camera: Camera, config: FrameConfig,
    model_to_world: jax.Array | None = None,
) -> FrameConfig:
    """Size the rasterizer's class-C overflow budget to this scene+view
    (pow2-rounded so similar frames share a compile). One host readback;
    identical image to any larger budget."""
    from .binning import required_overflow

    proj = project_splats(
        splats, camera, std_dev=config.std_dev,
        render_mode=config.render_mode, splat_format=config.splat_format,
        has_pbr=config.has_pbr, model_to_world=model_to_world,
    )
    p = int(required_overflow(proj, config.width, config.height))
    from .binning import round_pow2_budget

    return dataclasses.replace(config, pair_capacity=round_pow2_budget(p))


def render_frame(
    splats: Splats,
    camera: Camera,
    config: FrameConfig,
    light: PointLight | None = None,
    mesh: TriangleMesh | None = None,
    material: Material | None = None,
    model_to_world: jax.Array | None = None,
):
    """Full frame to a (H, W, 3) image. Optional mesh enables the depth
    prepass (occlusion culling) when config.depth_test_mesh is set.

    model_to_world: optional (4, 4) per-model transform applied to splat
    positions/rotations/scales at projection time (the reference's gizmo
    path: UpdateTransforms -> renderer.cpp:178-206; compose one with
    types.compose_trs)."""
    light = light or PointLight.default()

    # an unset class-C pair budget silently dropped wide-span pairs on
    # close-up scenes (round-2 weak #3): size it to the scene instead (one
    # host readback; pow2-rounded so similar frames share the compile)
    if config.use_tiled and config.pair_capacity == 0:
        config = calibrate_frame(splats, camera, config,
                                 model_to_world=model_to_world)

    cubemap = None
    if config.shadows and int(config.render_mode) == int(RenderMode.FINAL):
        cubemap = render_shadow_cubemap(
            splats, light.position, far=25.0, std_dev=config.std_dev,
            size=config.shadow_size, model_to_world=model_to_world,
            splat_format=config.splat_format,
        )

    return _frame_core(
        splats, camera, light,
        mesh if config.depth_test_mesh else None, material, cubemap, config,
        model_to_world=model_to_world,
    )


def render_split_screen(
    splats: Splats,
    mesh: TriangleMesh,
    material: Material,
    camera: Camera,
    config: FrameConfig,
    light: PointLight | None = None,
    split_x: float = 0.5,
):
    """Split-screen mesh-vs-splat comparison (the reference's stencil-based
    divider, GaussianRelightingPass.cpp:90-135): left = rasterized mesh
    G-buffer, right = splat G-buffer, resolved with the same lighting."""
    light = light or PointLight.default()
    cam_pos = -(camera.world_to_view[:3, :3].T @ camera.world_to_view[:3, 3])

    mesh_gbuf, _ = rasterize_mesh(
        mesh, material, camera, config.width, config.height,
        render_mode=config.render_mode,
    )
    splat_gbuf = render_gbuffer(splats, camera, config)

    img_mesh = deferred_resolve(mesh_gbuf, cam_pos, light, config.render_mode)
    img_splat = deferred_resolve(splat_gbuf, cam_pos, light, config.render_mode)

    xs = jnp.arange(config.width) / config.width
    left = (xs < split_x)[None, :, None]
    img = jnp.where(left, img_mesh, img_splat)
    # 2px divider line (GaussianRelightingPass.cpp:126-133 scissored line)
    divider = jnp.abs(xs - split_x) * config.width < 1.0
    return jnp.where(divider[None, :, None], jnp.asarray([1.0, 1.0, 1.0]), img)


def image_diff_metrics(img_a, img_b):
    """Mesh-vs-splat comparison metric (the split screen as a *number*):
    mean absolute error and PSNR over RGB."""
    diff = jnp.abs(img_a - img_b)
    mae = jnp.mean(diff)
    mse = jnp.mean(diff * diff)
    psnr = -10.0 * jnp.log10(jnp.maximum(mse, 1e-12))
    return {"mae": mae, "psnr": psnr}
