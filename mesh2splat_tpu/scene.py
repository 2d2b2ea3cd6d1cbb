"""Scene: the user-facing orchestration API.

Mirrors the reference's SceneManager + mediator roles (reference:
src/utils/SceneManager.{hpp,cpp}, guiRendererConcreteMediator.cpp) as a
functional façade: load a model or PLY, convert, render, export — without the
GL/ImGui machinery.

    scene = Scene.from_glb("helmet.glb")
    splats = scene.convert(resolution=512)
    img = scene.render(splats, eye=[0, 0, 3])
    scene.export_ply(splats, "helmet.ply", fmt=1)
"""

from __future__ import annotations

import dataclasses
import threading

import numpy as np

from .io import gltf, ply
from .ops.conversion import ConversionConfig, convert
from .types import (
    Material,
    RenderMode,
    SplatFormat,
    Splats,
    TriangleMesh,
    concat_splats,
    make_camera,
)


@dataclasses.dataclass
class Scene:
    """A loaded asset: list of primitives + bookkeeping."""

    primitives: list          # [(TriangleMesh, Material, GltfPrimitive)]
    splat_format: SplatFormat = SplatFormat.MESH2SPLAT
    has_pbr: bool = True
    last_config: ConversionConfig | None = None
    imported_splats: Splats | None = None

    # ------------------------------------------------------------------ load

    @staticmethod
    def from_glb(path) -> "Scene":
        prims = gltf.load_glb(path)
        if not prims:
            raise ValueError(f"no triangle primitives in {path}")
        loaded = []
        for pr in prims:
            mesh, mat = gltf.to_device(pr)
            loaded.append((mesh, mat, pr))
        return Scene(primitives=loaded)

    @staticmethod
    def from_ply(path) -> "Scene":
        """Import a splat PLY (reference: loadPly path, parsers.cpp:516-629).
        The ``has_pbr`` probe mirrors RenderContext.hpp:66."""
        arrs, has_pbr = ply.read_ply(path)
        sc = Scene(primitives=[], splat_format=SplatFormat.PLY_3DGS,
                   has_pbr=has_pbr)
        sc.imported_splats = ply.arrays_to_splats(arrs)
        return sc

    # --------------------------------------------------------------- convert

    def convert(self, resolution: int = 512, layers: int = 6,
                gaussian_std: float = 1.0, calibrated: bool = True,
                return_stats: bool = False) -> Splats:
        """Convert every primitive. ``calibrated`` sizes the slot budget to
        each mesh (identical splats, ~linear cost savings; set False to
        reuse one compiled kernel across same-shaped meshes).
        ``return_stats``: also return the budget-overflow counters
        (ops.conversion._overflow_stats) as a second value."""
        if not self.primitives:
            raise ValueError("Scene has no mesh primitives (PLY import?)")
        cfg = ConversionConfig(
            resolution=resolution, layers=layers, gaussian_std=gaussian_std
        )
        import jax.numpy as jnp

        from .ops.conversion import calibrate, convert_packed

        self.last_config = cfg
        if len(self.primitives) > 1:
            # one fused pass over the whole scene (per-triangle material id
            # + layered texture atlas), like the reference's single shared
            # gaussian SSBO (ConversionPass.cpp:50-52)
            return convert_packed(
                [(mesh, mat) for mesh, mat, _ in self.primitives], cfg,
                calibrate_budget=calibrated, return_stats=return_stats,
            )
        mesh, mat, pr = self.primitives[0]
        lo, hi = jnp.asarray(pr.bbox()[0]), jnp.asarray(pr.bbox()[1])
        pcfg = calibrate(mesh, lo, hi, cfg) if calibrated else cfg
        return convert(mesh, mat, lo, hi, pcfg, return_stats=return_stats)

    # ---------------------------------------------------------------- render

    def render(self, splats: Splats, eye, center=(0, 0, 0), up=(0, 1, 0),
               width=1280, height=720, fov_deg=60.0,
               mode: RenderMode = RenderMode.ALBEDO, shadows=False,
               light=None, model_transform=None, gaussian_std=None):
        """model_transform: optional per-model transform — a (4, 4) matrix,
        or a (translation, rotation_wxyz, scale) TRS tuple composed via
        types.compose_trs — the reference's gizmo path (ImGuizmo ->
        UpdateTransforms -> renderer.cpp:178-206).

        gaussian_std: optional sigma-slider override (0.1..2.0); defaults
        to the conversion's value. NOTE: like the reference, imported 3DGS
        PLYs (format 1) store real-unit scales, so sigma does not apply to
        them (G4:93-95)."""
        from .render.pipeline import FrameConfig, render_frame
        from .types import compose_trs

        if model_transform is not None and isinstance(model_transform, tuple):
            model_transform = compose_trs(*model_transform)

        cam = make_camera(eye=list(eye), center=list(center), up=list(up),
                          fov_y_rad=np.deg2rad(fov_deg),
                          width=width, height=height)
        res_target = self.last_config.resolution if self.last_config else 1
        std = gaussian_std if gaussian_std is not None else (
            self.last_config.gaussian_std if self.last_config else 1.0)
        fc = FrameConfig(
            width=width, height=height, render_mode=mode,
            splat_format=self.splat_format, gaussian_std=std,
            resolution_target=res_target, shadows=shadows,
            has_pbr=self.has_pbr,
        )
        from .render.pipeline import calibrate_frame

        fc = calibrate_frame(splats, cam, fc, model_to_world=model_transform)
        return render_frame(splats, cam, fc, light=light,
                            model_to_world=model_transform)

    def render_split(self, splats: Splats, eye, center=(0, 0, 0),
                     up=(0, 1, 0), width=1280, height=720, fov_deg=60.0,
                     mode: RenderMode = RenderMode.ALBEDO, light=None,
                     split_x: float = 0.5):
        """Split-screen mesh-vs-splat comparison (the reference's
        stencil-divided view, GaussianRelightingPass.cpp:90-135): left =
        rasterized source mesh, right = splats. Multi-primitive scenes are
        compared as one merged triangle soup with the first primitive's
        material."""
        if not self.primitives:
            raise ValueError("split-screen compare needs mesh primitives")
        import jax.numpy as jnp

        from .render.pipeline import (
            FrameConfig, calibrate_frame, render_split_screen,
        )

        mesh = TriangleMesh(
            tri_pos=jnp.concatenate([m.tri_pos for m, _, _ in self.primitives]),
            tri_normal=jnp.concatenate(
                [m.tri_normal for m, _, _ in self.primitives]),
            tri_tangent=jnp.concatenate(
                [m.tri_tangent for m, _, _ in self.primitives]),
            tri_uv=jnp.concatenate([m.tri_uv for m, _, _ in self.primitives]),
        )
        material = self.primitives[0][1]
        cam = make_camera(eye=list(eye), center=list(center), up=list(up),
                          fov_y_rad=np.deg2rad(fov_deg),
                          width=width, height=height)
        res_target = self.last_config.resolution if self.last_config else 1
        std = self.last_config.gaussian_std if self.last_config else 1.0
        fc = FrameConfig(
            width=width, height=height, render_mode=mode,
            splat_format=self.splat_format, gaussian_std=std,
            resolution_target=res_target, has_pbr=self.has_pbr,
        )
        fc = calibrate_frame(splats, cam, fc)
        return render_split_screen(splats, mesh, material, cam, fc,
                                   light=light, split_x=split_x)

    # ---------------------------------------------------------------- export

    def export_ply(self, splats: Splats, path, fmt: int = 0,
                   background: bool = False):
        """Export with the conversion-derived scale multiplier
        (SceneManager.cpp:668). ``background=True`` reproduces the
        reference's detached-thread async export (SceneManager.cpp:671-676)
        and returns the Thread."""
        mult = (
            self.last_config.scale_multiplier
            if self.last_config is not None else 1.0
        )
        arrs = ply.splats_to_arrays(splats)  # device->host happens here

        if background:
            t = threading.Thread(
                target=ply.write_ply, args=(path, arrs, fmt, mult), daemon=True
            )
            t.start()
            return t
        ply.write_ply(path, arrs, fmt=fmt, scale_multiplier=mult)
        return None
