"""mesh2splat_tpu: a TPU-native (JAX/XLA/Pallas) mesh -> 3D Gaussian Splatting
framework with the capabilities of electronicarts/mesh2splat, redesigned
TPU-first: gather-based conversion instead of rasterizer-interpolator tricks,
sort-based tile binning instead of atomic appends, a differentiable Pallas
tile rasterizer instead of forward-only GLSL splatting, and jax.sharding
multi-chip scaling instead of a single GL context.
"""

from .types import (
    Camera,
    Material,
    RenderMode,
    SplatFormat,
    Splats,
    TriangleMesh,
    make_camera,
)

__version__ = "0.1.0"

__all__ = [
    "Camera",
    "Material",
    "RenderMode",
    "SplatFormat",
    "Splats",
    "TriangleMesh",
    "make_camera",
]
