"""Production tile-binned rasterizer: projection -> sort-carry binning ->
Pallas compositing. Drop-in replacement for rasterize_dense (same G-buffer
dict), validated against it in tests.

The full path replaces the reference's prepass -> radix sort -> instanced
draw frame loop (SURVEY.md section 3.3) with three dense tensor stages that
jit into one XLA program.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..ops.projection import ProjectedSplats
from ..types import RenderMode
from . import binning as B
from . import composite as C


def _is_tpu() -> bool:
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:
        return False


@partial(
    jax.jit,
    static_argnames=(
        "width", "height", "pair_capacity", "interpret", "render_mode",
        "albedo_only",
    ),
)
def rasterize_tiled(
    proj: ProjectedSplats,
    width: int,
    height: int,
    pair_capacity: int = 0,
    render_mode: RenderMode = RenderMode.ALBEDO,
    interpret: bool | None = None,
    albedo_only: bool = False,
):
    """Returns the same dict as rasterize_dense: albedo/position/normal/
    depth/metal_rough (H, W, 4) + transmittance (H, W).

    pair_capacity: class-C (wide-span splat) pair budget — see
    binning.calibrate_overflow; 0 uses a generous heuristic."""
    if interpret is None:
        interpret = not _is_tpu()

    ty, tx = B.tiles_for(width, height)
    height_arr = jnp.asarray([height], jnp.int32)

    if int(render_mode) == int(RenderMode.OVERDRAW):
        # additive blend of the constant overdraw fragment — order
        # independent, so a dedicated count kernel (no sorted traversal)
        binned = B.bin_pairs(
            proj, width, height, pair_capacity, variant="overdraw",
            differentiable=False,
        )
        cnt = C.overdraw_tiles(binned, height_arr, ty, tx, interpret)[
            0, :height, :width
        ]
        albedo = cnt[..., None] * jnp.asarray(
            [0.01, 0.005, 0.0, 0.01], jnp.float32
        )
        zeros = jnp.zeros((height, width, 4), jnp.float32)
        return {
            "albedo": albedo,
            "position": zeros,
            "normal": zeros,
            "depth": zeros,
            "metal_rough": zeros,
            "transmittance": jnp.ones((height, width), jnp.float32),
            "dropped_pairs": binned.dropped_pairs,
        }

    binned = B.bin_pairs(
        proj, width, height, pair_capacity,
        variant="albedo" if albedo_only else "full",
    )
    out = C.composite_tiles(
        binned.fields,
        binned.tile_starts,
        height_arr,
        ty,
        tx,
        interpret,
        albedo_only,
    )
    out = out[:, :height, :width]

    def chans(*idx):
        return jnp.stack([out[i] for i in idx], axis=-1)

    return {
        "albedo": chans(0, 1, 2, 3),
        "position": chans(4, 5, 6, 7),
        "normal": jnp.stack(
            [out[8], out[9], out[10], out[3]], axis=-1
        ),
        "depth": jnp.stack([out[11], out[11], out[11], out[3]], axis=-1),
        "metal_rough": jnp.stack(
            [out[12], out[13], jnp.zeros_like(out[12]), out[7]], axis=-1
        ),
        "transmittance": 1.0 - out[3],
        "dropped_pairs": binned.dropped_pairs,
    }
