"""Multi-chip framebuffer sharding over a jax.sharding.Mesh.

The reference is strictly single-GPU (SURVEY.md §2 parallelism audit: no
NCCL/MPI anywhere); its only parallelism is the per-pixel CUDA grid. The
TPU-native scale-out shards the framebuffer by row bands across an ICI mesh
with shard_map: the ~5 KB scene and the sky texture are replicated, each
device raytraces its band (ray generation is positioned by global row
offset, so shard output is bit-identical to the single-chip render), and the
FXAA stencil exchanges 1-row halos with neighbor devices via lax.ppermute —
the only collective in the frame, riding ICI.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from raytracing_cuda_tpu.core.types import Scene
from raytracing_cuda_tpu.render.fxaa import fxaa_ext
from raytracing_cuda_tpu.render.fast import render_base_image_fast
from raytracing_cuda_tpu.scene.textures import blend_sky
from raytracing_cuda_tpu.sim.state import FrameState, camera_rays, derive_frame

AXIS = "rows"


def make_mesh(n_devices: int | None = None) -> Mesh:
    """1-D device mesh over the framebuffer's row axis."""
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(devices, (AXIS,))


@functools.partial(
    jax.jit,
    static_argnames=("mesh", "height", "width", "chunk", "aspect",
                     "fxaa_static", "path", "tri_clusters"),
)
def render_frame_sharded(scene: Scene, state: FrameState, sky_texels, *,
                         mesh: Mesh, height: int, width: int,
                         chunk: int = 32768, aspect: float | None = None,
                         fxaa_static: bool | None = None,
                         path: str = "fast",
                         tri_clusters: tuple | None = None):
    """Row-sharded render of one frame → (height, width, 3) uint8.

    Output matches render_frame exactly: rays are generated from global row
    coordinates and FXAA sees true neighbor rows through an ICI halo
    exchange instead of band-local padding.
    """
    n = mesh.shape[AXIS]
    if height % n:
        raise ValueError(f"height {height} not divisible by mesh size {n}")
    band = height // n
    if aspect is None:
        aspect = width / height

    scene_f, lights, ambient = derive_frame(scene, state)
    rays = camera_rays(state.cam, aspect)
    blended = blend_sky(sky_texels, state.sky_vars)
    day_frac = state.day_time / 24.0
    aa = state.aa if fxaa_static is None else jnp.bool_(fxaa_static)

    sh, sw = sky_texels.shape[1], sky_texels.shape[2]
    if path in ("pallas", "pallas_interpret"):
        # pack once, replicated — the grouped resolve (one row gather per
        # 8-pixel group, see scene/textures.py) applies per band unchanged:
        # groups never cross shard boundaries (bands are whole rows)
        from raytracing_cuda_tpu.scene.textures import (grouped_sky_ok,
                                                        pack_sky,
                                                        pack_sky_phases)

        sky_grouped = grouped_sky_ok(sh, sw)
        packed = (pack_sky_phases if sky_grouped else pack_sky)(blended)
    else:
        sky_grouped = False
        packed = blended

    def shard_fn(scene_f, lights, ambient, packed, rays, day_frac, aa):
        idx = jax.lax.axis_index(AXIS)
        row0 = idx * band
        if path in ("pallas", "pallas_interpret"):
            # each shard runs the megakernel on its band; ray generation is
            # positioned by global row so output matches single-chip exactly.
            # NOTE: row0 must be static inside the kernel, so the band render
            # switches over the axis index (n is small).
            from raytracing_cuda_tpu.render.pallas_rt import (
                render_base_planes_pallas)
            from raytracing_cuda_tpu.render.reference import quantize
            from raytracing_cuda_tpu.scene.textures import (
                sample_sky_grouped, sample_sky_packed)

            def band_at(k):
                def fn(_):
                    return render_base_planes_pallas(
                        scene_f, lights, ambient, rays, band, width,
                        interpret=(path == "pallas_interpret"),
                        tri_clusters=tri_clusters,
                        row0=k * band, total_height=height)
                return fn

            planes = jax.lax.switch(idx, [band_at(k) for k in range(n)], None)
            r, g, b, mw, mdx, mdy, mdz = planes
            mdir = jnp.stack([mdx, mdy, mdz], axis=-1)
            if sky_grouped:
                sky = sample_sky_grouped(packed, sh, sw, mdir, day_frac,
                                         valid=mw > 0)
            else:
                sky = sample_sky_packed(packed, sh, sw, mdir, day_frac)
            base = quantize(jnp.stack([r, g, b], axis=-1) + mw[..., None] * sky)
        else:
            base = render_base_image_fast(scene_f, lights, ambient, packed,
                                          day_frac, rays, band, width,
                                          row0=row0,
                                          total_height=height, chunk=chunk)

        # 1-row halo exchange with ring neighbors (edge shards receive zeros;
        # those halo rows only influence global border rows, which pass
        # through FXAA untouched)
        down = [(i, i + 1) for i in range(n - 1)]   # my last row → lower neighbor's top halo
        up = [(i + 1, i) for i in range(n - 1)]     # my first row → upper neighbor's bottom halo
        halo_top = jax.lax.ppermute(base[-1:], AXIS, down)
        halo_bot = jax.lax.ppermute(base[:1], AXIS, up)
        ext = jnp.concatenate([halo_top, base, halo_bot], axis=0)

        out = jax.lax.cond(
            aa,
            lambda e: fxaa_ext(e, row0=row0, total_height=height),
            lambda e: e[1:-1],
            ext,
        )
        return out

    fn = jax.shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(P(), P(), P(), P(), P(), P(), P()),
        out_specs=P(AXIS),
        # scan carries inside the trace loop start replicated and become
        # device-varying; skip the varying-manual-axes check rather than
        # pcast every carry leaf
        check_vma=False,
    )
    return fn(scene_f, lights, ambient, packed, rays, day_frac, aa)
