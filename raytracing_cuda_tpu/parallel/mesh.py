"""Multi-chip framebuffer sharding over a jax.sharding.Mesh.

The reference is strictly single-GPU (SURVEY.md §2 parallelism audit: no
NCCL/MPI anywhere); its only parallelism is the per-pixel CUDA grid. The
TPU-native scale-out shards the framebuffer by row bands across an ICI mesh
with shard_map: the ~5 KB scene and the sky texture are replicated, each
device raytraces its band (ray generation is positioned by a global row
offset carried in the megakernel's SMEM params vector, so every band runs
the SAME compiled kernel and shard output is bit-identical to the
single-chip render), and the FXAA stencil exchanges 1-row halos with
neighbor devices via lax.ppermute — the only collective in the frame,
riding ICI.

Like the single-chip engine, the sharded path reuses a cached pre-blended
sky across frames (the 4-panorama blend only reruns during the 2 h day/night
crossfades, scene.cpp:778-804) and supports the grouped sky resolve — pass
(cached_vars, cached_packed) from textures.sky_cache_init to enable.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from raytracing_cuda_tpu.core.types import Scene
from raytracing_cuda_tpu.render.fxaa import fxaa_ext, fxaa_ext_pallas
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


def _resolve_grouped(sky_mode: str, sh: int, sw: int, path: str,
                     band: int, width: int) -> bool:
    from raytracing_cuda_tpu.scene.textures import (grouped_sky_ok,
                                                    sky_group_for_width)

    if not path.startswith("pallas"):
        return False
    # sample_sky_grouped picks its group size from the row width; the
    # band-local flatten partitions into the same groups as the full-frame
    # flatten ONLY when each band's pixel count is group-aligned — required
    # for the sharded == single-chip bit-parity contract
    group = sky_group_for_width(width)
    aligned = (band * width) % group == 0
    if sky_mode == "grouped":
        if not aligned:
            raise ValueError(
                f"sky_mode='grouped' needs band*width ({band}x{width}) "
                f"divisible by the {group}-pixel sky group; use 'flat'")
        return True
    return sky_mode == "auto" and aligned and grouped_sky_ok(sh, sw)


@functools.partial(
    jax.jit,
    static_argnames=("mesh", "height", "width", "chunk", "aspect",
                     "fxaa_static", "path", "tri_clusters", "sph_clusters",
                     "sky_mode"),
)
def render_frame_sharded(scene: Scene, state: FrameState, sky_texels, *,
                         mesh: Mesh, height: int, width: int,
                         chunk: int = 32768, aspect: float | None = None,
                         fxaa_static: bool | None = None,
                         path: str = "fast",
                         tri_clusters: tuple | None = None,
                         sph_clusters: tuple | None = None,
                         sky_mode: str = "auto",
                         cached_vars=None, cached_packed=None):
    """Row-sharded render of one frame → (height, width, 3) uint8.

    Output matches render_frame exactly: rays are generated from global row
    coordinates and FXAA sees true neighbor rows through an ICI halo
    exchange instead of band-local padding.

    With (cached_vars, cached_packed) from textures.sky_cache_init the
    per-frame 4-panorama blend is skipped outside crossfades and the return
    value becomes (image, new_cached_vars, new_cached_packed).
    """
    n = mesh.shape[AXIS]
    if height % n:
        raise ValueError(f"height {height} not divisible by mesh size {n}")
    band = height // n
    if aspect is None:
        aspect = width / height

    scene_f, lights, ambient = derive_frame(scene, state)
    rays = camera_rays(state.cam, aspect)
    day_frac = state.day_time / 24.0
    aa = state.aa if fxaa_static is None else jnp.bool_(fxaa_static)

    sh, sw = sky_texels.shape[1], sky_texels.shape[2]
    sky_grouped = _resolve_grouped(sky_mode, sh, sw, path, band, width)
    caching = cached_vars is not None
    if path.startswith("pallas"):
        from raytracing_cuda_tpu.scene.textures import (pack_sky,
                                                        pack_sky_phases)

        # pack once, replicated — the grouped resolve (one row gather per
        # 8-pixel group, see scene/textures.py) applies per band unchanged:
        # groups never cross shard boundaries (bands are whole rows)
        pack = pack_sky_phases if sky_grouped else pack_sky
        if caching:
            changed = jnp.any(state.sky_vars != cached_vars)
            packed = jax.lax.cond(
                changed,
                lambda _: pack(blend_sky(sky_texels, state.sky_vars)),
                lambda _: cached_packed,
                None)
        else:
            packed = pack(blend_sky(sky_texels, state.sky_vars))
    else:
        packed = blend_sky(sky_texels, state.sky_vars)

    def shard_fn(scene_f, lights, ambient, packed, rays, day_frac, aa):
        idx = jax.lax.axis_index(AXIS)
        row0 = (idx * band).astype(jnp.float32)
        if path.startswith("pallas"):
            # each shard runs the ONE compiled megakernel on its band; the
            # global row offset rides the SMEM params vector, so rays match
            # the single-chip render exactly without per-band recompiles
            from raytracing_cuda_tpu.render.pallas_rt import (
                render_base_planes_pallas)
            from raytracing_cuda_tpu.render.reference import quantize
            from raytracing_cuda_tpu.scene.textures import (
                sample_sky_grouped, sample_sky_packed)

            planes = render_base_planes_pallas(
                scene_f, lights, ambient, rays, band, width,
                interpret=(path == "pallas_interpret"),
                tri_clusters=tri_clusters, sph_clusters=sph_clusters,
                row0=row0, total_height=height)
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
                                          row0=idx * band,
                                          total_height=height, chunk=chunk)

        # 1-row halo exchange with ring neighbors (edge shards receive zeros;
        # those halo rows only influence global border rows, which pass
        # through FXAA untouched)
        down = [(i, i + 1) for i in range(n - 1)]   # my last row → lower neighbor's top halo
        up = [(i + 1, i) for i in range(n - 1)]     # my first row → upper neighbor's bottom halo
        halo_top = jax.lax.ppermute(base[-1:], AXIS, down)
        halo_bot = jax.lax.ppermute(base[:1], AXIS, up)
        ext = jnp.concatenate([halo_top, base, halo_bot], axis=0)

        fxaa_band = (fxaa_ext_pallas if path == "pallas" else fxaa_ext)
        out = jax.lax.cond(
            aa,
            lambda e: fxaa_band(e, row0=idx * band, total_height=height),
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
    img = fn(scene_f, lights, ambient, packed, rays, day_frac, aa)
    if caching:
        return img, state.sky_vars, packed
    return img
