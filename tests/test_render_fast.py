"""Fast path vs parity oracle: render.fast must reproduce render.reference.

The fast renderer restructures the math (linear-form intersections, deferred
sky gather, chunk early-exit) but computes the same function; frames must
agree except for borderline-epsilon pixels at geometric edges, where float
reassociation can flip a compare. We assert sub-quantum RMSE and a tiny
mismatched-pixel fraction across representative states.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from raytracing_cuda_tpu.render.pipeline import render_frame
from raytracing_cuda_tpu.scene.builders import build_scene
from raytracing_cuda_tpu.scene.textures import procedural_skies
from raytracing_cuda_tpu.sim import state as sim
from raytracing_cuda_tpu.sim.actions import Action

H, W = 96, 160


def _load_bench():
    """Load repo-root bench.py as a module (it is not in the package)."""
    import importlib.util
    import pathlib

    spec = importlib.util.spec_from_file_location(
        "bench", pathlib.Path(__file__).parent.parent / "bench.py")
    bench = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bench)
    return bench


@pytest.fixture(scope="module")
def scene():
    return build_scene()


@pytest.fixture(scope="module")
def sky():
    return jnp.asarray(procedural_skies(64, 128))


def _state(day=6.0, cam_preset=None, sea=None, aa=True):
    st = sim.init_state()._replace(day_time=jnp.float32(day))
    if sea is not None:
        st = st._replace(sea_y=jnp.float32(sea))
    if cam_preset is not None:
        st = sim.apply_controls(
            st, Action.idle()._replace(cam_preset=np.int32(cam_preset)), 0.0)
    return sim.settle(st._replace(aa=jnp.bool_(aa)))


CASES = [
    dict(day=6.0),                      # island, morning (init view)
    dict(day=14.0, cam_preset=1),       # mountains, day
    dict(day=1.0),                      # night: moon lit, sun under horizon
    dict(day=18.0, sea=2.0),            # evening, island submerged
    dict(day=9.0, aa=False),            # crossfade weights, FXAA off
]


@pytest.mark.parametrize("case", CASES)
def test_fast_matches_oracle(scene, sky, case):
    st = _state(**case)
    fast = np.asarray(
        render_frame(scene, st, sky, H, W, chunk=4096, path="fast"), np.float32)
    oracle = np.asarray(
        render_frame(scene, st, sky, H, W, chunk=4096, path="oracle"), np.float32)

    diff = np.abs(fast - oracle)
    rmse = np.sqrt(np.mean((diff / 255.0) ** 2))
    mismatched = np.mean(np.any(diff > 1.0, axis=-1))
    assert rmse < 2e-3, f"rmse {rmse}"
    assert mismatched < 0.003, f"{mismatched:.4%} pixels differ by >1 level"


def test_fast_chunk_invariance(scene, sky):
    """Chunk size (and thus early-exit grouping) must not change output."""
    st = _state(day=14.0)
    a = np.asarray(render_frame(scene, st, sky, H, W, chunk=1024, path="fast"))
    b = np.asarray(render_frame(scene, st, sky, H, W, chunk=H * W, path="fast"))
    assert np.array_equal(a, b)


@pytest.mark.parametrize("case", [CASES[0], CASES[1], CASES[3]])
def test_pallas_matches_oracle(scene, sky, case):
    """Pallas megakernel (interpret mode on CPU) vs the parity oracle."""
    st = _state(**case)
    pall = np.asarray(
        render_frame(scene, st, sky, H, W, path="pallas_interpret"), np.float32)
    oracle = np.asarray(
        render_frame(scene, st, sky, H, W, chunk=4096, path="oracle"), np.float32)
    diff = np.abs(pall - oracle)
    rmse = np.sqrt(np.mean((diff / 255.0) ** 2))
    mismatched = np.mean(np.any(diff > 1.0, axis=-1))
    assert rmse < 2e-3, f"rmse {rmse}"
    assert mismatched < 0.003, f"{mismatched:.4%} pixels differ by >1 level"


def test_classic_scene_paths_agree(sky):
    """The classic demo scene renders identically across all paths."""
    from raytracing_cuda_tpu.core.types import Camera
    from raytracing_cuda_tpu.scene.builders import CLASSIC_CAMERA, build_classic_scene

    scene = build_classic_scene()
    cc = CLASSIC_CAMERA
    st = sim.settle(sim.init_state()._replace(
        day_time=jnp.float32(14.0),
        cam=Camera(pos=jnp.asarray(cc["pos"], jnp.float32),
                   hor_angle=jnp.float32(cc["hor_angle"]),
                   ver_angle=jnp.float32(cc["ver_angle"]),
                   fov=jnp.float32(cc["fov"]))))
    ref = np.asarray(render_frame(scene, st, sky, H, W, chunk=4096,
                                  path="oracle"), np.float32)
    for path in ("fast", "pallas_interpret"):
        img = np.asarray(render_frame(scene, st, sky, H, W, chunk=4096,
                                      path=path), np.float32)
        diff = np.abs(img - ref)
        assert np.sqrt(np.mean((diff / 255.0) ** 2)) < 2e-3, path


def test_pallas_clustered_matches_oracle(scene, sky):
    """Cluster-culled kernel (island partition) must be output-identical:
    the per-tile bounding-sphere interval test is conservative, never
    changing which objects a ray can hit."""
    from raytracing_cuda_tpu.scene.builders import ISLAND_TRI_CLUSTERS

    for case in (CASES[0], CASES[1], CASES[3]):
        st = _state(**case)
        a = np.asarray(render_frame(scene, st, sky, H, W,
                                    path="pallas_interpret",
                                    tri_clusters=ISLAND_TRI_CLUSTERS), np.float32)
        b = np.asarray(render_frame(scene, st, sky, H, W, chunk=4096,
                                    path="oracle"), np.float32)
        diff = np.abs(a - b)
        assert np.sqrt(np.mean((diff / 255.0) ** 2)) < 2e-3


def test_pallas_random_states_match_oracle(scene, sky):
    """Seeded random camera poses / clock / sea levels: the megakernel
    (interpret mode, full cluster culling) must track the oracle everywhere
    in state space, not just at the curated CASES."""
    from raytracing_cuda_tpu.core.types import Camera
    from raytracing_cuda_tpu.scene.builders import (ISLAND_SPH_CLUSTERS,
                                                    ISLAND_TRI_CLUSTERS)

    rng = np.random.default_rng(20260817)
    for _ in range(4):
        st = sim.init_state()._replace(
            cam=Camera(
                pos=jnp.asarray(rng.uniform((-60, 4, -60), (60, 40, 60)),
                                jnp.float32),
                # angles are DEGREES (scene.cpp:14-20): full yaw circle,
                # pitch across the reference's +/-44 deg clamp range
                hor_angle=jnp.float32(rng.uniform(0.0, 360.0)),
                ver_angle=jnp.float32(rng.uniform(-44.0, 44.0)),
                fov=jnp.float32(40.0)),
            day_time=jnp.float32(rng.uniform(0, 24)),
            sea_y=jnp.float32(rng.uniform(-6, 3)))
        st = sim.settle(st)
        pall = np.asarray(render_frame(
            scene, st, sky, H, W, path="pallas_interpret",
            tri_clusters=ISLAND_TRI_CLUSTERS,
            sph_clusters=ISLAND_SPH_CLUSTERS), np.float32)
        oracle = np.asarray(render_frame(scene, st, sky, H, W, chunk=4096,
                                         path="oracle"), np.float32)
        diff = np.abs(pall - oracle)
        rmse = np.sqrt(np.mean((diff / 255.0) ** 2))
        s = (float(st.cam.pos[0]), float(st.cam.pos[1]), float(st.cam.pos[2]),
             float(st.day_time), float(st.sea_y))
        assert rmse < 2e-3, f"state {s}: rmse {rmse}"


def test_fractional_specular_exponent_parity(scene, sky):
    """Specular exponents below 1 exercise the kernel's power(0, e) edge:
    exp2(e·log2(max(s, 1e-30))) at s == 0 would yield 2^(−99.66·e) — a
    visible uniform glow for fractional e — where the oracle's
    jnp.power(0, e) gives 0. The kernel special-cases s == 0; pin it by
    rendering a scene with every specular exponent at 0.05 and shine at
    1.0 (the old formula's residual 2^(−99.66·0.05)·shine·angle glow is
    then ~8 levels — well above the gate; the island scene's own max
    shine of 0.05 would keep it sub-level)."""
    st = _state(day=14.0)
    frac = scene._replace(
        specular=jnp.full_like(scene.specular, 0.05),
        shine=jnp.full_like(scene.shine, 1.0))
    pall = np.asarray(render_frame(frac, st, sky, H, W,
                                   path="pallas_interpret"), np.float32)
    oracle = np.asarray(render_frame(frac, st, sky, H, W, chunk=4096,
                                     path="oracle"), np.float32)
    diff = np.abs(pall - oracle)
    rmse = np.sqrt(np.mean((diff / 255.0) ** 2))
    assert rmse < 2e-3, f"rmse {rmse}"


def test_sphere_padding_rows_unhittable(scene):
    """Sphere-cluster padding rows sit at the world origin; with r² = 0
    they phantom-hit rays grazing (0,0,0) — f32 rounding drives d² a hair
    negative, inside the reference's −0.01 quirk window (kernel.cu:58) —
    which would black out pixels wherever the origin is visible. r² = −1
    makes the accept test unsatisfiable: sweep a dense fan of near-origin
    rays through the packed emissive cluster (2 real + 6 pad rows) and
    require every pad row to miss."""
    from raytracing_cuda_tpu.render.pallas_rt import (BIG, C_GIDX, _sph_t,
                                                      pack_scene)
    from raytracing_cuda_tpu.scene.builders import (ISLAND_SPH_CLUSTERS,
                                                    ISLAND_TRI_CLUSTERS)

    st = sim.settle(sim.init_state())
    scene_f, _, _ = sim.derive_frame(scene, st)
    coef = pack_scene(scene_f, ISLAND_TRI_CLUSTERS, ISLAND_SPH_CLUSTERS)
    pad_rows = np.where(np.asarray(coef[:, 0, C_GIDX]) > 1e8)[0]
    assert len(pad_rows) >= 6            # (2, False) cluster pads 2 → 8
    Cs = coef[pad_rows]                  # (P, 1, C) padding rows only

    o = np.array([-56.0, 2.2, 72.0], np.float32)
    base = -o / np.linalg.norm(o)        # exactly toward the origin
    rng = np.random.default_rng(99)
    jit_dirs = base[None, :] + 5e-4 * rng.standard_normal((256, 3)).astype(
        np.float32)
    jit_dirs[0] = base
    jit_dirs /= np.linalg.norm(jit_dirs, axis=1, keepdims=True)

    N = jit_dirs.shape[0]
    ox, oy, oz = (jnp.full((1, N), v, jnp.float32) for v in o)
    dx = jnp.asarray(jit_dirs[:, 0])[None]
    dy = jnp.asarray(jit_dirs[:, 1])[None]
    dz = jnp.asarray(jit_dirs[:, 2])[None]
    t = np.asarray(_sph_t(Cs, ox[None], oy[None], oz[None],
                          dx[None], dy[None], dz[None]))
    assert np.all(t > BIG * 0.5), (
        f"{np.sum(t < BIG * 0.5)} phantom pad-row hits, min t {t.min()}")


def test_pallas_t_bound_identical(scene, sky):
    """The t-bound cluster cull (skip clusters wholly beyond the tile's
    worst-case needed t) is conservative, and the lane-split banding only
    re-partitions lanewise math: outputs must be bit-identical with the
    bound on/off and with lane_split=2, across hit-heavy and night states."""
    from raytracing_cuda_tpu.render.pallas_rt import render_base_planes_pallas
    from raytracing_cuda_tpu.scene.builders import (ISLAND_SPH_CLUSTERS,
                                                    ISLAND_TRI_CLUSTERS)

    for case in (CASES[0], CASES[2]):
        st = _state(**case)
        scene_f, lights, ambient = sim.derive_frame(scene, st)
        rays = sim.camera_rays(st.cam, W / H)
        kw = dict(tri_clusters=ISLAND_TRI_CLUSTERS,
                  sph_clusters=ISLAND_SPH_CLUSTERS, interpret=True)
        a = render_base_planes_pallas(scene_f, lights, ambient, rays, H, W,
                                      t_bound=True, **kw)
        b = render_base_planes_pallas(scene_f, lights, ambient, rays, H, W,
                                      t_bound=False, **kw)
        # lane_split needs 128-lane-aligned bands — run it on a 256-lane
        # tile (the default tile is (48, 128) since the round-3 autotune)
        c = render_base_planes_pallas(scene_f, lights, ambient, rays, H, W,
                                      t_bound=True, lane_split=2,
                                      tile_w=256, **kw)
        # refined cull bounds (mountain pairs → per-mountain sub-bounds,
        # OR-ed in the cull) are a pure skip optimization too
        d = render_base_planes_pallas(
            scene_f, lights, ambient, rays, H, W, t_bound=True,
            t_subs=(1, 1, 1, 1, 1, 1, 1, 2, 2, 2, 2, 2, 2), **kw)
        for pa, pb, pc, pd in zip(a, b, c, d):
            assert np.array_equal(np.asarray(pa), np.asarray(pb))
            assert np.array_equal(np.asarray(pa), np.asarray(pc))
            assert np.array_equal(np.asarray(pa), np.asarray(pd))


def test_ablation_arms_semantics(scene, sky):
    """The diagnostic ablate arms (experiments/megakernel_ablation.py) keep
    their meaning: nocull is BIT-IDENTICAL to the shipped kernel (interval
    culls are conservative skips — this gates every cull at once), noshadow
    only brightens hit-path radiance (occlusion can only remove diffuse/
    specular terms) while leaving the miss planes untouched, and noshade
    accumulates nothing (its hit-path planes are exactly zero)."""
    from raytracing_cuda_tpu.render.pallas_rt import render_base_planes_pallas
    from raytracing_cuda_tpu.scene.builders import (ISLAND_SPH_CLUSTERS,
                                                    ISLAND_TRI_CLUSTERS)

    st = _state(**CASES[0])
    scene_f, lights, ambient = sim.derive_frame(scene, st)
    rays = sim.camera_rays(st.cam, W / H)
    kw = dict(tri_clusters=ISLAND_TRI_CLUSTERS,
              sph_clusters=ISLAND_SPH_CLUSTERS, interpret=True)
    full = render_base_planes_pallas(scene_f, lights, ambient, rays, H, W,
                                     **kw)
    nocull = render_base_planes_pallas(scene_f, lights, ambient, rays, H, W,
                                       ablate=("nocull",), **kw)
    for pa, pb in zip(full, nocull):
        assert np.array_equal(np.asarray(pa), np.asarray(pb))
    nosh = render_base_planes_pallas(scene_f, lights, ambient, rays, H, W,
                                     ablate=("noshadow",), **kw)
    for c in range(3):                       # hit-path rgb only gains
        assert (np.asarray(nosh[c]) >= np.asarray(full[c]) - 1e-6).all()
    assert np.asarray(nosh[0]).max() > np.asarray(full[0]).max() - 1e-6
    for c in range(3, 7):                    # miss planes identical
        assert np.array_equal(np.asarray(nosh[c]), np.asarray(full[c]))
    dark = render_base_planes_pallas(scene_f, lights, ambient, rays, H, W,
                                     ablate=("noshade",), **kw)
    for c in range(3):
        assert not np.asarray(dark[c]).any()


def test_hcull_bit_identical(scene, sky):
    """The below-horizon light cull (pallas_rt.py, HCULL_DEFAULT) is a pure
    skip: bit-identical to the cull-free kernel wherever it engages or
    vetoes. Compares the explicit arms ("nohcull" vs "hcull") so the pin
    holds regardless of which one HCULL_DEFAULT ships.

    Poses cover: sun below the horizon (day 6 morning — sunrise is day 8,
    state.py orbit), moon below (day 14), deep night, a raised sea with the
    island submerged (needed lanes AT the waterline must veto the cull via
    the min-hy guard, not corrupt occlusion), and a grazing light barely
    below the horizon (lanes whose −sdy falls under _plane_t's √1e-5 accept
    epsilon must veto via the steepness guard). Also re-checked under
    lane_split=2 (the cull's reduces are band-scoped)."""
    from raytracing_cuda_tpu.render.pallas_rt import render_base_planes_pallas
    from raytracing_cuda_tpu.scene.builders import (ISLAND_SPH_CLUSTERS,
                                                    ISLAND_TRI_CLUSTERS)

    kw = dict(tri_clusters=ISLAND_TRI_CLUSTERS,
              sph_clusters=ISLAND_SPH_CLUSTERS, interpret=True)
    poses = [CASES[0], CASES[1], CASES[2], CASES[3],
             dict(day=20.0115)]          # sun_y ≈ −1.5: grazing shadow rays
    for case in poses:
        st = _state(**case)
        scene_f, lights, ambient = sim.derive_frame(scene, st)
        rays = sim.camera_rays(st.cam, W / H)
        full = render_base_planes_pallas(scene_f, lights, ambient, rays,
                                         H, W, ablate=("nohcull",), **kw)
        hc = render_base_planes_pallas(scene_f, lights, ambient, rays,
                                       H, W, ablate=("hcull",), **kw)
        for pa, pb in zip(full, hc):
            assert np.array_equal(np.asarray(pa), np.asarray(pb)), case
    st = _state(**CASES[0])
    scene_f, lights, ambient = sim.derive_frame(scene, st)
    rays = sim.camera_rays(st.cam, W / H)
    a = render_base_planes_pallas(scene_f, lights, ambient, rays, H, W,
                                  lane_split=2, tile_w=256,
                                  ablate=("nohcull",), **kw)
    b = render_base_planes_pallas(scene_f, lights, ambient, rays, H, W,
                                  lane_split=2, tile_w=256,
                                  ablate=("hcull",), **kw)
    for pa, pb in zip(a, b):
        assert np.array_equal(np.asarray(pa), np.asarray(pb))


def test_specgate_bit_identical(scene, sky):
    """The per-light specular gate (pallas_rt.py, SPECGATE_DEFAULT) hoists
    the Phong-specular chain into sibling conds skipped on no-shine tiles
    and on tile-wide plane-killed lights: bit-identical to the inline
    kernel wherever it engages or vetoes. Compares the explicit arms
    ("nospecgate" vs "specgate") so the pin holds regardless of which one
    SPECGATE_DEFAULT ships. Poses mirror the hcull pin (sun below, moon
    below, deep night, raised sea at the waterline, grazing light under
    the steepness veto); also cross-checked against hcull OFF (the gate's
    occ_pl proof must hold without hcull's occ := needs shortcut) and
    under lane_split=2 (spec_kill is tile-wide, bands must agree)."""
    from raytracing_cuda_tpu.render.pallas_rt import render_base_planes_pallas
    from raytracing_cuda_tpu.scene.builders import (ISLAND_SPH_CLUSTERS,
                                                    ISLAND_TRI_CLUSTERS)

    kw = dict(tri_clusters=ISLAND_TRI_CLUSTERS,
              sph_clusters=ISLAND_SPH_CLUSTERS, interpret=True)
    poses = [CASES[0], CASES[1], CASES[2], CASES[3],
             dict(day=20.0115)]          # sun_y ≈ −1.5: grazing shadow rays
    for case in poses:
        st = _state(**case)
        scene_f, lights, ambient = sim.derive_frame(scene, st)
        rays = sim.camera_rays(st.cam, W / H)
        full = render_base_planes_pallas(scene_f, lights, ambient, rays,
                                         H, W, ablate=("nospecgate",), **kw)
        sg = render_base_planes_pallas(scene_f, lights, ambient, rays,
                                       H, W, ablate=("specgate",), **kw)
        for pa, pb in zip(full, sg):
            assert np.array_equal(np.asarray(pa), np.asarray(pb)), case
        nh = render_base_planes_pallas(
            scene_f, lights, ambient, rays, H, W,
            ablate=("specgate", "nohcull"), **kw)
        base_nh = render_base_planes_pallas(
            scene_f, lights, ambient, rays, H, W, ablate=("nohcull",), **kw)
        for pa, pb in zip(base_nh, nh):
            assert np.array_equal(np.asarray(pa), np.asarray(pb)), case
    st = _state(**CASES[0])
    scene_f, lights, ambient = sim.derive_frame(scene, st)
    rays = sim.camera_rays(st.cam, W / H)
    a = render_base_planes_pallas(scene_f, lights, ambient, rays, H, W,
                                  lane_split=2, tile_w=256,
                                  ablate=("nospecgate",), **kw)
    b = render_base_planes_pallas(scene_f, lights, ambient, rays, H, W,
                                  lane_split=2, tile_w=256,
                                  ablate=("specgate",), **kw)
    for pa, pb in zip(a, b):
        assert np.array_equal(np.asarray(pa), np.asarray(pb))


def test_t_subs_requires_tri_clusters(scene):
    """t_subs without tri_clusters (or with the wrong arity) would misalign
    the sphere-cluster bound slots in the params vector — must raise, not
    silently unsound-cull."""
    from raytracing_cuda_tpu.render.pallas_rt import render_base_planes_pallas
    from raytracing_cuda_tpu.scene.builders import ISLAND_TRI_CLUSTERS

    st = sim.settle(sim.init_state())
    scene_f, lights, ambient = sim.derive_frame(scene, st)
    rays = sim.camera_rays(st.cam, W / H)
    with pytest.raises(ValueError, match="t_subs"):
        render_base_planes_pallas(scene_f, lights, ambient, rays, H, W,
                                  interpret=True, t_subs=(2,))
    with pytest.raises(ValueError, match="t_subs"):
        render_base_planes_pallas(scene_f, lights, ambient, rays, H, W,
                                  interpret=True,
                                  tri_clusters=ISLAND_TRI_CLUSTERS,
                                  t_subs=(2, 2))


def test_batch_render_matches_sequential(scene, sky):
    """render_frames_batch (one kernel launch for K frames) must match the
    sequential per-frame renders."""
    from raytracing_cuda_tpu.render.pipeline import render_frames_batch
    from raytracing_cuda_tpu.scene.builders import ISLAND_TRI_CLUSTERS
    from raytracing_cuda_tpu.sim.actions import Action

    st0 = sim.settle(sim.init_state())
    K = 3
    vecs = jnp.asarray(np.stack([
        Action.idle()._replace(mouse_dx=np.float32(2.0 * i)).pack(1 / 60)
        for i in range(K)]))
    from raytracing_cuda_tpu.scene.textures import sky_static_init

    sp = sky_static_init(sky)
    imgs, _ = render_frames_batch(
        scene, st0, sp, sky.shape[1], sky.shape[2], vecs, H, W,
        tri_clusters=ISLAND_TRI_CLUSTERS, interpret=True)
    imgs = np.asarray(imgs, np.float32)

    st = st0
    for i in range(K):
        st = sim.animate(st, Action.unpack(vecs[i]),
                         Action.unpack_dt(vecs[i]))
        ref = np.asarray(render_frame(scene, st, sky, H, W, chunk=4096,
                                      path="oracle"), np.float32)
        diff = np.abs(imgs[i] - ref)
        assert np.sqrt(np.mean((diff / 255.0) ** 2)) < 2e-3, f"frame {i}"


def test_static_sky_grouped_matches_oracle(scene, sky):
    """The Engine's hot path (render_frame_static_sky with the grouped pair
    resolve) must match the oracle frame-for-frame, including across a sky
    crossfade (the two-gather blend branch) and camera motion."""
    from raytracing_cuda_tpu.render.pipeline import render_frame_static_sky
    from raytracing_cuda_tpu.scene.builders import ISLAND_TRI_CLUSTERS
    from raytracing_cuda_tpu.scene.textures import sky_static_init

    sp = sky_static_init(sky)
    assert sp.ndim == 3   # grouped mode selected for this sky shape
    st = sim.settle(sim.init_state()._replace(day_time=jnp.float32(8.9)))
    for i in range(3):
        st = sim.animate(
            st, Action.idle()._replace(mouse_dx=np.float32(4.0 * i)),
            jnp.float32(0.25))  # big dt: crosses the 9-10h crossfade
        img = render_frame_static_sky(
            scene, st, sp, sky.shape[1], sky.shape[2], H, W,
            tri_clusters=ISLAND_TRI_CLUSTERS, interpret=True)
        ref = np.asarray(render_frame(scene, st, sky, H, W, chunk=4096,
                                      path="oracle"), np.float32)
        diff = np.abs(np.asarray(img, np.float32) - ref)
        rmse = np.sqrt(np.mean((diff / 255.0) ** 2))
        assert rmse < 2e-3, f"frame {i}: rmse {rmse}"


def test_engine_static_frame_wiring(scene, sky):
    """Engine.frame()/step_and_frame() on the static-sky pallas path
    (interpret mode on CPU): the render-only and fused-step entries must use
    the startup-packed sky stack and agree with the oracle."""
    from raytracing_cuda_tpu.app.loop import Engine
    from raytracing_cuda_tpu.utils.config import RenderConfig

    eng = Engine(RenderConfig(width=W, height=H, path="pallas_interpret",
                              sky_source="procedural",
                              procedural_sky_shape=(64, 128), chunk=4096))
    assert eng._sky_pack.ndim == 3    # grouped pair resolve selected

    img1 = np.asarray(eng.frame(), np.float32)       # render-only entry
    img2 = np.asarray(eng.frame(), np.float32)       # cache now warm
    assert np.array_equal(img1, img2)
    ref = np.asarray(render_frame(eng.scene, eng.state, eng.sky_texels,
                                  H, W, chunk=4096, path="oracle"), np.float32)
    diff = np.abs(img1 - ref)
    assert np.sqrt(np.mean((diff / 255.0) ** 2)) < 2e-3

    img3 = np.asarray(eng.step_and_frame(None, 1 / 60), np.float32)  # fused
    ref3 = np.asarray(render_frame(eng.scene, eng.state, eng.sky_texels,
                                   H, W, chunk=4096, path="oracle"), np.float32)
    diff = np.abs(img3 - ref3)
    assert np.sqrt(np.mean((diff / 255.0) ** 2)) < 2e-3


def test_kernel_defaults_match_autotune():
    """The shipped kernel launch defaults must track autotune.json (the
    committed `bench.py --tune` winner) — the two drifting apart means a
    retune happened without flipping the defaults, or vice versa."""
    import inspect
    import json
    import pathlib

    from raytracing_cuda_tpu.render.pallas_rt import (
        raytrace_planes, raytrace_planes_batch, render_base_planes_pallas)

    tuned = json.loads((pathlib.Path(__file__).parent.parent
                        / "autotune.json").read_text())
    for fn in (raytrace_planes, raytrace_planes_batch):
        p = inspect.signature(fn).parameters
        assert p["TH"].default == tuned["tile_h"], fn.__name__
        assert p["TW"].default == tuned["tile_w"], fn.__name__
        assert p["t_bound"].default == tuned["t_bound"], fn.__name__
        assert p["lane_split"].default == tuned["lane_split"], fn.__name__
    # render_base_planes_pallas defaults to None = launch_knobs resolution
    p = inspect.signature(render_base_planes_pallas).parameters
    for name in ("tile_h", "tile_w", "t_bound", "lane_split"):
        assert p[name].default is None, name


def test_merge_autotune_preserves_sibling_sections():
    """tune() must not clobber the 'sky' section or other sizes' winners
    (an earlier write path did — it rewrote the whole file)."""
    bench = _load_bench()

    existing = {"winner": "tile48x128", "tile_h": 48, "tile_w": 128,
                "t_bound": True, "lane_split": 1, "size": "1280x720",
                "sky": {"winner": "shipped"},
                "sizes": {"1280x720": {"tile_h": 48}}}
    out1080 = {"winner": "tile16x256", "tile_h": 16, "tile_w": 256,
               "t_bound": True, "lane_split": 1, "size": "1920x1080"}
    merged = bench.merge_autotune(existing, out1080)
    # non-flagship size: top level untouched, sizes gains the entry
    assert merged["tile_h"] == 48 and merged["sky"] == {"winner": "shipped"}
    assert merged["sizes"]["1920x1080"]["tile_h"] == 16
    assert merged["sizes"]["1280x720"] == {"tile_h": 48}
    # flagship size: top level updates too, sky still preserved
    out720 = dict(out1080, size="1280x720")
    merged2 = bench.merge_autotune(merged, out720)
    assert merged2["tile_h"] == 16 and "sky" in merged2
    assert merged2["sizes"]["1920x1080"]["tile_h"] == 16
    # fresh file: a non-flagship first tune must NOT become the top level
    # (else every untuned size falls back to it and the defaults pin breaks)
    fresh = bench.merge_autotune({}, out1080)
    assert "tile_h" not in fresh or fresh.get("size") != "1920x1080"
    assert fresh["sizes"]["1920x1080"]["tile_h"] == 16
    fresh2 = bench.merge_autotune(fresh, out720)
    assert fresh2["tile_h"] == 16 and fresh2["size"] == "1280x720"


def test_sky_defaults_match_autotune():
    """Once `bench.py --tune-sky` has committed a 'sky' section, textures'
    module knobs must track its resolved winner (the
    test_kernel_defaults_match_autotune pattern). Skips until then."""
    import json
    import pathlib

    import pytest

    import raytracing_cuda_tpu.scene.textures as tex

    tuned = json.loads((pathlib.Path(__file__).parent.parent
                        / "autotune.json").read_text())
    if "sky" not in tuned or "resolved" not in tuned.get("sky", {}):
        pytest.skip("no tuned sky section yet (bench.py --tune-sky "
                    "has not run on the TPU)")
    for k, v in tuned["sky"]["resolved"].items():
        assert getattr(tex, k) == v, k


def test_launch_knobs_resolution_order():
    """launch_knobs: per-size entry → top-level winner → constants
    (VERDICT r3 #4 — per-size autotune plumbing)."""
    import json
    import pathlib

    from raytracing_cuda_tpu.render import pallas_rt
    from raytracing_cuda_tpu.render.pallas_rt import launch_knobs

    tuned = json.loads((pathlib.Path(__file__).parent.parent
                        / "autotune.json").read_text())
    w, h = (int(v) for v in tuned["size"].split("x"))
    k = launch_knobs(h, w)
    assert k["tile_h"] == tuned["tile_h"] and k["tile_w"] == tuned["tile_w"]
    # an untuned size falls back to the top-level winner
    k2 = launch_knobs(h + 8, w + 128)
    assert k2 == {"tile_h": tuned["tile_h"], "tile_w": tuned["tile_w"],
                  "t_bound": tuned["t_bound"],
                  "lane_split": tuned["lane_split"]}
    # a per-size entry overrides the top level (patch the cache, restore);
    # keys MISSING from the entry fall through to the top level, not to
    # the compiled-in constants
    old = pallas_rt._AUTOTUNE
    try:
        pallas_rt._AUTOTUNE = dict(tuned, t_bound=False)
        pallas_rt._AUTOTUNE["sizes"] = {"1920x1080": {"tile_h": 16,
                                                      "tile_w": 256}}
        k3 = launch_knobs(1080, 1920)
        assert (k3["tile_h"], k3["tile_w"]) == (16, 256)
        assert k3["t_bound"] is False          # top-level, not the constant
        assert k3["lane_split"] == 1
    finally:
        pallas_rt._AUTOTUNE = old


def test_merge_autotune_migrates_legacy_top_level():
    """A legacy autotune.json whose top level is a non-flagship size (old
    clobbering write path, e.g. a --quick tune) must not stay the de-facto
    flagship: merge parks it under 'sizes', and a later flagship tune
    reclaims the top level (advisor r4)."""
    bench = _load_bench()

    legacy = {"winner": "tile8x128", "tile_h": 8, "tile_w": 128,
              "size": "480x272", "sky": {"winner": "shipped"}}
    out1080 = {"winner": "tile16x256", "tile_h": 16, "tile_w": 256,
               "size": "1920x1080"}
    merged = bench.merge_autotune(legacy, out1080)
    # the quick-tune knobs MOVED under sizes — copied down AND stripped
    # from the top level (launch_knobs falls back per key to the top
    # level, so knobs left there would stay the de-facto flagship)
    assert merged["sizes"]["480x272"]["tile_h"] == 8
    assert "tile_h" not in merged and "size" not in merged
    assert merged["sky"] == {"winner": "shipped"}
    # a flagship tune then owns the top level (old code compared against
    # the legacy top-level size, so 720p could never win it back)
    out720 = dict(out1080, size="1280x720", tile_h=48)
    merged2 = bench.merge_autotune(merged, out720)
    assert merged2["size"] == "1280x720" and merged2["tile_h"] == 48
    assert merged2["sky"] == {"winner": "shipped"}
    assert merged2["sizes"]["480x272"]["tile_h"] == 8


def test_wait_for_session_lock(tmp_path):
    """bench must wait while a live session holds the lock, proceed when it
    is released or stale, and give up at the wait bound (fake clock — no
    real sleeping)."""
    import os

    bench = _load_bench()

    lock = tmp_path / "tpu_session.lock"

    class Clock:
        t = 1000.0

        def __call__(self):
            return self.t

    clock = Clock()
    slept = []

    def sleep(s):
        slept.append(s)
        clock.t += s

    # no lock: returns immediately, no sleeping
    assert bench.wait_for_session_lock(str(lock), wait_s=100, stale_s=50,
                                       sleep=sleep, clock=clock) is True
    assert not slept

    # fresh lock released mid-wait: waits, then proceeds True
    lock.write_text("")
    os.utime(lock, (clock.t, clock.t))

    def sleep_release(s):
        slept.append(s)
        clock.t += s
        if len(slept) >= 3:
            lock.unlink(missing_ok=True)

    assert bench.wait_for_session_lock(str(lock), wait_s=1000, stale_s=500,
                                       poll_s=10, sleep=sleep_release,
                                       clock=clock) is True
    assert len(slept) >= 3

    # stale lock (dead session): proceeds True without waiting it out
    lock.write_text("")
    os.utime(lock, (clock.t - 600, clock.t - 600))
    n0 = len(slept)
    assert bench.wait_for_session_lock(str(lock), wait_s=1000, stale_s=500,
                                       sleep=sleep, clock=clock) is True
    assert len(slept) == n0

    # lock held past the bound: gives up False after ~wait_s
    def sleep_hold(s):
        slept.append(s)
        clock.t += s
        os.utime(lock, (clock.t, clock.t))     # session keeps touching it

    os.utime(lock, (clock.t, clock.t))
    assert bench.wait_for_session_lock(str(lock), wait_s=100, stale_s=500,
                                       poll_s=10, sleep=sleep_hold,
                                       clock=clock) is False
