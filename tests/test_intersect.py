"""Intersection routine parity with checkHit (kernel.cu:41-129)."""

import numpy as np
import jax.numpy as jnp

from raytracing_cuda_tpu.ops import intersect as ix


def v(*xs):
    return jnp.array(xs, jnp.float32)


def arr(x):
    return jnp.asarray(x, jnp.float32)


class TestSphere:
    POS = arr([[0.0, 0.0, 0.0]])
    R = arr([1.0])

    def hit(self, o, d):
        h, t = ix.intersect_spheres(v(*o)[None], v(*d)[None], self.POS, self.R)
        return bool(h[0, 0]), float(t[0, 0])

    def test_head_on(self):
        h, t = self.hit((0, 0, -5), (0, 0, 1))
        assert h and np.isclose(t, 4.0)

    def test_behind(self):
        # tca <= 0 rejected (kernel.cu:55)
        h, _ = self.hit((0, 0, -5), (0, 0, -1))
        assert not h

    def test_miss_offset(self):
        h, _ = self.hit((0, 2, -5), (0, 0, 1))
        assert not h

    def test_grazing_inside_r2(self):
        # d2 must be strictly < r² (kernel.cu:58)
        h, _ = self.hit((0, 0.999, -5), (0, 0, 1))
        assert h

    def test_inside_sphere_quirk(self):
        # origin inside, center behind along dir → tca<0 → miss (reference quirk)
        h, _ = self.hit((0, 0, 0.5), (0, 0, 1))
        assert not h
        # origin inside, center ahead → hit with NEGATIVE near-root t,
        # exactly like the reference's t = tca - thc
        h, t = self.hit((0, 0, -0.5), (0, 0, 1))
        assert h and t < 0


class TestPlane:
    POS = v(0, -4.5, 0)
    N = v(0, 1, 0)

    def hit(self, o, d):
        h, t = ix.intersect_plane(v(*o), v(*d), self.POS, self.N)
        return bool(h), float(t)

    def test_from_above(self):
        h, t = self.hit((0, 0, 0), (0, -1, 0))
        assert h and np.isclose(t, 4.5)

    def test_from_below_hits_too(self):
        # the reference never flips the normal; rays from below still hit
        h, t = self.hit((0, -10, 0), (0, 1, 0))
        assert h and np.isclose(t, 5.5)

    def test_parallel(self):
        # denom² must exceed 1e-5 (kernel.cu:77)
        h, _ = self.hit((0, 0, 0), (1, 0, 0))
        assert not h

    def test_pointing_away(self):
        h, _ = self.hit((0, 0, 0), (0, 1, 0))
        assert not h


class TestTriangle:
    # CCW triangle in the z=0 plane with normal +z... determined by winding
    V0 = arr([[0.0, 0.0, 0.0]])
    E1 = arr([[1.0, 0.0, 0.0]])   # v1 = (1,0,0)
    E2 = arr([[0.0, 1.0, 0.0]])   # v2 = (0,1,0)

    def hit(self, o, d, e1=None, e2=None):
        h, t = ix.intersect_triangles(
            v(*o)[None], v(*d)[None], self.V0,
            e1 if e1 is not None else self.E1,
            e2 if e2 is not None else self.E2)
        return bool(h[0, 0]), float(t[0, 0])

    def test_front_hit(self):
        # det = e1·(d×e2) must be >= 0.001: for e1=+x, e2=+y the front face
        # is approached travelling along -z
        h, t = self.hit((0.25, 0.25, 3), (0, 0, -1))
        assert h and np.isclose(t, 3.0)

    def test_backface_cull(self):
        h, _ = self.hit((0.25, 0.25, -3), (0, 0, 1))
        assert not h

    def test_outside_barycentric(self):
        h, _ = self.hit((0.9, 0.9, 3), (0, 0, -1))  # u+v > 1
        assert not h
        h, _ = self.hit((-0.1, 0.5, 3), (0, 0, -1))  # u < 0 side
        assert not h

    def test_edge_inclusive(self):
        # u=0 / v=0 boundaries accepted (reference rejects only strict <0 / >1)
        h, _ = self.hit((0.0, 0.5, 3), (0, 0, -1))
        assert h

    def test_behind_origin(self):
        h, _ = self.hit((0.25, 0.25, -3), (0, 0, -1))
        assert not h


class TestNearestAndOcclusion:
    def test_nearest_picks_closest(self, scene):
        # ray straight down over open island ground (away from the igloo dome,
        # which covers the origin column): island top face y=-4 wins over the
        # sea plane y=-4.5
        o = v(-20, 100, 0)[None]
        d = v(0, -1, 0)[None]
        hit, t, gidx = ix.nearest_hit(scene, o, d)
        assert bool(hit[0])
        assert np.isclose(float(t[0]), 104.0, atol=1e-3)
        assert 1 <= int(gidx[0]) <= 10  # an island top triangle

    def test_nearest_tiebreak_lowest_index(self, scene):
        # duplicate geometry: two identical spheres at different global slots
        import raytracing_cuda_tpu.core.types as T

        s = scene._replace(
            sph_pos=np.tile(np.array([[0, 0, 10]], np.float32), (scene.sph_pos.shape[0], 1)),
            sph_r=np.full(scene.sph_r.shape, 1.0, np.float32),
        )
        o = v(0, 0, 0)[None]
        d = v(0, 0, 1)[None]
        hit, t, gidx = ix.nearest_hit(s, o, d)
        assert bool(hit[0])
        # all spheres coincide → winner must be the lowest sphere global index (11)
        assert int(gidx[0]) == int(np.min(np.asarray(s.sph_gidx)))

    def test_sky_miss(self, scene):
        o = v(0, 100, 0)[None]
        d = v(0, 1, 0)[None]  # straight up: no geometry
        hit, t, gidx = ix.nearest_hit(scene, o, d)
        assert not bool(hit[0]) and int(gidx[0]) == -1

    def test_occlusion_basic(self, scene):
        # point under the island top, light straight above → occluded
        o = v(-20, -5.9, 0)[None]
        d = v(0, 1, 0)[None]
        occ = ix.occluded(scene, o, d, arr([1000.0]))
        assert bool(occ[0])

    def test_light_spheres_never_occlude(self, scene):
        # aim straight at the sun proxy sphere from empty space
        sun_pos = np.asarray(scene.sph_pos[-2])
        o = jnp.asarray(sun_pos + np.array([0, 0, -200], np.float32))[None]
        d = v(0, 0, 1)[None]
        occ = ix.occluded(scene, o, d, arr([150.0]))
        assert not bool(occ[0])

    def test_occlusion_respects_distance(self, scene):
        # same ray, but the light is closer than the island top → not occluded
        o = v(-20, -5.9, 0)[None]
        d = v(0, 1, 0)[None]
        occ = ix.occluded(scene, o, d, arr([0.5]))
        assert not bool(occ[0])

    def test_inside_sphere_occludes(self, scene):
        # reference quirk: a sphere containing the shadow origin reports a
        # negative hit distance, which still passes hitDist < shadowDist
        # (kernel.cu:189) — points inside the igloo dome are always shadowed
        o = v(0, -5.9, 0)[None]  # inside igloo dome (center (4,-4,-4), r=10)
        d = v(0, 1, 0)[None]
        occ = ix.occluded(scene, o, d, arr([0.5]))
        assert bool(occ[0])
