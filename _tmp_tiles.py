import time, jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
from raytracing_cuda_tpu.scene.builders import build_scene
from raytracing_cuda_tpu.sim import state as sim
from raytracing_cuda_tpu.render.pallas_rt import render_base_planes_pallas
from raytracing_cuda_tpu.sim.state import camera_rays, derive_frame
import functools

scene = jax.device_put(build_scene())
st = jax.device_put(sim.settle(sim.init_state()))

def make(th, tw):
    @jax.jit
    def f(scene, st):
        scene_f, lights, ambient = derive_frame(scene, st)
        rays = camera_rays(st.cam, 1280/720)
        planes = render_base_planes_pallas(scene_f, lights, ambient, rays,
                                           720, 1280, tile_h=th, tile_w=tw)
        return sum(jnp.sum(p) for p in planes)
    return f

fns = {}
for th, tw in [(16, 256), (32, 256), (16, 512), (24, 256), (48, 256), (32, 512)]:
    try:
        f = make(th, tw)
        t0 = time.perf_counter()
        float(f(scene, st))
        print(f"tile ({th},{tw}): compiled in {time.perf_counter()-t0:.0f}s", flush=True)
        fns[(th, tw)] = f
    except Exception as e:
        print(f"tile ({th},{tw}): FAIL {str(e)[:120]}", flush=True)

for rep in range(2):
    for k, f in fns.items():
        t0 = time.perf_counter()
        for _ in range(15): r = f(scene, st)
        float(r)
        print(f"rep{rep} tile {k}: {(time.perf_counter()-t0)/15*1e3:.1f} ms", flush=True)
