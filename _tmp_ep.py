import time, jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
from raytracing_cuda_tpu.scene.builders import build_scene
from raytracing_cuda_tpu.scene.textures import procedural_skies
from raytracing_cuda_tpu.sim import state as sim
from raytracing_cuda_tpu.render.pipeline import render_frame
from raytracing_cuda_tpu.render.pallas_rt import render_base_planes_pallas
from raytracing_cuda_tpu.sim.state import camera_rays, derive_frame

scene = jax.device_put(build_scene())
sky = jax.device_put(jnp.asarray(procedural_skies(2048, 4096)))
st = jax.device_put(sim.settle(sim.init_state()))

@jax.jit
def planes(scene, st):
    scene_f, lights, ambient = derive_frame(scene, st)
    rays = camera_rays(st.cam, 1280/720)
    ps = render_base_planes_pallas(scene_f, lights, ambient, rays, 720, 1280)
    return sum(jnp.sum(p) for p in ps)

def t(name, f, n=15):
    f(); r = f()
    jax.tree_util.tree_map(lambda x: x.block_until_ready(), r)
    t0 = time.perf_counter()
    for _ in range(n): r = f()
    leaf = jax.tree_util.tree_leaves(r)[0]
    float(jnp.sum(leaf) if leaf.ndim else leaf)
    print(f"{name}: {(time.perf_counter()-t0)/n*1e3:.1f} ms", flush=True)

for rep in range(2):
    t(f"r{rep} planes only", lambda: planes(scene, st))
    t(f"r{rep} full fxaa", lambda: render_frame(scene, st, sky, 720, 1280, path="pallas"))
    t(f"r{rep} full nofxaa", lambda: render_frame(scene, st, sky, 720, 1280, path="pallas", fxaa_static=False))
