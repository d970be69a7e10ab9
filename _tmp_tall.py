import time, jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
from raytracing_cuda_tpu.scene.builders import build_scene, ISLAND_TRI_CLUSTERS
from raytracing_cuda_tpu.scene.textures import procedural_skies
from raytracing_cuda_tpu.sim import state as sim
from raytracing_cuda_tpu.render.pipeline import render_frame

scene = jax.device_put(build_scene())
sky = jax.device_put(jnp.asarray(procedural_skies(2048, 4096)))
st = jax.device_put(sim.settle(sim.init_state()))

def t(name, f, n=10):
    f(); r = f(); r.block_until_ready()
    t0 = time.perf_counter()
    for _ in range(n): r = f()
    float(jnp.sum(r.astype(jnp.float32)))
    print(f"{name}: {(time.perf_counter()-t0)/n*1e3:.1f} ms", flush=True)

for rep in range(2):
    t(f"r{rep} 720p frame", lambda: render_frame(scene, st, sky, 720, 1280,
        path="pallas", tri_clusters=ISLAND_TRI_CLUSTERS), n=10)
    t(f"r{rep} 2880-tall (4x)", lambda: render_frame(scene, st, sky, 2880, 1280,
        path="pallas", tri_clusters=ISLAND_TRI_CLUSTERS), n=5)
