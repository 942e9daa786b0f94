import os, sys, time, json
REPO = "/root/repo"
sys.path.insert(0, REPO)
import jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir", os.path.join(REPO, ".jax_cache"))
from cpu_ray_tracer_tpu.core import camera as cam_mod
from cpu_ray_tracer_tpu.scene import query
from cpu_ray_tracer_tpu.scene.build import compile_scene
from cpu_ray_tracer_tpu.ops.traverse_bvh import ray_octants
from cpu_ray_tracer_tpu.render.pathtracer import _compaction_perm

scene, info = compile_scene(os.path.join(REPO, "assets/scenes/bunny_teapot.xml"), layout="tlas")
cam = cam_mod.make_camera(1280, 720, pos=(0.0,0.3,-1.2), target=(0.0,-0.1,2.5))
r = cam.width*cam.height
rays = cam_mod.full_frame_rays(cam)
o, d = rays.o, rays.d
rng = np.random.default_rng(0)
res0 = jax.jit(lambda sc,o,d: query.find_nearest(sc,o,d))(scene,o,d)
jax.block_until_ready(res0)
hitp = o + res0["t"][...,None]*d
rd = jnp.asarray(rng.normal(size=(r,3)).astype(np.float32))
rd = rd/jnp.linalg.norm(rd,axis=1,keepdims=True)
# bounce-1 realistic: origins in PIXEL order (as the pass sees them), random dirs
ob, db = hitp + rd*1e-3, rd

def warm():
    g = jax.jit(lambda v: v*1.000001); y = jnp.float32(1.0)
    for _ in range(60): y = g(y)
    float(y)

f = jax.jit(lambda sc,o,d: query.find_nearest(sc,o,d,sort_rays=False)["t"].sum())
fs = jax.jit(lambda sc,o,d: (lambda res: (jnp.mean(res["traversed"].astype(jnp.float32)), jnp.mean(res["tested"].astype(jnp.float32))))(query.find_nearest(sc,o,d,sort_rays=False)))

def chain(f, *a, n=10):
    x = f(*a); jax.block_until_ready(x); warm()
    t = time.time()
    for _ in range(n): x = f(*a)
    jax.block_until_ready(x)
    return (time.time()-t)/n*1000

def report(name, o_, d_):
    ms = chain(f, scene, o_, d_)
    st, te = jax.device_get(fs(scene, o_, d_))
    print(json.dumps(dict(order=name, kernel_ms=round(ms,2), steps=round(float(st),1), tested=round(float(te),1))), flush=True)

report("pixel-order (no sort)", ob, db)

oct_ = ray_octants(db)
perm_oct = jnp.argsort(oct_, stable=True)
report("octant-stable", ob[perm_oct], db[perm_oct])

alive = jnp.ones((r,), jnp.bool_)
perm_m = jax.jit(_compaction_perm)(scene, ob, db, alive)
report("morton+octant", ob[perm_m], db[perm_m])

# --- extended key variants: can a better key shrink 4096-ray tile unions? ---
def spread3(v):
    v = (v | (v << 8)) & 0x0300F00F
    v = (v | (v << 4)) & 0x030C30C3
    v = (v | (v << 2)) & 0x09249249
    return v

res_tri = res0["tri_idx"]  # primary hit tri = origin-cluster id

def key_sort(name, key):
    perm = jnp.argsort(key)
    report(name, ob[perm], db[perm])

oct_b = ray_octants(db)
# (octant, primary-hit tri): origin coherence at leaf granularity
key_sort("oct<<20|tri", (oct_b << 20) | jnp.maximum(res_tri, 0))
# (octant, dir 2 bits/axis, tri)
qd = jnp.clip((jnp.abs(db) * 4), 0, 3).astype(jnp.int32)
dm = spread3(qd[..., 0]) | (spread3(qd[..., 1]) << 1) | (spread3(qd[..., 2]) << 2)
key_sort("oct|dir2|tri", (oct_b << 29) | (dm << 20) | jnp.maximum(res_tri, 0))
# direction-major: oct + 3 bits/axis dir morton, then origin morton (7b)
wmin = jnp.asarray(scene.packed.world_min, jnp.float32)
wext = jnp.asarray(scene.packed.world_max, jnp.float32) - wmin
q = jnp.clip(((ob - wmin) / jnp.maximum(wext, 1e-20)) * 127.0, 0.0, 127.0).astype(jnp.int32)
om = spread3(q[..., 0]) | (spread3(q[..., 1]) << 1) | (spread3(q[..., 2]) << 2)
qd3 = jnp.clip((jnp.abs(db) * 8), 0, 7).astype(jnp.int32)
dm3 = spread3(qd3[..., 0]) | (spread3(qd3[..., 1]) << 1) | (spread3(qd3[..., 2]) << 2)
key_sort("oct|dir3|omorton", (oct_b << 29) | (dm3 << 20) | (om >> 1))
# origin-major full morton then octant (the old production key) for reference
key_sort("omorton|oct", (om << 3) | oct_b)
