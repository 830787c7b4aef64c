"""Sweep Pallas rasterizer settings at the smooth-confidence shape."""
import sys, time
import numpy as np
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
from freepose_tpu.ops.rasterizer import RasterSettings, rasterize
from freepose_tpu.io.mesh import TriMesh, pad_mesh

rng = np.random.default_rng(0)
n_lat = n_lon = 90
verts, faces = [], []
for i in range(n_lat + 1):
    th = np.pi * i / n_lat
    for j in range(n_lon):
        ph = 2 * np.pi * j / n_lon
        r = 1.0 + 0.15 * np.sin(4 * ph) * np.sin(3 * th)
        verts.append([r*np.sin(th)*np.cos(ph), r*np.sin(th)*np.sin(ph), r*np.cos(th)])
for i in range(n_lat):
    for j in range(n_lon):
        a=i*n_lon+j; b=i*n_lon+(j+1)%n_lon; c=(i+1)*n_lon+j; d=(i+1)*n_lon+(j+1)%n_lon
        faces += [[a,b,c],[b,d,c]]
v = np.asarray(verts, np.float32); v /= np.abs(v).max()/0.15
mesh = TriMesh(v, np.asarray(faces, np.int32), rng.random((len(v),3)).astype(np.float32))
vv, cc, ff, valid = pad_mesh(mesh, 8192, 16384)
vv, cc, ff, valid = map(jnp.asarray, (vv, cc, ff, valid))
poses = np.tile(np.eye(4, dtype=np.float32), (8,1,1)); poses[:,2,3] = 0.9
poses = jnp.asarray(poses)
k = jnp.asarray([[600.,0,259],[0,600,259],[0,0,1]])

def t(label, setts, reps=4):
    fn = jax.jit(lambda p: rasterize(vv, cc, ff, valid, p, k, setts)[0])
    out = fn(poses); np.asarray(out[0,0,:2])
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        o = poses
        rgb = None
        for _ in range(4):
            rgb = fn(poses)
        np.asarray(rgb[0,0,:2])
        ts.append((time.perf_counter()-t0)/4)
    m = float(np.median(ts))
    print(f"{label}: {1e3*m:.1f} ms per 8-render batch = {1e3*m/8:.2f} ms/render", flush=True)

for tile, mft in [(37, 256), (37, 192), (37, 320), (28, 256), (56, 256), (74, 256), (37, 128)]:
    try:
        t(f"tile={tile} mft={mft}", RasterSettings(resolution=518, tile=tile, max_faces_per_tile=mft))
    except Exception as e:
        print(f"tile={tile} mft={mft}: FAILED {type(e).__name__} {str(e)[:100]}")
