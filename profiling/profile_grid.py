"""Isolate Pallas grid-step overhead under scalar-prefetch index maps."""
import sys, time
from pathlib import Path
sys.path.insert(0, str(Path(__file__).parent))
import numpy as np
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NV = 8192
P = 512          # packets
S = 2562         # supernode-ish blocks
np.random.seed(0)
w = jnp.asarray(np.random.randn(S, 4, 3072).astype(np.float32))
rays = jnp.asarray(np.random.randn(P, 6, 1024).astype(np.float32))
pkt_of = jnp.asarray(np.repeat(np.arange(P, dtype=np.int32), NV // P))
sn_of = jnp.asarray(np.random.randint(0, S, NV).astype(np.int32))
sn_sorted = jnp.asarray(np.sort(np.random.randint(0, S, NV)).astype(np.int32))

def run(name, in_specs, out_spec, kernel, args, grid=NV):
    gs = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2, grid=(grid,), in_specs=in_specs,
        out_specs=out_spec)
    f = jax.jit(pl.pallas_call(kernel, grid_spec=gs,
        out_shape=jax.ShapeDtypeStruct((P, 1, 1024), jnp.float32)))
    out = f(*args); _ = np.asarray(out)
    ts = []
    for _ in range(3):
        t0 = time.time(); out = f(*args); _ = np.asarray(out)
        ts.append(time.time()-t0)
    print(f"{name}: {min(ts)*1e3:.2f} ms = {min(ts)/grid*1e9:.0f} ns/step", flush=True)

def trivial(pr, sr, rays_ref, out_ref):
    out_ref[0] = rays_ref[0, 0:1] * 2.0

def trivial_w(pr, sr, rays_ref, w_ref, out_ref):
    out_ref[0] = rays_ref[0, 0:1] + w_ref[0, 0:1, 0:1024]

ray_const = pl.BlockSpec((1, 6, 1024), lambda v, pr, sr: (0, 0, 0), memory_space=pltpu.VMEM)
ray_dyn = pl.BlockSpec((1, 6, 1024), lambda v, pr, sr: (pr[v], 0, 0), memory_space=pltpu.VMEM)
w_dyn = pl.BlockSpec((1, 4, 3072), lambda v, pr, sr: (sr[v], 0, 0), memory_space=pltpu.VMEM)
out_const = pl.BlockSpec((1, 1, 1024), lambda v, pr, sr: (0, 0, 0), memory_space=pltpu.VMEM)
out_dyn = pl.BlockSpec((1, 1, 1024), lambda v, pr, sr: (pr[v], 0, 0), memory_space=pltpu.VMEM)

run("A const-in const-out   ", [ray_const], out_const, trivial, (pkt_of, sn_of, rays))
run("B dyn-in(pkt) const-out", [ray_dyn], out_const, trivial, (pkt_of, sn_of, rays))
run("C dyn-in dyn-out       ", [ray_dyn], out_dyn, trivial, (pkt_of, sn_of, rays))
run("D +w random            ", [ray_dyn, w_dyn], out_dyn, trivial_w, (pkt_of, sn_of, rays, w))
run("E +w sorted            ", [ray_dyn, w_dyn], out_dyn, trivial_w, (pkt_of, sn_sorted, rays, w))
