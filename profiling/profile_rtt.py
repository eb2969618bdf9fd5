"""Calibrate axon-tunnel fixed cost: trivial jit scalar + grid scaling."""
import sys, time
from pathlib import Path
sys.path.insert(0, str(Path(__file__).parent))
import numpy as np
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

x = jnp.asarray(np.random.randn(8, 128).astype(np.float32))
f0 = jax.jit(lambda x: jnp.sum(x * 2.0))
_ = float(f0(x))
ts = []
for _ in range(10):
    t0 = time.time(); _ = float(f0(x)); ts.append(time.time()-t0)
print(f"trivial jit scalar roundtrip: min {min(ts)*1e3:.2f} ms  med {sorted(ts)[5]*1e3:.2f}", flush=True)

P = 512
rays8 = jnp.asarray(np.random.randn(P, 8, 1024).astype(np.float32))
it8 = jnp.asarray((np.random.rand(P, 8, 512)*100+50).astype(np.float32))

def mk(nv):
    nvp = nv // P
    pkt_of = jnp.asarray(np.repeat(np.arange(P, dtype=np.int32), nvp))
    first = jnp.asarray(np.tile((np.arange(nvp) == 0).astype(np.int32), P))
    last = jnp.asarray(np.tile((np.arange(nvp) == nvp - 1).astype(np.int32), P))
    def k(pr, fr, lr, rays_ref, it_ref, out_ref, acc):
        v = pl.program_id(0)
        @pl.when(fr[v] != 0)
        def _():
            acc[...] = it_ref[0]
        acc[...] = jnp.minimum(acc[...], rays_ref[0, :, 0:512] + 200.0)
        @pl.when(lr[v] != 0)
        def _():
            out_ref[0] = acc[...]
    bypkt = lambda shp: pl.BlockSpec(shp, lambda v, pr, fr, lr: (pr[v], 0, 0), memory_space=pltpu.VMEM)
    gs = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3, grid=(nv,),
        in_specs=[bypkt((1,8,1024)), bypkt((1,8,512))],
        out_specs=bypkt((1,8,512)),
        scratch_shapes=[pltpu.VMEM((8,512), jnp.float32)])
    pc = pl.pallas_call(k, grid_spec=gs, out_shape=jax.ShapeDtypeStruct((P,8,512), jnp.float32))
    return jax.jit(lambda *a: jnp.sum(pc(*a))), (pkt_of, first, last, rays8, it8)

for nv in (512, 8192):
    f, args = mk(nv)
    _ = float(f(*args))
    ts = []
    for _ in range(5):
        t0 = time.time(); _ = float(f(*args)); ts.append(time.time()-t0)
    print(f"nv={nv}: min {min(ts)*1e3:.2f} ms", flush=True)
