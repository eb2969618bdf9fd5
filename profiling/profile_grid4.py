"""Find the per-grid-step floor: which feature costs microseconds (real)."""
import sys, time
from pathlib import Path
sys.path.insert(0, str(Path(__file__).parent))
import numpy as np
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NV = 8192
P = 512
np.random.seed(0)
rays8 = jnp.asarray(np.random.randn(P, 8, 1024).astype(np.float32))
pkt_of = jnp.asarray(np.repeat(np.arange(P, dtype=np.int32), NV // P))
sn_of = jnp.asarray(np.zeros(NV, np.int32))

def run(name, ray_spec, out_spec, kernel, args, grid=NV, nsp=2):
    gs = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=nsp, grid=(grid,), in_specs=[ray_spec],
        out_specs=out_spec)
    f = jax.jit(pl.pallas_call(kernel, grid_spec=gs,
        out_shape=jax.ShapeDtypeStruct((P, 8, 1024), jnp.float32)))
    out = f(*args); _ = np.asarray(out)
    ts = []
    for _ in range(3):
        t0 = time.time(); out = f(*args); _ = np.asarray(out)
        ts.append(time.time()-t0)
    print(f"{name}: {min(ts)*1e3:.2f} ms = {min(ts)/grid*1e9:.0f} ns/step", flush=True)

def k(pr, sr, rays_ref, out_ref):
    out_ref[0] = rays_ref[0] * 2.0

mkray = lambda fn: pl.BlockSpec((1, 8, 1024), fn, memory_space=pltpu.VMEM)
mkout = lambda fn: pl.BlockSpec((1, 8, 1024), fn, memory_space=pltpu.VMEM)

# 1: sequential static index (v // 16) - classic pipelined pattern
run("1 static v//16 in+out", mkray(lambda v, pr, sr: (v // 16, 0, 0)),
    mkout(lambda v, pr, sr: (v // 16, 0, 0)), k, (pkt_of, sn_of, rays8))
# 2: prefetch-driven index (same values)
run("2 pr[v]      in+out  ", mkray(lambda v, pr, sr: (pr[v], 0, 0)),
    mkout(lambda v, pr, sr: (pr[v], 0, 0)), k, (pkt_of, sn_of, rays8))
# 3: prefetch-driven in, static out
run("3 pr[v] in, v//16 out", mkray(lambda v, pr, sr: (pr[v], 0, 0)),
    mkout(lambda v, pr, sr: (v // 16, 0, 0)), k, (pkt_of, sn_of, rays8))
# 4: grid=P only (one step per packet), static
run("4 grid=512 static    ", mkray(lambda v, pr, sr: (v, 0, 0)),
    mkout(lambda v, pr, sr: (v, 0, 0)), k, (pkt_of, sn_of, rays8), grid=P)
