"""Grid overhead: accumulate / pl.when / full-kernel variants."""
import sys, time
from pathlib import Path
sys.path.insert(0, str(Path(__file__).parent))
import numpy as np
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NV = 8192
P = 512
S = 2562
np.random.seed(0)
w = jnp.asarray(np.random.randn(S, 4, 3072).astype(np.float32))
rays = jnp.asarray(np.random.randn(P, 6, 1024).astype(np.float32))
in_t = jnp.asarray(np.random.rand(P, 1, 512).astype(np.float32))
pkt_of = jnp.asarray(np.repeat(np.arange(P, dtype=np.int32), NV // P))
sn_of = jnp.asarray(np.random.randint(0, S, NV).astype(np.int32))
first = jnp.asarray(np.tile((np.arange(NV // P) == 0).astype(np.int32), P))

ray_dyn = pl.BlockSpec((1, 6, 1024), lambda v, pr, sr, fr: (pr[v], 0, 0), memory_space=pltpu.VMEM)
w_dyn = pl.BlockSpec((1, 4, 3072), lambda v, pr, sr, fr: (sr[v], 0, 0), memory_space=pltpu.VMEM)
int_spec = pl.BlockSpec((1, 1, 512), lambda v, pr, sr, fr: (pr[v], 0, 0), memory_space=pltpu.VMEM)

def run(name, in_specs, kernel, args):
    gs = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3, grid=(NV,), in_specs=in_specs,
        out_specs=int_spec)
    f = jax.jit(pl.pallas_call(kernel, grid_spec=gs,
        out_shape=jax.ShapeDtypeStruct((P, 1, 512), jnp.float32)))
    out = f(*args); _ = np.asarray(out)
    ts = []
    for _ in range(3):
        t0 = time.time(); out = f(*args); _ = np.asarray(out)
        ts.append(time.time()-t0)
    print(f"{name}: {min(ts)*1e3:.2f} ms = {min(ts)/NV*1e9:.0f} ns/step", flush=True)

def k_acc(pr, sr, fr, rays_ref, out_ref):
    out_ref[0] = out_ref[0] + rays_ref[0, 0:1, 0:512]

def k_first(pr, sr, fr, rays_ref, it_ref, out_ref):
    v = pl.program_id(0)
    @pl.when(fr[v] != 0)
    def _():
        out_ref[0] = it_ref[0]
    out_ref[0] = out_ref[0] + rays_ref[0, 0:1, 0:512]

def k_matmul(pr, sr, fr, rays_ref, w_ref, it_ref, out_ref):
    v = pl.program_id(0)
    @pl.when(fr[v] != 0)
    def _():
        out_ref[0] = it_ref[0]
    odp = jax.lax.dot_general(w_ref[0], rays_ref[0, 0:4],
        (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST)  # (3072, 1024)
    out_ref[0] = jnp.minimum(out_ref[0], jnp.min(odp, axis=0, keepdims=True)[:, 0:512])

def k_matmul_when(pr, sr, fr, rays_ref, w_ref, it_ref, out_ref):
    v = pl.program_id(0)
    @pl.when(fr[v] != 0)
    def _():
        out_ref[0] = it_ref[0]
    cur = out_ref[0]
    anyv = jnp.max(cur) > 0.1
    @pl.when(anyv)
    def _():
        odp = jax.lax.dot_general(w_ref[0], rays_ref[0, 0:4],
            (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)
        out_ref[0] = jnp.minimum(out_ref[0], jnp.min(odp, axis=0, keepdims=True)[:, 0:512])

run("F accumulate out      ", [ray_dyn], k_acc, (pkt_of, sn_of, first, rays))
run("G +pl.when(first) init", [ray_dyn, int_spec], k_first, (pkt_of, sn_of, first, rays, in_t))
run("H +matmul min         ", [ray_dyn, w_dyn, int_spec], k_matmul, (pkt_of, sn_of, first, rays, w, in_t))
run("I +matmul under when  ", [ray_dyn, w_dyn, int_spec], k_matmul_when, (pkt_of, sn_of, first, rays, w, in_t))
