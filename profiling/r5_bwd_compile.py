"""Round-5: backward-scan compile-time experiments (VERDICT r4 next#3).

The fwd+bwd bench step's cold XLA compile is ~93-101s, of which ~73s is the
backward program (insensitive to which param is differentiated — DESIGN r4).
Variants, each timed as .lower().compile() with a FRESH (tmp) cache dir plus
one fenced execution for the runtime cost:

  base — lax.scan default residual saving (production r4)
  full — jax.checkpoint on the scan body (recompute bounce body in bwd)
  dots — checkpoint_dots policy

Usage: python profiling/r5_bwd_compile.py [variant ...]
"""

import json
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax
import numpy as np


def main():
    variants = sys.argv[1:] or ["base", "full", "dots"]
    from spray_tpu.core.camera import make_camera
    from spray_tpu.core.config import RenderConfig
    from spray_tpu.integrators import wavefront
    from spray_tpu.io.scenes import wisp_cloud
    from spray_tpu.kernels.multidomain import MultiDomainClusterIntersector
    from spray_tpu.render import make_pipeline

    scene = wisp_cloud(n_blobs=8, tris_per_blob=131072, seed=3)
    camera = make_camera(
        eye=(14.0, 10.0, 18.0), lookat=(0, 0, 0), up=(0, 1, 0),
        fov_y_deg=45, width=512, height=512,
    )
    cfg = RenderConfig(spp=4, bounces=2, integrator="pt", seed=0)
    isect = MultiDomainClusterIntersector(scene)
    out = {}
    for variant in variants:
        wavefront.SCAN_REMAT = None if variant == "base" else variant
        # fresh, throwaway compile cache so each variant is a true cold XLA
        # compile (the persistent cache would otherwise serve prior runs)
        cache = tempfile.mkdtemp(prefix=f"jaxcache_{variant}_")
        jax.config.update("jax_compilation_cache_dir", cache)
        pipe = make_pipeline(scene, camera, cfg, backward=True,
                             intersector=isect)
        t0 = time.time()
        compiled = pipe._fn.lower(*pipe._args).compile()
        compile_s = time.time() - t0
        o = compiled(*pipe._args)
        np.asarray(jax.tree.leaves(o)[-1])
        best = 1e30
        for _ in range(2):
            t0 = time.time()
            o = compiled(*pipe._args)
            np.asarray(jax.tree.leaves(o)[-1])
            best = min(best, time.time() - t0)
        out[variant] = {
            "compile_s": round(compile_s, 1), "frame_s": round(best, 3),
            "loss": float(o[0]),
        }
        print(json.dumps({variant: out[variant]}), flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
