"""jax.distributed multi-process worker (SURVEY.md §4: 'jax.distributed
multi-process on localhost exercises the same shard_map code paths').

Launched by test_multiprocess.py as
    python tests/mp_worker.py <proc_id> <num_procs> <port>
Initializes the distributed runtime over localhost (Gloo CPU collectives),
runs the fully-distributed in-situ epoch renderer (dist/epochs.py) on a
2-devices-per-process mesh, and verifies THIS process's pixel shards against
a locally-computed single-device reference.  Prints 'MP_OK <id>' on success.
"""

import os
import sys

proc_id = int(sys.argv[1])
num_procs = int(sys.argv[2])
port = sys.argv[3]

os.environ["JAX_PLATFORM_NAME"] = "cpu"
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.setdefault(
    "XLA_FLAGS", "--xla_force_host_platform_device_count=2"
)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(
    coordinator_address=f"localhost:{port}",
    num_processes=num_procs,
    process_id=proc_id,
)

import numpy as np
from jax.sharding import Mesh

from spray_tpu.core.camera import make_camera
from spray_tpu.core.config import RenderConfig
from spray_tpu.dist.epochs import make_insitu_renderer
from spray_tpu.integrators.device import render_device
from spray_tpu.io.scenes import wisp_cloud


def main():
    assert jax.process_count() == num_procs
    ndev = jax.device_count()
    assert ndev == 2 * num_procs, (ndev, num_procs)

    scene = wisp_cloud(n_blobs=4, tris_per_blob=256, seed=5)
    camera = make_camera(
        eye=(10.0, 8.0, 14.0), lookat=(0, 0, 0), up=(0, 1, 0),
        fov_y_deg=45, width=32, height=32,
    )
    cfg = RenderConfig(spp=1, bounces=1, integrator="pt", seed=0)

    mesh = Mesh(np.array(jax.devices()).reshape(-1), ("dev",))
    render = make_insitu_renderer(
        scene, camera, cfg, mesh, n_domains=8, bucket=512, max_epochs=32
    )
    pids, vals = render.local()

    # reference: single-device render of the full frame, local to this proc
    ref = np.asarray(render_device(scene, camera, cfg)).reshape(-1, 3)
    mine = ref[pids]
    err = np.abs(vals - mine).max()
    assert err < 1e-4, f"proc {proc_id}: local shard mismatch {err}"
    print(f"MP_OK {proc_id} pixels={len(pids)} maxerr={err:.2e}", flush=True)


if __name__ == "__main__":
    main()
