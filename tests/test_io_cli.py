"""PLY round-trip, scene description files, CLI apps, viewer, optimization."""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

from spray_tpu.io.ply import read_ply, write_ply
from spray_tpu.io.scenes import bumpy_sphere, cornell_box
from spray_tpu.io.scene_file import load_scene, save_scene

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_ply_roundtrip_binary_and_ascii(tmp_path):
    s = bumpy_sphere(subdiv=2)
    colors = np.random.RandomState(0).uniform(size=(len(s.vertices), 3))
    for binary in (True, False):
        p = tmp_path / f"m_{binary}.ply"
        write_ply(p, s.vertices, s.faces, colors=colors, binary=binary)
        m = read_ply(p)
        np.testing.assert_allclose(m["vertices"], s.vertices, atol=1e-5)
        np.testing.assert_array_equal(m["faces"], s.faces)
        assert m["colors"] is not None
        np.testing.assert_allclose(m["colors"], colors, atol=1 / 255.0)


def test_scene_description_roundtrip(tmp_path):
    scene = cornell_box()
    assign = (np.arange(scene.num_faces) % 3).astype(np.int32)
    path = tmp_path / "scene.json"
    save_scene(path, scene, assign=assign)
    loaded, assign2, cam = load_scene(path)
    assert loaded.num_faces == scene.num_faces
    assert set(np.unique(assign2)) == {0, 1, 2}
    # geometry preserved (per-domain reordering allowed): compare tri sets
    def tri_set(s):
        v = np.asarray(s.vertices)[np.asarray(s.faces).reshape(-1)]
        return np.sort(v.reshape(-1, 9), axis=0)

    np.testing.assert_allclose(tri_set(loaded), tri_set(scene), atol=1e-5)


def _run_cli(args):
    env = dict(os.environ, JAX_PLATFORM_NAME="cpu", JAX_PLATFORMS="cpu")
    return subprocess.run(
        [sys.executable, "-m", "spray_tpu.cli"] + args,
        cwd=REPO, env=env, capture_output=True, text=True, timeout=300,
    )


def test_cli_render_and_inspect(tmp_path):
    out = str(tmp_path / "img.ppm")
    r = _run_cli(
        ["render", "--builtin", "cornell", "-o", out, "--size", "32",
         "--spp", "1", "--bounces", "1"]
    )
    assert r.returncode == 0, r.stderr[-2000:]
    stats = json.loads(r.stdout.strip().splitlines()[-1])
    assert stats["scene_tris"] == 36
    assert os.path.exists(out)

    r2 = _run_cli(["inspect", "--builtin", "cornell"])
    assert r2.returncode == 0
    info = json.loads(r2.stdout)
    assert info["triangles"] == 36 and info["emissive_faces"] == 2


def test_cli_ooc_vs_baseline_scheduler(tmp_path):
    """The speculative OOC app and the non-speculative baseline app produce
    identical images (the reference's central correctness check, R17)."""
    outs = {}
    for sched in ("ooc", "baseline"):
        out = str(tmp_path / f"{sched}.ppm")
        r = _run_cli(
            ["render", "--builtin", "cornell", "-o", out, "--size", "24",
             "--spp", "1", "--bounces", "1", "--scheduler", sched,
             "--domains", "4", "--slots", "2"]
        )
        assert r.returncode == 0, r.stderr[-2000:]
        stats = json.loads(r.stdout.strip().splitlines()[-1])
        assert stats["epochs"] > 0
        outs[sched] = open(out, "rb").read()
    assert outs["ooc"] == outs["baseline"]


def test_viewer_terminal_and_interactive():
    import io

    from spray_tpu.core.config import RenderConfig
    from spray_tpu.viewer import InteractiveViewer, show_terminal

    v = InteractiveViewer(
        cornell_box(), RenderConfig(spp=1, bounces=1, integrator="pt"),
        size=16,
    )
    img1 = v.frame()
    img2 = v.frame()  # progressive accumulation
    assert img1.shape == (16, 16, 3)
    assert np.isfinite(img2).all()
    v.orbit(dtheta=0.3)
    img3 = v.frame()
    assert not np.allclose(img1, img3)  # camera moved
    buf = io.StringIO()
    show_terminal(img1, out=buf)
    assert "\x1b[38;2" in buf.getvalue()


def test_fit_albedo_recovers_and_checkpoints(tmp_path):
    import jax.numpy as jnp

    from spray_tpu.core.camera import make_camera
    from spray_tpu.core.config import RenderConfig
    from spray_tpu.diff import make_diff_render_fn
    from spray_tpu.optim import fit

    scene = cornell_box()
    cam = make_camera(
        eye=(0.5, 0.5, 2.2), lookat=(0.5, 0.5, 0), up=(0, 1, 0),
        fov_y_deg=40, width=16, height=16,
    )
    cfg = RenderConfig(spp=1, bounces=1, integrator="pt", seed=3)
    target = make_diff_render_fn(scene, cam, cfg)(
        {"albedo": jnp.asarray(scene.albedo)}
    )
    # start from wrong albedo; optimize back toward the target image
    start = {"albedo": jnp.asarray(scene.albedo) * 0.4 + 0.2}
    ckpt = str(tmp_path / "ck.npz")
    params, losses = fit(
        scene, cam, cfg, target, start, steps=12, lr=0.1,
        checkpoint_path=ckpt, checkpoint_every=6,
    )
    assert losses[-1] < losses[0] * 0.5
    assert os.path.exists(ckpt)
    # resume continues from the saved step without error
    params2, losses2 = fit(
        scene, cam, cfg, target, start, steps=14, lr=0.1,
        checkpoint_path=ckpt, checkpoint_every=100, resume=True,
    )
    assert len(losses2) == 2  # resumed at step 12 of 14


def test_native_builder_matches_numpy():
    from spray_tpu import native
    from spray_tpu.kernels import cluster_bvh as cb

    lib = native.get_lib()
    assert lib is not None, "native toolchain expected in this image"
    s = bumpy_sphere(subdiv=3)
    tv = s.vertices[np.asarray(s.faces).reshape(-1)].reshape(-1, 3, 3)
    tlo, thi = tv.min(1), tv.max(1)
    order_c = native.morton_order(tlo, thi)
    order_np = cb._morton_order(tlo, thi)
    np.testing.assert_array_equal(order_c, order_np)
    v0 = tv[:, 0].astype(np.float32)
    e1 = (tv[:, 1] - tv[:, 0]).astype(np.float32)
    e2 = (tv[:, 2] - tv[:, 0]).astype(np.float32)
    tf_c = native.tri_transforms(v0, e1, e2)
    tf_np = cb.tri_transforms(v0, e1, e2)
    np.testing.assert_allclose(tf_c, tf_np, rtol=2e-4, atol=1e-5)
