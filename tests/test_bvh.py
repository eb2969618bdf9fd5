"""BVH builder invariants + jnp traversal == brute-force intersector."""

import jax.numpy as jnp
import numpy as np

from spray_tpu.bvh.builder import build_bvh, reordered_tri_arrays
from spray_tpu.bvh.traverse import BVHIntersector
from spray_tpu.io.scenes import bumpy_sphere, cornell_box
from spray_tpu.oracle.brute import BruteIntersector


def _rand_rays(n, lo, hi, seed=0):
    rng = np.random.RandomState(seed)
    o = rng.uniform(lo - 1, hi + 1, (n, 3)).astype(np.float32)
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    return jnp.asarray(o), jnp.asarray(d)


def test_builder_invariants():
    scene = bumpy_sphere(subdiv=3)
    bvh = build_bvh(scene.vertices, scene.faces, leaf_size=8, branching=8)
    ntri = scene.num_faces
    order = bvh.tri_order
    real = order[order >= 0]
    # every tri appears exactly once
    assert sorted(real.tolist()) == list(range(ntri))
    # leaf runs are padded to leaf_size
    assert len(order) % bvh.leaf_size == 0
    # children boxes are contained in finite world bounds
    finite = np.isfinite(bvh.child_lo).all(-1)
    assert (bvh.child_lo[finite] >= bvh.world_lo - 1e-4).all()
    assert (bvh.child_hi[np.isfinite(bvh.child_hi).all(-1)] <= bvh.world_hi + 1e-4).all()
    # child_node encoding: internal indices in range
    internal = bvh.child_node[bvh.child_node >= 0]
    assert (internal < bvh.num_nodes).all()
    # every leaf first-tri offset within array
    leaf = bvh.child_node <= -2
    firsts = -(bvh.child_node[leaf] + 2)
    assert (firsts >= 0).all() and (firsts < len(order)).all()
    assert (bvh.child_count[leaf] > 0).all()


def _check_match(scene, n_rays=512, seed=1):
    v = np.asarray(scene.vertices)
    o, d = _rand_rays(n_rays, v.min(0), v.max(0), seed)
    tmin = jnp.zeros(n_rays, jnp.float32)
    tmax = jnp.full(n_rays, np.inf, jnp.float32)
    brute = BruteIntersector(scene, jnp)
    bvh = BVHIntersector(scene, leaf_size=8)
    hb = brute.intersect(o, d, tmin, tmax)
    hv = bvh.intersect(o, d, tmin, tmax)
    np.testing.assert_array_equal(np.asarray(hb.valid), np.asarray(hv.valid))
    m = np.asarray(hb.valid)
    np.testing.assert_allclose(
        np.asarray(hb.t)[m], np.asarray(hv.t)[m], rtol=1e-5, atol=1e-6
    )
    # prim ids must agree wherever the nearest hit is unambiguous
    same = np.asarray(hb.prim)[m] == np.asarray(hv.prim)[m]
    assert same.mean() > 0.999, f"prim mismatch rate {1 - same.mean():.4f}"
    # occlusion
    ob = np.asarray(brute.occluded(o, d, tmax * 0 + 1e30))
    ov = np.asarray(bvh.occluded(o, d, tmax * 0 + 1e30))
    np.testing.assert_array_equal(ob, ov)


def test_traversal_matches_brute_cornell():
    _check_match(cornell_box(), n_rays=512)


def test_traversal_matches_brute_sphere():
    _check_match(bumpy_sphere(subdiv=3), n_rays=512, seed=2)
