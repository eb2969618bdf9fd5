"""Inverse-rendering optimization loop with checkpoint/resume (SURVEY.md §5:
the reference has no checkpointing — frames are short; our differentiable
optimization loops are long-running, so params + opt state + step are
checkpointed).

`fit` performs gradient descent of a pixel loss w.r.t. scene parameters
(albedo / vertices / emission) using the frozen-visibility differentiable
renderer.  Checkpoints are plain npz (no extra deps, orbax optional): the
counter-based RNG needs no state beyond the step index — resuming reproduces
the exact sample stream.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

from .diff import make_diff_render_fn

try:
    import optax

    _HAVE_OPTAX = True
except ImportError:  # pragma: no cover
    _HAVE_OPTAX = False


def l2_image_loss(img, target):
    return jnp.mean((img - target) ** 2)


def save_checkpoint(path, step, params, opt_state_flat):
    np.savez(
        path, step=step,
        **{f"p_{k}": np.asarray(v) for k, v in params.items()},
        **{f"o_{i}": np.asarray(v) for i, v in enumerate(opt_state_flat)},
    )


def load_checkpoint(path):
    z = np.load(path)
    step = int(z["step"])
    params = {
        k[2:]: jnp.asarray(z[k]) for k in z.files if k.startswith("p_")
    }
    opt_flat = [
        jnp.asarray(z[f"o_{i}"])
        for i in range(sum(1 for k in z.files if k.startswith("o_")))
    ]
    return step, params, opt_flat


def fit(scene, camera, cfg, target, params, steps=100, lr=5e-2,
        make_intersector=None, checkpoint_path=None, checkpoint_every=50,
        resume=True, callback=None):
    """Optimize `params` (dict of scene arrays) against a target image.

    Returns (params, losses).  Resumes from checkpoint_path if it exists.
    """
    if not _HAVE_OPTAX:
        raise RuntimeError("optax unavailable")
    render = make_diff_render_fn(scene, camera, cfg, make_intersector)
    target = jnp.asarray(target, jnp.float32)
    opt = optax.adam(lr)

    # intersector passed through jit as a pytree argument (core/pytree.py)
    @jax.jit
    def step_fn(params, opt_state, isect):
        loss, grads = jax.value_and_grad(
            lambda p: l2_image_loss(render(p, isect), target)
        )(params)
        updates, opt_state = opt.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    opt_state = opt.init(params)
    start = 0
    if checkpoint_path and resume and os.path.exists(checkpoint_path):
        start, params, opt_flat = load_checkpoint(checkpoint_path)
        treedef = jax.tree.structure(opt_state)
        opt_state = jax.tree.unflatten(treedef, opt_flat)

    losses = []
    for i in range(start, steps):
        params, opt_state, loss = step_fn(
            params, opt_state, render.base_intersector
        )
        losses.append(float(loss))
        if callback:
            callback(i, float(loss), params)
        if checkpoint_path and (i + 1) % checkpoint_every == 0:
            save_checkpoint(
                checkpoint_path, i + 1, params, jax.tree.leaves(opt_state)
            )
    return params, losses
