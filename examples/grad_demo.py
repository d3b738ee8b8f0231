"""Gradient-based use of the differentiable apply (aainterp.autodiff).

Run:  JAX_PLATFORMS=cpu python examples/grad_demo.py

The resampling operator is linear, so the framework ships EXACT
gradients: the VJP of the apply is the transposed operator, running on
the same banded/Pallas kernels (see aainterp/autodiff.py).  The
forward-only C++ reference (Source.cpp:55-911) has no analogue — this
demo shows two things it therefore cannot do:

1. **Adjoint splatting**: push dst-grid data back onto the src grid
   conservatively with ``aa.apply_operator_transpose`` (e.g. accumulate
   dose measured on a coarse rotated film grid onto the planning grid).

2. **Gradient reconstruction**: recover a high-resolution image from its
   area-averaged low-resolution measurement by gradient descent on
   ``|| A x - y ||^2`` — i.e. use area-average interpolation as the
   forward model of a super-resolution / deconvolution inverse problem.
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

if os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

import jax.numpy as jnp  # noqa: E402

import aainterp as aa  # noqa: E402


def main():
    rng = np.random.default_rng(0)

    # ground-truth high-res image: smooth blobs + a sharp box
    H = W = 96
    yy, xx = np.mgrid[0:H, 0:W]
    truth = (
        np.exp(-(((yy - 30) ** 2 + (xx - 40) ** 2) / 300.0))
        + 0.7 * np.exp(-(((yy - 70) ** 2 + (xx - 60) ** 2) / 120.0))
    )
    truth[20:28, 64:80] += 0.9
    truth = jnp.asarray(truth.astype(np.float32))

    # forward model: area-average downscale + 8-degree rotation
    spec = aa.make_grid_spec((H, W), 2.0, 1.0, (0.0, 0.0), 8.0)
    op = aa.build_operator(spec)
    fwd = lambda x: aa.apply_operator(op, x, differentiable=True)
    y = fwd(truth)
    y_noisy = y + 0.01 * jnp.asarray(
        rng.normal(size=y.shape).astype(np.float32))
    print(f"forward model: {truth.shape} -> {y.shape} at 8 deg")

    # 1. adjoint splatting: <A u, v> == <u, A^T v> (exact, fp rounding)
    v = jnp.asarray(rng.uniform(-1, 1, y.shape).astype(np.float32))
    lhs = float(jnp.vdot(fwd(truth), v))
    rhs = float(jnp.vdot(truth, aa.apply_operator_transpose(op, v)))
    print(f"adjoint identity: <Au,v>={lhs:.6f}  <u,A^Tv>={rhs:.6f}")

    # 2. gradient reconstruction of the high-res image
    @jax.jit
    def loss(x):
        r = fwd(x) - y_noisy
        return jnp.sum(r * r)

    grad = jax.jit(jax.grad(loss))
    x = jnp.zeros_like(truth)
    # stability: lr < 1 / sigma_max(A)^2; the normalised operator here has
    # sigma_max^2 ~ 1.19 (boundary rows), so 0.7 is safely inside
    lr = 0.7
    for it in range(201):
        x = x - lr * grad(x)
        if it % 50 == 0:
            err = float(jnp.sqrt(jnp.mean((x - truth) ** 2)))
            print(f"  iter {it:3d}  loss {float(loss(x)):.5f}  "
                  f"rmse vs truth {err:.4f}")

    final = float(jnp.sqrt(jnp.mean((x - truth) ** 2)))
    base = float(jnp.sqrt(jnp.mean(truth ** 2)))
    print(f"reconstruction rmse {final:.4f} (signal rms {base:.4f}) — "
          f"recovered from a {y.shape[0]}x{y.shape[1]} rotated "
          f"area-average measurement")


if __name__ == "__main__":
    main()
