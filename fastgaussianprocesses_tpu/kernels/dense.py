"""Dense GP kernels: Gaussian and Matern 1/2, 3/2, 5/2, with derivative
kernels obtained by forward-mode autodiff.

The reference derives derivative kernels by a nested ``torch.autograd.grad``
construction over tiled leaf tensors (standard_gp.py:289-340); here each
derivative multi-index pair is a composition of ``jax.jacfwd`` over the two
arguments of the scalar kernel — no tiling, no graph surgery — then vmapped
over point pairs.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np

KERNEL_CLASSES = ("gaussian", "matern12", "matern32", "matern52")


def _base_formula(kind, sqdist_half):
    """Kernel value from sum_j (x_j - z_j)^2 / (2 l_j) (matches
    standard_gp.py:235-242,313-325)."""
    if kind == "gaussian":
        return jnp.exp(-sqdist_half)
    dist = jnp.sqrt(sqdist_half)
    if kind == "matern12":
        return jnp.exp(-dist)
    if kind == "matern32":
        return (1 + math.sqrt(3) * dist) * jnp.exp(-math.sqrt(3) * dist)
    if kind == "matern52":
        return (1 + math.sqrt(5) * dist + 5 * dist**2 / 3) * jnp.exp(-math.sqrt(5) * dist)
    raise ValueError(kind)


def dense_kernel(kind, x0, x1, beta0, beta1, c0, c1, scale, lengthscales):
    """Evaluate the (derivative-)kernel with broadcasting.

    Args:
        x0, x1: broadcastable (..., d) point arrays.
        beta0, beta1: (p0, d), (p1, d) static derivative multi-indices.
        c0, c1: (p0,), (p1,) coefficients.
        scale: (*pb, 1); lengthscales: (*pb, d) or (*pb, 1).

    Returns:
        (*pb_broadcast, ...) kernel values.
    """
    beta0 = np.asarray(beta0, dtype=np.int64)
    beta1 = np.asarray(beta1, dtype=np.int64)
    d = x0.shape[-1]
    no_derivs = (beta0 == 0).all() and (beta1 == 0).all()
    if no_derivs:
        nd = max(x0.ndim, x1.ndim)
        ls = lengthscales.reshape(lengthscales.shape[:-1] + (1,) * (nd - 1) + lengthscales.shape[-1:])
        sc = scale.reshape(scale.shape[:-1] + (1,) * (nd - 1))
        sqd = ((x0 - x1) ** 2 / (2 * ls)).sum(-1)
        val = sc * _base_formula(kind, sqd)
        coeff = float(np.sum(np.outer(np.asarray(c0), np.asarray(c1))))
        return coeff * val

    # derivative path: scalar-in-points function with parameter batch inside
    def base(x, z):
        ls = lengthscales  # (*pb, d or 1)
        sqd = ((x - z) ** 2 / (2 * ls)).sum(-1)
        return scale[..., 0] * _base_formula(kind, sqd)

    def deriv_fn(b0row, b1row):
        f = base
        for j in range(d):
            for _ in range(int(b0row[j])):
                f = (lambda g, jj: lambda x, z: jax.jacfwd(g, argnums=0)(x, z)[..., jj])(f, j)
        for j in range(d):
            for _ in range(int(b1row[j])):
                f = (lambda g, jj: lambda x, z: jax.jacfwd(g, argnums=1)(x, z)[..., jj])(f, j)
        return f

    shape = jnp.broadcast_shapes(x0.shape[:-1], x1.shape[:-1])
    x0b = jnp.broadcast_to(x0, shape + (d,)).reshape(-1, d)
    x1b = jnp.broadcast_to(x1, shape + (d,)).reshape(-1, d)
    total = None
    for i0 in range(len(beta0)):
        for i1 in range(len(beta1)):
            f = deriv_fn(beta0[i0], beta1[i1])
            vals = jax.vmap(f)(x0b, x1b)  # (P, *pb)
            term = float(c0[i0]) * float(c1[i1]) * vals
            total = term if total is None else total + term
    pb_ndim = total.ndim - 1
    total = jnp.moveaxis(total, 0, -1)  # (*pb, P)
    return total.reshape(total.shape[:-1] + shape) if pb_ndim else total.reshape(shape)
