"""Split-Bregman total-variation denoising (C7).

The reference's optional mask-denoise mode (``mrc.py:90-108``) delegates
to ``skimage.restoration.denoise_tv_bregman``; skimage is not available
on the target cluster, so this is a from-scratch NumPy implementation of
the public algorithm (Goldstein & Osher, "The Split Bregman Method for
L1-Regularized Problems", SIAM J. Imaging Sci. 2(2), 2009): minimize
``|grad u| + (lambda/2) ||u - f||^2`` with ``lambda = 2 * weight``
(skimage's parameter convention), alternating a Jacobi-relaxed u-solve,
an isotropic joint shrink of the split gradient, and the Bregman update.

Bit-parity with skimage is *not* claimed (different inner solver and
stopping schedule — unverifiable in-sandbox, same standing as the A5
noise-sigma estimate); the mask gate only consumes ``u > 0.4`` on a
binary input, which is robust to solver differences, and the property
tests pin the observable contract (speckle removal, structure
preservation, energy descent).
"""

from __future__ import annotations

import numpy as np

__all__ = ["denoise_tv_bregman", "denoise_mask_bregman"]


def _grad(u):
    """Forward differences with Neumann (replicate) boundary."""
    gx = np.zeros_like(u)
    gy = np.zeros_like(u)
    gx[:, :-1] = u[:, 1:] - u[:, :-1]
    gy[:-1, :] = u[1:, :] - u[:-1, :]
    return gx, gy


def _div(px, py):
    """Negative adjoint of ``_grad``: backward-difference divergence
    whose boundary rows mirror the gradient's (the last gradient
    component is identically zero, so the last field column/row must not
    contribute) — verified by the <grad u, v> == -<u, div v> identity in
    the tests."""
    out = np.zeros_like(px)
    out[:, 0] += px[:, 0]
    out[:, 1:-1] += px[:, 1:-1] - px[:, :-2]
    out[:, -1] -= px[:, -2]
    out[0, :] += py[0, :]
    out[1:-1, :] += py[1:-1, :] - py[:-2, :]
    out[-1, :] -= py[-2, :]
    return out


def denoise_tv_bregman(image: np.ndarray, weight: float = 1.0,
                       max_iter: int = 100, eps: float = 1e-3,
                       gamma: float = 2.0, inner_sweeps: int = 5
                       ) -> np.ndarray:
    """TV-denoise a 2-D array; returns float64 of the same shape.

    ``weight``: fidelity weight (skimage convention, lambda = 2*weight —
    smaller weight denoises more).  ``gamma``: the splitting penalty
    (affects convergence speed only, not the minimizer).
    ``inner_sweeps``: Jacobi sweeps per outer Bregman iteration — a
    single sweep under-solves the u-subproblem and the Bregman updates
    then amplify the residual (measured divergent); 5 sweeps track the
    exact solve closely.
    """
    f = np.asarray(image, dtype=np.float64)
    lam = 2.0 * float(weight)
    u = f.copy()
    dx = np.zeros_like(f)
    dy = np.zeros_like(f)
    bx = np.zeros_like(f)
    by = np.zeros_like(f)

    denom = lam + 4.0 * gamma
    for _ in range(max_iter):
        u_prev = u
        # u-subproblem: Jacobi sweeps of
        #   (lam + 4*gamma) u = lam f + gamma (neighbor sum - div(d - b))
        # (the Euler-Lagrange of the augmented objective: lam(u - f)
        #  - gamma*laplace(u) + gamma*div(d - b) = 0)
        rhs_field = _div(bx - dx, by - dy)
        for _s in range(inner_sweeps):
            pad = np.pad(u, 1, mode="edge")
            neighbors = (pad[:-2, 1:-1] + pad[2:, 1:-1]
                         + pad[1:-1, :-2] + pad[1:-1, 2:])
            u = (lam * f + gamma * (neighbors + rhs_field)) / denom

        # d-subproblem: isotropic joint shrink of (grad u + b)
        gx, gy = _grad(u)
        tx, ty = gx + bx, gy + by
        mag = np.sqrt(tx * tx + ty * ty)
        scale = np.maximum(mag - 1.0 / gamma, 0.0) / np.maximum(mag, 1e-12)
        dx, dy = tx * scale, ty * scale

        # Bregman update
        bx, by = tx - dx, ty - dy

        change = np.abs(u - u_prev).sum()
        norm = np.abs(u).sum()
        if norm > 0 and change / norm < eps:
            break
    return u


def denoise_mask_bregman(mask: np.ndarray, weight: float = 1.0,
                         thresh: float = 0.4) -> np.ndarray:
    """The reference's binary-mask contract (``mrc.py:90-108``): float
    cast, TV denoise at ``weight``, re-binarize at ``thresh``."""
    u = denoise_tv_bregman(np.asarray(mask, dtype=np.float32), weight=weight)
    return u > thresh
