"""Sim(3) similarity transforms for loop closure.

Replaces g2o's Sim3 type (reference: Thirdparty/g2o/g2o/types/sim3.h,
types_seven_dof_expmap.h:48-130). A Sim3 element is stored explicitly as
``(R: (...,3,3), t: (...,3), s: (...,))`` acting as ``x -> s * R x + t``.
Tangent vectors are 7-dim ``[rho, phi, sigma]`` with sigma = log(s).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .se3 import hat, so3_exp, so3_log, _EPS, _P


class Sim3(NamedTuple):
    R: jax.Array  # (...,3,3)
    t: jax.Array  # (...,3)
    s: jax.Array  # (...,)

    def apply(self, pts: jax.Array) -> jax.Array:
        """Apply to points (...,N,3)."""
        return (
            self.s[..., None, None]
            * jnp.einsum("...ij,...nj->...ni", self.R, pts, precision=_P)
            + self.t[..., None, :]
        )

    def compose(self, other: "Sim3") -> "Sim3":
        """self o other (apply ``other`` first)."""
        return Sim3(
            R=self.R @ other.R,
            t=self.s[..., None]
            * jnp.einsum("...ij,...j->...i", self.R, other.t, precision=_P)
            + self.t,
            s=self.s * other.s,
        )

    def inverse(self) -> "Sim3":
        Rt = jnp.swapaxes(self.R, -1, -2)
        s_inv = 1.0 / self.s
        return Sim3(
            R=Rt,
            t=-s_inv[..., None] * jnp.einsum("...ij,...j->...i", Rt, self.t, precision=_P),
            s=s_inv,
        )

    @staticmethod
    def identity(batch=(), dtype=jnp.float32) -> "Sim3":
        return Sim3(
            R=jnp.broadcast_to(jnp.eye(3, dtype=dtype), batch + (3, 3)),
            t=jnp.zeros(batch + (3,), dtype),
            s=jnp.ones(batch, dtype),
        )

    @staticmethod
    def from_se3(T: jax.Array, s=None) -> "Sim3":
        scale = jnp.ones(T.shape[:-2], T.dtype) if s is None else s
        return Sim3(R=T[..., :3, :3], t=T[..., :3, 3], s=scale)


def sim3_exp(xi: jax.Array) -> Sim3:
    """Exp map (...,7) [rho, phi, sigma] -> Sim3.

    Uses the closed-form W matrix (Strasdat's thesis eq. on sim3 exp),
    series-expanded near small angles/scales for jit safety.
    """
    rho, phi, sigma = xi[..., :3], xi[..., 3:6], xi[..., 6]
    s = jnp.exp(sigma)
    R = so3_exp(phi)
    theta2 = jnp.sum(phi * phi, axis=-1)
    theta = jnp.sqrt(theta2 + _EPS * _EPS)
    K = hat(phi)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=xi.dtype), K.shape)

    sig2 = sigma * sigma
    small_sig = jnp.abs(sigma) < 1e-5
    small_th = theta < 1e-5

    # A = (s - 1)/sigma
    A = jnp.where(small_sig, 1.0 + sigma / 2.0 + sig2 / 6.0,
                  (s - 1.0) / jnp.where(small_sig, 1.0, sigma))
    denom = sig2 + theta2
    # B = (s*cos(th)... ) standard coefficients:
    #   C1 = (s*sin(th)*sigma + (1 - s*cos(th))*theta) / (theta*(sig^2+th^2))
    #   C2 = ... we build W = A*I + C1*K + C2*K^2 with care near zeros.
    s_cos = s * jnp.cos(theta)
    s_sin = s * jnp.sin(theta)
    C1 = jnp.where(
        small_th,
        # limit th->0: derivative-based series; for small theta W -> A*I + ...
        jnp.where(small_sig, 0.5, (sigma - 1.0 + s_cos) / jnp.where(small_sig, 1.0, denom)),
        (s_sin * sigma + (1.0 - s_cos) * theta)
        / jnp.where(small_th, 1.0, theta * denom),
    )
    C2_big = (
        A
        - ((s_cos - 1.0) * sigma + s_sin * theta) / jnp.where(small_th, 1.0, denom)
    ) / jnp.where(small_th, 1.0, theta2)
    C2 = jnp.where(small_th, jnp.where(small_sig, 1.0 / 6.0, (A - 1.0 - sigma * A + s - 1.0) / jnp.where(small_sig, 1.0, denom)), C2_big)

    W = (
        A[..., None, None] * eye
        + C1[..., None, None] * K
        + C2[..., None, None] * (K @ K)
    )
    t = jnp.einsum("...ij,...j->...i", W, rho, precision=_P)
    return Sim3(R=R, t=t, s=s)


def sim3_log(g: Sim3) -> jax.Array:
    """Numerically robust log via one Gauss-Newton refinement is overkill;
    we invert the exp's W matrix directly."""
    phi = so3_log(g.R)
    sigma = jnp.log(g.s)
    # Rebuild W from (phi, sigma) as in sim3_exp, then solve W rho = t.
    xi_rot = jnp.concatenate([jnp.zeros_like(phi), phi, sigma[..., None]], axis=-1)
    W = _sim3_W(xi_rot)
    rho = jnp.linalg.solve(W, g.t[..., None])[..., 0]
    return jnp.concatenate([rho, phi, sigma[..., None]], axis=-1)


def _sim3_W(xi: jax.Array) -> jax.Array:
    """The W matrix of sim3_exp for tangent ``xi`` (rho entries ignored).

    Reconstructed column-by-column by pushing basis vectors through the exp
    map: W @ e_i = exp([e_i, phi, sigma]).t.
    """
    e = jnp.eye(3, dtype=xi.dtype)
    cols = [sim3_exp(xi.at[..., :3].set(e[i])).t for i in range(3)]
    return jnp.stack(cols, axis=-1)
