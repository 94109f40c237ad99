"""Linear-quadratic benchmark environments (envs/lqr/lqr_v{0,1,2}.py).

LQRv1/LQRv2 additionally expose the adversarial ``evolve`` interface used by RGPS
(lqr_v1.py:54-72, 95-103): dynamics matrices are sampled from the adversary's
MatrixNormal over vec([A B c]) before stepping.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
from jax import Array

from ..core.types import matrices_from_vec
from .base import TrajEnv, register

_INF = float("inf")


@dataclass(frozen=True)
class _LinearEnv(TrajEnv):
    """Shared linear env machinery: x' = A x + B u + c, dt-scaled quadratic cost."""

    dt: float = 0.1
    dm_state: int = 2
    dm_act: int = 1

    x0: tuple = (5.0, 5.0)
    g: tuple = (10.0, 10.0)
    gw: tuple = (1e1, 1e1)
    uw: tuple = (1e0,)

    umax: tuple = (_INF,)
    xmax: tuple = (_INF, _INF)

    sigma_scale: float = 1e-8
    sigma0_scale: float = 1e-2

    slew_rate: bool = False

    @property
    def sigma(self):
        return self.sigma_scale * jnp.eye(self.dm_state)

    @property
    def sigma0(self):
        return self.sigma0_scale * jnp.eye(self.dm_state)

    # linear system matrices — overridden per variant
    def _ABc(self) -> tuple[Array, Array, Array]:
        raise NotImplementedError

    def dynamics(self, x: Array, u: Array, dist=None) -> Array:
        u = self.clip_act(u)
        A, B, c = self._ABc()
        return A @ x + B @ u + c

    def inverse_dynamics(self, x: Array, u: Array) -> Array:
        """Backward-RK4 of the *continuous-map interpretation* of the linear system,
        matching lqr_v0.py:68-82 (used by eLQR on LQR tasks)."""
        u = self.clip_act(u)

        def f(x, u):
            A, B, c = self._ABc()
            return A @ x + B @ u + c

        from .base import rk4_backward

        return jnp.clip(rk4_backward(f, x, u, self.dt), -self.xlim, self.xlim)

    def cost(self, x: Array, u: Array, u_last: Array, a) -> Array:
        c = u @ jnp.diag(jnp.asarray(self.uw)) @ u
        g = jnp.asarray(self.g)
        c = c + a * (x - g) @ jnp.diag(jnp.asarray(self.gw)) @ (x - g)
        return self.dt * c

    # adversarial interface (lqr_v1.py:54-72)
    def dynamics_dist(self, key: Array, x: Array, u: Array, mu: Array, sigma: Array):
        u = self.clip_act(u)
        params = jax.random.multivariate_normal(key, mu, sigma)
        A, B, c = matrices_from_vec(params, self.dm_state, self.dm_act)
        return A @ x + B @ u + c

    def evolve(self, key: Array, x: Array, u: Array, mu: Array, sigma: Array) -> Array:
        """Adversarial step: sample (A, B, c) ~ MN(mu, sigma), step, add noise
        (lqr_v1.py:95-103)."""
        k1, k2 = jax.random.split(key)
        xn = self.dynamics_dist(k1, x, u, mu, sigma)
        return jax.random.multivariate_normal(k2, xn, self.noise(x, u))


@dataclass(frozen=True)
class LQRv0(_LinearEnv):
    """Goal-shifted unstable double integrator (envs/lqr/lqr_v0.py:8-114)."""

    def _ABc(self):
        A = jnp.array([[1.1, 0.0], [1.0, 1.0]])
        B = jnp.array([[1.0], [0.0]])
        c = -A @ jnp.asarray(self.g)
        return A, B, c


@dataclass(frozen=True)
class LQRv1(_LinearEnv):
    """dt-discretized mass-spring-damper (envs/lqr/lqr_v1.py:8-109)."""

    dt: float = 0.01
    x0: tuple = (0.0, 0.0)
    g: tuple = (1.0, 0.0)
    gw: tuple = (1e2, 1e0)
    uw: tuple = (1e-3,)
    sigma0_scale: float = 1e-4

    def _ABc(self):
        m, k, d = 1.0, 1e-2, 1e-1
        A = jnp.array([[0.0, 1.0], [-k / m, -d / m]]) * self.dt + jnp.eye(2)
        B = jnp.array([[0.0], [1.0 / m]]) * self.dt
        c = jnp.zeros(2)
        return A, B, c


@dataclass(frozen=True)
class LQRv2(_LinearEnv):
    """Second (unstable) linear variant (envs/lqr/lqr_v2.py:8-106)."""

    dt: float = 0.01
    x0: tuple = (5.0, 5.0)
    g: tuple = (1.0, 0.0)
    gw: tuple = (1e1, 1e0)
    uw: tuple = (1e-3,)
    sigma0_scale: float = 1e-2

    def _ABc(self):
        A = jnp.array([[1.0, 0.0], [0.1, 1.1]])
        B = jnp.array([[0.05], [0.0]])
        c = jnp.zeros(2)
        return A, B, c


register("LQR-TO-v0", LQRv0)
register("LQR-TO-v1", LQRv1)
register("LQR-TO-v2", LQRv2)
