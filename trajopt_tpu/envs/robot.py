"""Kinematic bicycle 'robot' env (envs/robot/robot.py) — used by the RGPS examples.

Note the reference integrates this env with *backward* RK4 signs (robot.py:62-67);
replicated here via ``rk4_backward`` so trajectories match.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp
from jax import Array

from .base import TrajEnv, register, rk4_backward

_INF = float("inf")


@dataclass(frozen=True)
class Robot(TrajEnv):

    dt: float = 0.025
    dm_state: int = 4
    dm_act: int = 2

    length: float = 0.1

    x0: tuple = (5.0, 5.0, 0.0, 0.0)
    g: tuple = (0.0, 0.0, 0.0, 0.0)
    gw: tuple = (1e1, 1e1, 1.0, 1.0)
    uw: tuple = (1e-3, 1e-3)

    umax: tuple = (_INF, _INF)
    xmax: tuple = (_INF, _INF, _INF, _INF)

    sigma_scale: float = 1e-8
    sigma0_scale: float = 1e-4

    slew_rate: bool = False

    @property
    def sigma(self):
        return self.sigma_scale * jnp.eye(self.dm_state)

    @property
    def sigma0(self):
        return self.sigma0_scale * jnp.eye(self.dm_state)

    def _ode(self, x: Array, u: Array) -> Array:
        """State (x, y, θ, v), action (accel, steer) — robot.py:54-61."""
        return jnp.stack(
            [
                x[3] * jnp.cos(x[2]),
                x[3] * jnp.sin(x[2]),
                x[3] * jnp.tan(u[1]) / self.length,
                u[0],
            ]
        )

    def dynamics(self, x: Array, u: Array) -> Array:
        u = self.clip_act(u)
        return self.clip_state(rk4_backward(self._ode, x, u, self.dt))

    def cost(self, x: Array, u: Array, u_last: Array, a) -> Array:
        c = u @ jnp.diag(jnp.asarray(self.uw)) @ u
        g = jnp.asarray(self.g)
        c = c + a * (x - g) @ jnp.diag(jnp.asarray(self.gw)) @ (x - g)
        return self.dt * c

    # -- tile-level protocol ------------------------------------------------------
    rk4_backward_integration = True  # forward dynamics use backward RK4 signs

    def _ode_parts(self, x, u) -> tuple:
        L = float(self.length)
        return (
            x[3] * jnp.cos(x[2]),
            x[3] * jnp.sin(x[2]),
            x[3] * jnp.tan(u[1]) / L,
            u[0],
        )

    def cost_parts(self, x, u, u_last, w):
        """Tile twin of the dt-scaled robot cost above (robot.py:70-76)."""
        dt = float(self.dt)
        uw = tuple(float(v) for v in self.uw)
        g = tuple(float(v) for v in self.g)
        gw = tuple(float(v) for v in self.gw)
        c = sum(uw[j] * u[j] * u[j] for j in range(len(u)))
        c = c + w * sum(
            gw[i] * (x[i] - g[i]) ** 2 for i in range(len(x))
        )
        return dt * c


register("Robot-TO-v0", Robot)
