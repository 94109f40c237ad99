"""Cartpole and double-cartpole swing-up environments
(envs/cartpole/cartpole.py, envs/double_cartpole/double_cartpole.py)."""

from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp
from jax import Array

from .base import TrajEnv, register, wrap_angle

_INF = float("inf")


@dataclass(frozen=True)
class Cartpole(TrajEnv):
    """Cart-pole, Florian's equations (cartpole.py:62-97); state (x, θ, ẋ, θ̇)."""

    dt: float = 0.01
    dm_state: int = 4
    dm_act: int = 1

    g: tuple = (0.0, 0.0, 0.0, 0.0)
    gw: tuple = (1e1, 1e4, 1e0, 1e0)
    uw: tuple = (1e-5,)
    umax: tuple = (10.0,)
    xmax: tuple = (10.0, _INF, _INF, _INF)
    x0: tuple = (0.0, 3.141592653589793, 0.0, 0.0)

    sigma_scale: float = 1e-8
    sigma0_scale: float = 1e-4

    slew_rate: bool = False
    periodic: bool = False

    @property
    def sigma(self):
        return self.sigma_scale * jnp.eye(self.dm_state)

    @property
    def sigma0(self):
        return self.sigma0_scale * jnp.eye(self.dm_state)

    def _ode_parts(self, x, u) -> tuple:
        g = 9.81
        Mc, Mp = 0.37, 0.127
        Mt = Mc + Mp
        l = 0.3365
        fr = 0.005

        _, th, dq, dth = x[0], x[1], x[2], x[3]
        f = u[0]

        sth, cth = jnp.sin(th), jnp.cos(th)
        num = g * sth + cth * (-(f - fr * dq) - Mp * l * dth**2 * sth) / Mt
        denom = l * (4.0 / 3.0 - Mp * cth**2 / Mt)
        ddth = num / denom
        ddx = (f + Mp * l * (dth**2 * sth - ddth * cth)) / Mt
        return (dq, dth, ddx, ddth)

    def _periodic_parts(self, x) -> tuple:
        if self.periodic:
            return (x[0], wrap_angle(x[1]), x[2], x[3])
        return (x[0], x[1], x[2], x[3])

    def _periodic_state(self, x: Array) -> Array:
        if self.periodic:
            return jnp.stack(self._periodic_parts(x))
        return x


@dataclass(frozen=True)
class CartpoleWithCartesianCost(Cartpole):
    """Cartesian feature variant (cartpole.py:150-166)."""

    g: tuple = (0.0, 1.0, 0.0, 0.0, 0.0)
    gw: tuple = (1e1, 1e4, 1e4, 1e0, 1e0)

    def features_parts(self, x) -> tuple:
        return (x[0], jnp.cos(x[1]), jnp.sin(x[1]), x[2], x[3])

    def features(self, x: Array) -> Array:
        return jnp.stack(self.features_parts(x))


@dataclass(frozen=True)
class DoubleCartpole(TrajEnv):
    """Cart with two serial poles (double_cartpole.py:61-155); state
    (x, θ1, θ2, ẋ, θ̇1, θ̇2)."""

    dt: float = 0.01
    dm_state: int = 6
    dm_act: int = 1

    g: tuple = (0.0,) * 6
    gw: tuple = (1e1, 1e4, 1e4, 1e0, 1e0, 1e0)
    uw: tuple = (1e-5,)
    umax: tuple = (5.0,)
    xmax: tuple = (10.0, _INF, _INF, _INF, _INF, _INF)
    x0: tuple = (0.0, 3.141592653589793, 3.141592653589793, 0.0, 0.0, 0.0)

    sigma_scale: float = 1e-8
    sigma0_scale: float = 1e-4

    slew_rate: bool = False
    periodic: bool = False

    @property
    def sigma(self):
        return self.sigma_scale * jnp.eye(self.dm_state)

    @property
    def sigma0(self):
        return self.sigma0_scale * jnp.eye(self.dm_state)

    def _ode_parts(self, x, u) -> tuple:
        """Component-wise manipulator equations with a closed-form symmetric
        3×3 solve in place of ``jnp.linalg.solve`` — tile-eligible and
        identical math (double_cartpole.py:61-155)."""
        g = 9.81
        Mc, Mp1, Mp2 = 0.37, 0.127, 0.127
        Mt = Mc + Mp1 + Mp2
        L1 = L2 = 0.3365
        l1, l2 = L1 / 2.0, L2 / 2.0
        J1 = Mp1 * L1 / 12.0
        J2 = Mp2 * L2 / 12.0

        th1, th2 = x[1], x[2]
        dq, dth1, dth2 = x[3], x[4], x[5]

        s1, c1 = jnp.sin(th1), jnp.cos(th1)
        s2, c2 = jnp.sin(th2), jnp.cos(th2)
        sdth = jnp.sin(th1 - th2)
        cdth = jnp.cos(th1 - th2)

        l1_mp1_mp2 = Mp1 * l1 + Mp2 * L2
        Mp2_l2 = Mp2 * l2
        l1_l2_Mp2 = L1 * l2 * Mp2

        # symmetric mass matrix entries
        m00 = Mt + 0.0 * c1  # broadcast to tile shape
        m01 = l1_mp1_mp2 * c1
        m02 = Mp2_l2 * c2
        m11 = l1**2 * Mp1 + L1**2 * Mp2 + J1 + 0.0 * c1
        m12 = l1_l2_Mp2 * cdth
        m22 = l2**2 * Mp2 + J2 + 0.0 * c1

        # rhs = action − C q̇ − G
        b0 = u[0] - (-l1_mp1_mp2 * dth1 * s1 * dth1 - Mp2_l2 * dth2 * s2 * dth2)
        b1 = -(l1_l2_Mp2 * dth2 * sdth * dth2) + (Mp1 * l1 + Mp2 * L1) * g * s1
        b2 = -(-l1_l2_Mp2 * dth1 * sdth * dth1) + Mp2 * l2 * g * s2

        # adjugate solve of the symmetric 3×3 system
        a00 = m11 * m22 - m12 * m12
        a01 = m02 * m12 - m01 * m22
        a02 = m01 * m12 - m02 * m11
        a11 = m00 * m22 - m02 * m02
        a12 = m01 * m02 - m00 * m12
        a22 = m00 * m11 - m01 * m01
        det = m00 * a00 + m01 * a01 + m02 * a02
        dd0 = (a00 * b0 + a01 * b1 + a02 * b2) / det
        dd1 = (a01 * b0 + a11 * b1 + a12 * b2) / det
        dd2 = (a02 * b0 + a12 * b1 + a22 * b2) / det
        return (dq, dth1, dth2, dd0, dd1, dd2)

    def _periodic_parts(self, x) -> tuple:
        if self.periodic:
            return (x[0], wrap_angle(x[1]), wrap_angle(x[2]), x[3], x[4], x[5])
        return tuple(x[i] for i in range(6))

    def _periodic_state(self, x: Array) -> Array:
        if self.periodic:
            return jnp.stack(
                [x[0], wrap_angle(x[1]), wrap_angle(x[2]), x[3], x[4], x[5]]
            )
        return x


@dataclass(frozen=True)
class DoubleCartpoleWithCartesianCost(DoubleCartpole):
    """Cartesian feature variant (double_cartpole.py:210-230).

    NOTE: the reference's feature map indexes (x[0], cos/sin x[0], cos/sin x[1],
    x[2:5]) — i.e. it takes the *cart position* as the first angle and drops θ̇2
    (double_cartpole.py:226-230), while its goal/weights (8-dim) describe
    (x, cs1, sn1, cs2, sn2, dx, dth1, dth2).  We implement the intended map over
    (θ1, θ2) with all velocities."""

    g: tuple = (0.0, 1.0, 0.0, 1.0, 0.0, 0.0, 0.0, 0.0)
    gw: tuple = (1e1, 1e4, 1e4, 1e4, 1e4, 1e0, 1e0, 1e0)

    def features_parts(self, x) -> tuple:
        return (x[0], jnp.cos(x[1]), jnp.sin(x[1]), jnp.cos(x[2]),
                jnp.sin(x[2]), x[3], x[4], x[5])

    def features(self, x: Array) -> Array:
        return jnp.stack(
            [x[0], jnp.cos(x[1]), jnp.sin(x[1]), jnp.cos(x[2]), jnp.sin(x[2]),
             x[3], x[4], x[5]]
        )


register("Cartpole-TO-v0", Cartpole)
register("Cartpole-TO-v1", CartpoleWithCartesianCost)
register("DoubleCartpole-TO-v0", DoubleCartpole)
register("DoubleCartpole-TO-v1", DoubleCartpoleWithCartesianCost)
