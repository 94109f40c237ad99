"""Pure-function environment protocol and registry.

The reference wraps every system in a ``gym.Env`` with autograd-differentiable
``dynamics/cost/noise`` methods plus stateful ``step/reset`` (e.g.
envs/pendulum/pendulum.py:15-149).  Here an environment is an immutable dataclass of
parameters whose methods are **pure jittable functions** — state and randomness are
explicit, so whole rollouts compile into single ``lax.scan`` programs and batch/shard
cleanly.

Protocol (mirrors the reference env surface, SURVEY.md §2.2):

* ``dynamics(x, u) -> xn``            — deterministic, action/state clipped.
* ``cost(x, u, u_last, a) -> scalar`` — activation-weighted, optional slew-rate.
* ``noise(x, u) -> (dx, dx)``         — process-noise covariance.
* ``init() -> (x0, sigma0)``          — initial state distribution.
* ``sample_init(key) / step(key, x, u)`` — explicit-randomness analogues of
  gym ``reset``/``step``.

Belief-space environments additionally provide ``observe``, ``dyn_noise``,
``obs_noise`` and a belief cost (lightdark.py:62-79).  Adversarial LQR variants
provide ``evolve`` (lqr_v1.py:95-103).
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass
from typing import Callable

import jax
import jax.numpy as jnp
from jax import Array


def wrap_angle(x: Array) -> Array:
    """Wrap angle to [-π, π) (envs/pendulum/pendulum.py:10-12)."""
    return ((x + jnp.pi) % (2.0 * jnp.pi)) - jnp.pi


def rk4(f: Callable, x: Array, u: Array, dt: float) -> Array:
    """Classic RK4 step used by every analytic env (pendulum.py:68-73)."""
    k1 = f(x, u)
    k2 = f(x + 0.5 * dt * k1, u)
    k3 = f(x + 0.5 * dt * k2, u)
    k4 = f(x + dt * k3, u)
    return x + dt / 6.0 * (k1 + 2.0 * k2 + 2.0 * k3 + k4)


def rk4_backward(f: Callable, x: Array, u: Array, dt: float) -> Array:
    """Backward-sign RK4 used by ``inverse_dynamics`` (pendulum.py:78-96) and by the
    Robot env's forward dynamics (robot.py:51-70)."""
    k1 = f(x, u)
    k2 = f(x - 0.5 * dt * k1, u)
    k3 = f(x - 0.5 * dt * k2, u)
    k4 = f(x - dt * k3, u)
    return x - dt / 6.0 * (k1 + 2.0 * k2 + 2.0 * k3 + k4)


@dataclass(frozen=True)
class TrajEnv:
    """Base fully-observed environment. Subclasses define ``_ode`` or ``dynamics``."""

    dt: float
    dm_state: int
    dm_act: int

    def replace(self, **kwargs) -> "TrajEnv":
        return dataclasses.replace(self, **kwargs)

    # -- limits ------------------------------------------------------------------
    @property
    def xlim(self) -> Array:
        return jnp.asarray(self.xmax)

    @property
    def ulim(self) -> Array:
        return jnp.asarray(self.umax)

    def clip_act(self, u: Array) -> Array:
        return jnp.clip(u, -self.ulim, self.ulim)

    def clip_state(self, x: Array) -> Array:
        return jnp.clip(x, -self.xlim, self.xlim)

    # -- tile-level protocol (component-wise physics) ------------------------------
    # Envs that define ``_ode_parts(x, u) -> tuple`` (indexing x[i]/u[j] and
    # returning per-component derivatives) get two things for free: the stacked
    # ``_ode`` below, and eligibility for the lane-major Pallas rollout kernel
    # (core/pallas_rollout.py), which calls ``_ode_parts`` with *lists of
    # (sublane, lane) tiles* — each component one fully-occupied VPU tile.
    def _ode_parts(self, x, u) -> tuple:
        raise NotImplementedError(
            f"{type(self).__name__} does not define component-wise dynamics"
        )

    def _ode(self, x: Array, u: Array) -> Array:
        return jnp.stack(self._ode_parts(x, u))

    def _periodic_parts(self, x) -> tuple:
        """Component-wise ``_periodic_state`` (identity unless periodic)."""
        if getattr(self, "periodic", False):
            raise NotImplementedError(
                f"{type(self).__name__} is periodic but defines no _periodic_parts"
            )
        return tuple(x[i] for i in range(self.dm_state))

    def features_parts(self, x) -> tuple:
        """Component-wise ``features`` (identity by default)."""
        return tuple(x[i] for i in range(self.dm_state))

    # Envs whose ``dynamics`` integrates with backward RK4 signs (Robot,
    # robot.py:62-67) set this class attribute so the tile kernels pick the
    # matching integrator.  Plain class attr, not a dataclass field.
    rk4_backward_integration = False

    def cost_parts(self, x, u, u_last, w):
        """``cost`` on tiles — only needed by envs that override ``cost``
        away from the standard uᵀdiag(uw)u/slew + w·feature-goal form (the
        tile kernels evaluate that form directly otherwise)."""
        raise NotImplementedError(
            f"{type(self).__name__} does not define a tile-level cost"
        )

    @property
    def supports_tiles(self) -> bool:
        """True when the env opts into the tile-level protocol.

        Defining ``_ode_parts`` is the opt-in, but the tile kernels also
        consume ``features_parts``/``_periodic_parts`` (identity by default)
        and the standard cost form — an env that overrides ``features``/
        ``_periodic_state``/``cost`` without the matching parts form would
        silently cost trajectories wrongly, so such envs are NOT
        tile-eligible."""
        cls = type(self)
        if cls._ode_parts is TrajEnv._ode_parts:
            return False
        if (cls.features is not TrajEnv.features
                and cls.features_parts is TrajEnv.features_parts):
            return False
        if (cls._periodic_state is not TrajEnv._periodic_state
                and cls._periodic_parts is TrajEnv._periodic_parts):
            return False
        if (cls.cost is not TrajEnv.cost
                and cls.cost_parts is TrajEnv.cost_parts):
            return False
        return True

    @property
    def supports_tile_quadratization(self) -> bool:
        """True when the closed-form eLQR cost quadratization applies: tile
        protocol + the base detached-feature-Jacobian cost (a ``cost_parts``
        twin is enough for rollouts, but the in-kernel eLQR quadratizer
        hardcodes the base cost structure)."""
        return self.supports_tiles and type(self).cost is TrajEnv.cost

    # -- core protocol -----------------------------------------------------------
    def dynamics(self, x: Array, u: Array) -> Array:
        u = self.clip_act(u)
        return self.clip_state(rk4(self._ode, x, u, self.dt))

    def inverse_dynamics(self, x: Array, u: Array) -> Array:
        u = self.clip_act(u)
        return self.clip_state(rk4_backward(self._ode, x, u, self.dt))

    def noise(self, x: Array | None = None, u: Array | None = None) -> Array:
        return jnp.asarray(self.sigma)

    def features(self, x: Array) -> Array:
        return x

    def _feature_goal_cost(self, x: Array, a) -> Array:
        """Goal cost through the detached-Jacobian feature linearization.

        Replicates the ``getval``-based pattern (pendulum.py:121-123): the feature map
        is linearized around stop_gradient(y), so cost curvature comes only from the
        quadratic form, not from feature curvature.
        """
        y = self._periodic_state(x)
        y0 = jax.lax.stop_gradient(y)
        J = jax.jacfwd(self.features)(y0)
        z = J @ y + (self.features(y0) - J @ y0)
        g = jnp.asarray(self.g)
        gw = jnp.asarray(self.gw)
        return a * (z - g) @ jnp.diag(gw) @ (z - g)

    def _periodic_state(self, x: Array) -> Array:
        return x

    def cost(self, x: Array, u: Array, u_last: Array, a) -> Array:
        uw = jnp.asarray(self.uw)
        if self.slew_rate:
            c = (u - u_last) @ jnp.diag(uw) @ (u - u_last)
        else:
            c = u @ jnp.diag(uw) @ u
        return c + self._feature_goal_cost(x, a)

    # -- stochastic interface ------------------------------------------------------
    def init(self) -> tuple[Array, Array]:
        return jnp.asarray(self.x0), jnp.asarray(self.sigma0)

    def sample_init(self, key: Array) -> Array:
        x0, sigma0 = self.init()
        return jax.random.multivariate_normal(key, x0, sigma0)

    def step(self, key: Array, x: Array, u: Array) -> Array:
        """Noisy step: dynamics + Gaussian process noise (pendulum.py:131-138)."""
        sig = self.noise(x, u)
        xn = self.dynamics(x, u)
        return jax.random.multivariate_normal(key, xn, sig)


@dataclass(frozen=True)
class BeliefEnv:
    """Base partially-observed environment (lightdark.py, car.py)."""

    dt: float
    state_dim: int
    belief_dim: int
    obs_dim: int
    act_dim: int

    def replace(self, **kwargs) -> "BeliefEnv":
        return dataclasses.replace(self, **kwargs)

    @property
    def xlim(self) -> Array:
        return jnp.asarray(self.xmax)

    @property
    def ulim(self) -> Array:
        return jnp.asarray(self.umax)

    def clip_act(self, u: Array) -> Array:
        return jnp.clip(u, -self.ulim, self.ulim)

    def dynamics(self, x: Array, u: Array) -> Array:
        u = self.clip_act(u)
        return jnp.clip(rk4(self._ode, x, u, self.dt), -self.xlim, self.xlim)

    def dyn_noise(self, x: Array | None = None, u: Array | None = None) -> Array:
        return jnp.asarray(self.dyn_sigma)

    def obs_noise(self, x: Array) -> Array:
        return jnp.asarray(self.obs_sigma)

    def observe(self, x: Array) -> Array:
        return x

    def step(self, key: Array, x: Array, u: Array) -> tuple[Array, Array]:
        """Noisy step returning (next state, noisy observation) — lightdark.py:85-100."""
        k1, k2 = jax.random.split(key)
        xn = jax.random.multivariate_normal(k1, self.dynamics(x, u), self.dyn_noise(x, u))
        obs = jax.random.multivariate_normal(k2, self.observe(xn), self.obs_noise(xn))
        return xn, obs

    # -- tile-level protocol (belief-space Pallas kernels) -------------------------
    # Mirrors TrajEnv's ``_ode_parts`` opt-in: every method below takes/returns
    # *lists of (sublane, lane) tiles* per component so the fused belief-MPC
    # kernel (core/pallas_bsp.py) can run physics, observation models and costs
    # as straight-line VPU code.  Parity with the array methods is pinned in
    # tests/test_pallas_bsp.py.

    def _ode_parts(self, x, u) -> tuple:
        raise NotImplementedError(
            f"{type(self).__name__} does not define component-wise dynamics"
        )

    def dynamics_parts(self, x, u):
        """``dynamics`` on tiles: clip action, RK4 over ``_ode_parts``, clip
        state (the BeliefEnv.dynamics default above).  Envs with closed-form
        dynamics (LightDark) override this directly."""
        dt = float(self.dt)
        u = [
            uj if float(self.umax[j]) == float("inf")
            else jnp.clip(uj, -float(self.umax[j]), float(self.umax[j]))
            for j, uj in enumerate(u)
        ]
        f = self._ode_parts
        n = len(x)
        k1 = f(x, u)
        k2 = f([x[i] + (0.5 * dt) * k1[i] for i in range(n)], u)
        k3 = f([x[i] + (0.5 * dt) * k2[i] for i in range(n)], u)
        k4 = f([x[i] + dt * k3[i] for i in range(n)], u)
        xn = [
            x[i] + (dt / 6.0) * (k1[i] + 2.0 * k2[i] + 2.0 * k3[i] + k4[i])
            for i in range(n)
        ]
        return [
            xi if float(self.xmax[i]) == float("inf")
            else jnp.clip(xi, -float(self.xmax[i]), float(self.xmax[i]))
            for i, xi in enumerate(xn)
        ]

    def observe_parts(self, x):
        """``observe`` on tiles (identity default)."""
        return [x[i] for i in range(self.obs_dim)]

    def dyn_noise_parts(self, x, u):
        """``dyn_noise`` on tiles — scaled-identity default built from the
        dataclass field (NOT the jnp property, which would be a tracer under
        jit); entries may be python floats, tile code broadcasts them."""
        s = float(self.dyn_sigma_scale)
        d = self.state_dim
        return [[s if i == j else 0.0 for j in range(d)] for i in range(d)]

    def obs_noise_parts(self, x):
        """``obs_noise`` on tiles — scaled-identity default; state-dependent
        envs (LightDark, Car) override."""
        s = float(self.obs_sigma_scale)
        d = self.obs_dim
        return [[s if i == j else 0.0 for j in range(d)] for i in range(d)]

    def belief_cost_parts(self, mu, sigma, u):
        """``cost`` on tiles: the quadratic belief cost shared by the reference
        belief envs, (μ−g)ᵀdiag(μw)(μ−g) + tr(diag(Σw)·Σ) + uᵀdiag(Rw)u
        (lightdark.py:76-79, car.py:95-99).  ``sigma`` is the row-major flat
        list of b·b tiles."""
        g = tuple(float(v) for v in self.goal)
        mw = tuple(float(v) for v in self.mu_w)
        sw = tuple(float(v) for v in self.sigma_w)
        aw = tuple(float(v) for v in self.act_w)
        b = self.belief_dim
        return (
            sum(mw[i] * (mu[i] - g[i]) ** 2 for i in range(b))
            + sum(sw[i] * sigma[i * b + i] for i in range(b))
            + sum(aw[j] * u[j] * u[j] for j in range(len(u)))
        )

    @property
    def supports_belief_tiles(self) -> bool:
        """True when the env opts into the belief tile protocol: tile dynamics
        exist, and every overridden array method has its parts twin."""
        cls = type(self)
        if (cls.dynamics_parts is BeliefEnv.dynamics_parts
                and cls._ode_parts is BeliefEnv._ode_parts):
            return False
        if (cls.observe is not BeliefEnv.observe
                and cls.observe_parts is BeliefEnv.observe_parts):
            return False
        if (cls.obs_noise is not BeliefEnv.obs_noise
                and cls.obs_noise_parts is BeliefEnv.obs_noise_parts):
            return False
        if (cls.dyn_noise is not BeliefEnv.dyn_noise
                and cls.dyn_noise_parts is BeliefEnv.dyn_noise_parts):
            return False
        return True


# ---------------------------------------------------------------------------------
# Registry — same ids as the reference (trajopt/__init__.py:3-97)
# ---------------------------------------------------------------------------------

_REGISTRY: dict[str, Callable[[], object]] = {}


def register(name: str, ctor: Callable[[], object]) -> None:
    _REGISTRY[name] = ctor


def make(name: str, **overrides):
    """Instantiate a registered environment, optionally overriding parameter fields
    (the analogue of the reference's ``env.unwrapped.attr = ...`` mutation pattern)."""
    if name not in _REGISTRY:
        raise KeyError(f"unknown env '{name}'; known: {sorted(_REGISTRY)}")
    env = _REGISTRY[name]()
    if overrides:
        env = dataclasses.replace(env, **overrides)
    return env


def registered() -> list[str]:
    return sorted(_REGISTRY)
