import jax
import jax.numpy as jnp
import numpy as np
import pytest

import trajopt_tpu
from trajopt_tpu.envs.nlink import _chain_energies, nlink_ode

ALL_ENVS = [
    "LQR-TO-v0", "LQR-TO-v1", "LQR-TO-v2",
    "Pendulum-TO-v0", "Pendulum-TO-v1",
    "DoublePendulum-TO-v0", "DoublePendulum-TO-v1",
    "QuadPendulum-TO-v0", "QuadPendulum-TO-v1",
    "Cartpole-TO-v0", "Cartpole-TO-v1",
    "DoubleCartpole-TO-v0", "DoubleCartpole-TO-v1",
    "Robot-TO-v0",
]
BELIEF_ENVS = ["LightDark-TO-v0", "Car-TO-v0"]


def test_registry_covers_reference_ids():
    """All 16 registered env ids of the reference (trajopt/__init__.py:3-97)."""
    assert set(ALL_ENVS + BELIEF_ENVS) <= set(trajopt_tpu.registered())
    assert len(ALL_ENVS + BELIEF_ENVS) == 16


@pytest.mark.parametrize("name", ALL_ENVS)
def test_env_protocol(name):
    env = trajopt_tpu.make(name)
    x0, sigma0 = env.init()
    assert x0.shape == (env.dm_state,)
    assert sigma0.shape == (env.dm_state, env.dm_state)

    u = 0.1 * jnp.ones(env.dm_act)
    xn = env.dynamics(x0, u)
    assert xn.shape == (env.dm_state,)
    assert np.all(np.isfinite(np.asarray(xn)))

    c = env.cost(x0, u, 0.0 * u, 1.0)
    assert np.isfinite(float(c))

    sig = env.noise(x0, u)
    assert sig.shape == (env.dm_state, env.dm_state)

    key = jax.random.PRNGKey(0)
    x = env.sample_init(key)
    x = env.step(key, x, u)
    assert np.all(np.isfinite(np.asarray(x)))

    # jit-compatibility of the full step
    xj = jax.jit(env.dynamics)(x0, u)
    np.testing.assert_allclose(np.asarray(xj), np.asarray(env.dynamics(x0, u)))


@pytest.mark.parametrize("name", BELIEF_ENVS)
def test_belief_env_protocol(name):
    env = trajopt_tpu.make(name)
    mu, sigma = env.init()
    assert mu.shape == (env.belief_dim,)

    u = 0.1 * jnp.ones(env.act_dim)
    xn = env.dynamics(mu, u)
    assert xn.shape == (env.state_dim,)

    z = env.observe(xn)
    assert z.shape == (env.obs_dim,)
    assert env.obs_noise(xn).shape == (env.obs_dim, env.obs_dim)

    c = env.cost(mu, sigma, u)
    assert np.isfinite(float(c))


def test_nlink_reduces_to_analytic_single_link():
    """A 1-link chain must reproduce the closed-form single-rod ODE under the
    multi-link convention of the reference (double_pendulum.py:67-72: COM inertia
    I = m(l²+1e-4)/3, COM at l/2):
    I_pivot = I + m·lcm², θ̈ = (u − k·θ̇ − g·m·lcm·sin(θ+π)) / I_pivot."""
    x = jnp.array([2.1, -0.7])
    u = jnp.array([0.4])

    ode_chain = nlink_ode(x, u, (1.0,), (1.0,), (1e-3,))

    g, m, l, k = 9.81, 1.0, 1.0, 1e-3
    lcm = l / 2.0
    I_pivot = m * (l**2 + 1e-4) / 3.0 + m * lcm**2
    dth = x[1]
    ddth = (u[0] - k * dth - g * m * lcm * jnp.sin(x[0] + jnp.pi)) / I_pivot
    np.testing.assert_allclose(float(ode_chain[0]), float(dth), rtol=1e-12)
    np.testing.assert_allclose(float(ode_chain[1]), float(ddth), rtol=1e-10)


def test_nlink_matches_standard_two_link_equations():
    """The autodiff chain must match the standard closed-form two-link manipulator
    equations (the same form as double_pendulum.py:74-116)."""
    masses = (1.0, 1.0)
    lengths = (1.0, 1.0)
    friction = (0.025, 0.025)
    g = 9.81

    x = jnp.array([2.7, -0.4, 0.9, 1.3])
    u = jnp.array([0.5, -0.2])

    got = nlink_ode(x, u, masses, lengths, friction)

    th1, th2, dth1, dth2 = (float(v) for v in x)
    th1 = th1 + np.pi
    u1, u2 = float(u[0]), float(u[1])
    m1, m2 = masses
    l1, l2 = lengths
    k1, k2 = friction
    I1 = m1 * (l1**2 + 1e-4) / 3.0
    I2 = m2 * (l2**2 + 1e-4) / 3.0
    l1cm, l2cm = l1 / 2.0, l2 / 2.0

    s1, c1 = np.sin(th1), np.cos(th1)
    s2, c2 = np.sin(th2), np.cos(th2)

    h11 = I1 + I2 + l1cm**2 * m1 + l1**2 * m2 + l2cm**2 * m2 + 2 * l1 * l2cm * m2 * c2
    h12 = I2 + l2cm**2 * m2 + l1 * l2cm * m2 * c2
    h22 = I2 + l2cm**2 * m2

    b1 = (
        g * l1cm * m1 * s1 + g * l1 * m2 * s1 + g * l2cm * m2 * c2 * s1
        - 2 * dth1 * dth2 * l1 * l2cm * m2 * s2 - dth2**2 * l1 * l2cm * m2 * s2
        + g * l2cm * m2 * c1 * s2
    )
    b2 = g * l2cm * m2 * c2 * s1 + dth1**2 * l1 * l2cm * m2 * s2 \
        + g * l2cm * m2 * c1 * s2

    t1 = u1 - k1 * dth1
    t2 = u2 - k2 * dth2
    det = h11 * h22 - h12 * h12
    ddth1 = (h22 * (t1 - b1) - h12 * (t2 - b2)) / det
    ddth2 = (h11 * (t2 - b2) - h12 * (t1 - b1)) / det

    np.testing.assert_allclose(np.asarray(got), [dth1, dth2, ddth1, ddth2], rtol=1e-9)


def test_nlink_matches_atkeson_four_link_closed_form():
    """nlink_ode(n=4) vs the transcribed Atkeson closed-form oracle
    (ref_impl.quad_pendulum_ode_np <- quad_pendulum.py:62-228) at random states —
    the fidelity check VERDICT r2 #5 asked for on the largest analytic env."""
    from ref_impl import quad_pendulum_ode_np

    masses = (1.0, 1.0, 1.0, 1.0)
    lengths = (1.0, 1.0, 1.0, 1.0)
    friction = (0.025, 0.025, 0.025, 0.025)

    rng = np.random.default_rng(7)
    for _ in range(10):
        x = jnp.asarray(rng.uniform(-3.0, 3.0, size=8))
        u = jnp.asarray(rng.uniform(-5.0, 5.0, size=4))
        got = np.asarray(nlink_ode(x, u, masses, lengths, friction))
        want = quad_pendulum_ode_np(np.asarray(x), np.asarray(u))
        np.testing.assert_allclose(got, want, rtol=1e-9, atol=1e-9)


@pytest.mark.parametrize("n", [2, 4])
def test_nlink_conserves_energy_without_friction(n):
    """Frictionless, unactuated chain conserves total energy under fine RK4."""
    masses = (1.0,) * n
    lengths = (1.0,) * n
    friction = (0.0,) * n

    q0 = jnp.asarray(np.linspace(2.5, 3.0, n))
    dq0 = jnp.zeros(n)
    x = jnp.concatenate([q0, dq0])
    u = jnp.zeros(n)

    def energy(x):
        T, V = _chain_energies(x[:n], x[n:], masses, lengths, 9.81)
        return float(T + V)

    e0 = energy(x)
    dt = 1e-3
    f = lambda x, u: nlink_ode(x, u, masses, lengths, friction)
    step = jax.jit(lambda x: x + dt / 6.0 * (
        f(x, u)
        + 2.0 * f(x + 0.5 * dt * f(x, u), u)
        + 2.0 * f(x + 0.5 * dt * f(x + 0.5 * dt * f(x, u), u), u)
        + f(x + dt * f(x + 0.5 * dt * f(x + 0.5 * dt * f(x, u), u), u), u)
    ))
    for _ in range(200):
        x = step(x)
    e1 = energy(x)
    np.testing.assert_allclose(e1, e0, rtol=1e-5, atol=1e-5)


@pytest.mark.slow
def test_ilqr_cartpole_swingup():
    """Cartpole swing-up via iLQR with Cartesian cost and terminal-weighted sigmoid
    activation (cost schedule of examples/gps/analytical/topt/mb_cartpole.py:20-26;
    BASELINE.json config family #3)."""
    from trajopt_tpu.solvers.ilqr import iLQR

    env = trajopt_tpu.make("Cartpole-TO-v1", dt=0.05)
    solver = iLQR(env, nb_steps=100, init_state=jnp.asarray(env.x0),
                  action_penalty=1e-5, activation={"mult": 1.0, "shift": 80})
    trace = solver.run(nb_iter=100)

    assert np.isfinite(trace[-1])
    assert trace[-1] < 0.3 * trace[0]
    th = float(solver.xref[-1, 1])
    wrapped = (th + np.pi) % (2 * np.pi) - np.pi
    assert abs(wrapped) < 0.3
