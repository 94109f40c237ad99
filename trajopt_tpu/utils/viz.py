"""Solver debug observability — the reference's plotting surface, time-leading.

Mirrors: ``MBGPS.plot`` / ``plot_distributions`` (gps/mbgps.py:203-224 — state and
action marginals with ±2σ bands), ``MatrixNormalParameters.plot``
(rgps/objects.py:63-75 — per-parameter Gaussian marginals at a timestep), and the
RGPS dual-landscape debugger (``plot_dual``, rgps/mfrgps.py:704-736).

All functions take ``show=True`` and return the matplotlib figure so they work in
scripts (blocking show, like the reference) and notebooks/tests (inspect the
figure, no display).  matplotlib is imported lazily — the library has no hard
dependency on it.
"""

from __future__ import annotations

import numpy as np


def plot_gaussian_trajectory(xdist, udist=None, axs=None, show: bool = True):
    """State (and optionally action) marginal trajectories with ±2σ bands —
    gps/mbgps.py:203-224 with the time axis leading (``mu (T+1, d)``,
    ``sigma (T+1, d, d)``)."""
    import matplotlib.pyplot as plt

    mu_x = np.asarray(xdist.mu)
    sig_x = np.asarray(xdist.sigma)
    dm_state = mu_x.shape[-1]
    dm_act = 0 if udist is None else np.asarray(udist.mu).shape[-1]

    n = dm_state + dm_act
    if axs is None:
        fig, axs = plt.subplots(n, 1, figsize=(8, 1.8 * n), sharex=True)
        axs = np.atleast_1d(axs)
    else:
        fig = axs[0].figure

    t = np.arange(mu_x.shape[0])
    for k in range(dm_state):
        sd = np.sqrt(np.maximum(sig_x[:, k, k], 0.0))
        axs[k].plot(t, mu_x[:, k], "-b")
        axs[k].fill_between(t, mu_x[:, k] - 2 * sd, mu_x[:, k] + 2 * sd,
                            color="blue", alpha=0.1)
        axs[k].set_ylabel(f"x[{k}]")

    if udist is not None:
        mu_u = np.asarray(udist.mu)
        sig_u = np.asarray(udist.sigma)
        tu = np.arange(mu_u.shape[0])
        for k in range(dm_act):
            ax = axs[dm_state + k]
            sd = np.sqrt(np.maximum(sig_u[:, k, k], 0.0))
            ax.plot(tu, mu_u[:, k], "-g")
            ax.fill_between(tu, mu_u[:, k] - 2 * sd, mu_u[:, k] + 2 * sd,
                            color="green", alpha=0.1)
            ax.set_ylabel(f"u[{k}]")

    axs[-1].set_xlabel("t")
    fig.tight_layout()
    if show:
        plt.show()
    return fig


def plot_matrixnormal_marginals(param, t: int, axs=None, color: str = "b",
                                show: bool = True):
    """Per-parameter Gaussian marginals of a ``MatrixNormalParams`` sequence at
    timestep ``t`` — rgps/objects.py:63-75.  ``param.mu (T, p)``,
    ``param.sigma (T, p, p)`` (time leading)."""
    import matplotlib.pyplot as plt

    mu = np.asarray(param.mu)[t]
    sigma = np.asarray(param.sigma)[t]
    p = mu.shape[0]

    if axs is None:
        fig, axs = plt.subplots(p, 1, figsize=(8, 1.2 * p))
        axs = np.atleast_1d(axs)
    else:
        fig = axs[0].figure

    for k, ax in enumerate(axs[:p]):
        m, v = mu[k], max(float(sigma[k, k]), 1e-30)
        sd = np.sqrt(v)
        xs = np.linspace(m - 4 * sd, m + 4 * sd, 201)
        pdf = np.exp(-0.5 * ((xs - m) / sd) ** 2) / (sd * np.sqrt(2 * np.pi))
        ax.plot(xs, pdf, color=color)
        ax.axvline(m, color=color, ls="--", lw=0.8)
        ax.set_ylabel(f"θ[{k}]")

    fig.tight_layout()
    if show:
        plt.show()
    return fig


def plot_dual_landscape(dual_fun, opt=None, elow: float = 0.0, ehigh: float = 8.0,
                        num: int = 50, logax: bool = True, show: bool = True):
    """1-D dual landscape debugger — rgps/mfrgps.py:704-736.

    ``dual_fun(alpha) -> scalar`` is evaluated over a (log-spaced) grid; the
    optional ``opt`` marks the optimizer's chosen dual value."""
    import matplotlib.pyplot as plt

    xs = (np.logspace(elow, ehigh, num) if logax
          else np.linspace(elow, ehigh, num))
    ys = np.array([float(dual_fun(x)) for x in xs])

    fig, ax = plt.subplots()
    if logax:
        ax.set_xscale("log")
    ax.plot(xs, ys, "-b")
    if opt is not None:
        ax.axvline(float(opt), color="r", ls="--", label="optimum")
        ax.legend()
    ax.set_xlabel("dual variable")
    ax.set_ylabel("dual value")
    fig.tight_layout()
    if show:
        plt.show()
    return fig


def plot_reference_trajectory(xref, uref, show: bool = True):
    """Deterministic reference-trajectory plot — ilqr/ilqr.py:119-134 /
    riccati/riccati.py:128 / elqr/elqr.py:162, time leading."""
    import matplotlib.pyplot as plt

    xref = np.asarray(xref)
    uref = np.asarray(uref)
    dm_state, dm_act = xref.shape[-1], uref.shape[-1]
    n = dm_state + dm_act
    fig, axs = plt.subplots(n, 1, figsize=(8, 1.8 * n), sharex=True)
    axs = np.atleast_1d(axs)

    for k in range(dm_state):
        axs[k].plot(np.arange(xref.shape[0]), xref[:, k], "-b")
        axs[k].set_ylabel(f"x[{k}]")
    for k in range(dm_act):
        axs[dm_state + k].plot(np.arange(uref.shape[0]), uref[:, k], "-g")
        axs[dm_state + k].set_ylabel(f"u[{k}]")

    axs[-1].set_xlabel("t")
    fig.tight_layout()
    if show:
        plt.show()
    return fig


def plot_belief_trajectory(bref_mu, bref_sigma, uref, show: bool = True):
    """Belief-mean trajectory with ±2σ bands plus actions —
    bspilqr/bspilqr.py:106-125, time leading."""
    import matplotlib.pyplot as plt

    mu = np.asarray(bref_mu)
    sig = np.asarray(bref_sigma)
    uref = np.asarray(uref)
    db, da = mu.shape[-1], uref.shape[-1]
    n = db + da
    fig, axs = plt.subplots(n, 1, figsize=(8, 1.8 * n), sharex=True)
    axs = np.atleast_1d(axs)

    t = np.arange(mu.shape[0])
    for k in range(db):
        sd = np.sqrt(np.maximum(sig[:, k, k], 0.0))
        axs[k].plot(t, mu[:, k], "-b")
        axs[k].fill_between(t, mu[:, k] - 2 * sd, mu[:, k] + 2 * sd,
                            color="blue", alpha=0.1)
        axs[k].set_ylabel(f"b[{k}]")
    for k in range(da):
        axs[db + k].plot(np.arange(uref.shape[0]), uref[:, k], "-g")
        axs[db + k].set_ylabel(f"u[{k}]")

    axs[-1].set_xlabel("t")
    fig.tight_layout()
    if show:
        plt.show()
    return fig


def plot_rollout_data(data, show: bool = True):
    """Sampled-rollout spaghetti plot — mfgps.py:213-226 / mfrgps.py:493
    (episodes overlaid per state/action coordinate; time leading:
    ``data['x'] (E, T, dx)``, ``data['u'] (E, T, du)``)."""
    import matplotlib.pyplot as plt

    x = np.asarray(data["x"])
    u = np.asarray(data["u"])
    dm_state, dm_act = x.shape[-1], u.shape[-1]
    n = dm_state + dm_act
    fig, axs = plt.subplots(n, 1, figsize=(8, 1.8 * n), sharex=True)
    axs = np.atleast_1d(axs)
    for k in range(dm_state):
        axs[k].plot(x[..., k].T, lw=0.6)
        axs[k].set_ylabel(f"x[{k}]")
    for k in range(dm_act):
        axs[dm_state + k].plot(u[..., k].T, lw=0.6)
        axs[dm_state + k].set_ylabel(f"u[{k}]")
    axs[-1].set_xlabel("t")
    fig.tight_layout()
    if show:
        plt.show()
    return fig
