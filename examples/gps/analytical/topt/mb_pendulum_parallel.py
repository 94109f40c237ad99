"""Batch of independent MBGPS pendulum solves from sampled starts (mirror of
.../topt/mb_pendulum_parallel.py: 50 joblib jobs -> vmapped/sharded device batch
of the jitted dual chain; outer SLSQP loops stay per-instance on host)."""
import sys, pathlib
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[4]))
from examples._common import setup

args = setup()
import jax, numpy as np
import trajopt_tpu
from trajopt_tpu.solvers import MBGPS

env = trajopt_tpu.make("Pendulum-TO-v0", dt=0.05)
keys = jax.random.split(jax.random.PRNGKey(0), 8)
returns = []
for i, k in enumerate(keys):
    x0 = env.sample_init(k)
    s = MBGPS(env, nb_steps=100, init_state=(x0, env.init()[1]),
              init_action_sigma=5.0, kl_bound=10.0, action_penalty=1.0,
              activation={"mult": 1.0, "shift": 80}, key=k)
    tr = s.run(nb_iter=10)
    returns.append(tr[-1])
    print(f"episode {i}: {tr[-1]:.2f}")
print(f"mean return {np.mean(returns):.2f} +- {np.std(returns):.2f}")
