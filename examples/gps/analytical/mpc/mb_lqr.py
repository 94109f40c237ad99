"""MBGPS MPC on LQR (mirror of examples/gps/analytical/mpc/mb_lqr.py)."""
import sys, pathlib
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[4]))
from examples._common import setup

args = setup()
import jax, jax.numpy as jnp, numpy as np
import trajopt_tpu
from trajopt_tpu.solvers import MBGPS

env = trajopt_tpu.make("LQR-TO-v0")
horizon, nb_steps = 20, 50
key = jax.random.PRNGKey(0)
x = env.sample_init(key)
total = 0.0
for t in range(nb_steps):
    solver = MBGPS(env, nb_steps=horizon, init_state=(x, jnp.asarray(env.sigma)),
                   init_action_sigma=10.0, kl_bound=5.0)
    solver.run(nb_iter=5)
    u = solver.ctl.mean(x, 0)
    total += float(env.cost(x, u, u, 1.0))
    key, k = jax.random.split(key)
    x = env.step(k, x, u)
print(f"MPC LQR accumulated cost: {total:.2f}, final state {np.asarray(x)}")
