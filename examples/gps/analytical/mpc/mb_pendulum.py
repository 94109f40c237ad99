"""MBGPS receding-horizon MPC on the pendulum (mirror of
examples/gps/analytical/mpc/mb_pendulum.py: horizon 20, 100 control steps)."""
import sys, pathlib
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[4]))
from examples._common import setup, plot_trajectory

args = setup()
import jax, jax.numpy as jnp, numpy as np
import trajopt_tpu
from trajopt_tpu.solvers import MBGPS

env = trajopt_tpu.make("Pendulum-TO-v0", dt=0.05)
horizon, nb_steps = 20, 100
key = jax.random.PRNGKey(0)
x = env.sample_init(key)
sigma0 = env.init()[1]
states, actions = [np.asarray(x)], []
for t in range(nb_steps):
    solver = MBGPS(env, nb_steps=horizon, init_state=(x, sigma0),
                   init_action_sigma=1.0, kl_bound=2.0, action_penalty=1e-5)
    trace = solver.run(nb_iter=5)
    u = jnp.clip(solver.ctl.mean(x, 0), -env.ulim, env.ulim)
    key, k = jax.random.split(key)
    x = env.step(k, x, u)
    states.append(np.asarray(x)); actions.append(np.asarray(u))
    if t % 20 == 0:
        print(f"step {t}: cost-to-go {trace[-1]:.2f}, state {np.asarray(x)}")
print(f"final state: {states[-1]}")
plot_trajectory(args, np.stack(states), np.stack(actions))
