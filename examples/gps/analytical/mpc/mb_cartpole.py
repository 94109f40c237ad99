"""MBGPS MPC on the cartpole (mirror of examples/gps/analytical/mpc/mb_cartpole.py:
dt=0.05, umax=5, periodic wrap).

The whole receding-horizon loop compiles as one program
(parallel/gps.make_gps_mpc_runner) instead of re-instantiating the SLSQP-driven
host solver at every control step."""
import sys, pathlib
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[4]))
from examples._common import setup, plot_trajectory

args = setup()
import jax, jax.numpy as jnp, numpy as np
import trajopt_tpu
from trajopt_tpu.parallel.gps import make_gps_mpc_runner

env = trajopt_tpu.make("Cartpole-TO-v0", dt=0.05, umax=(5.0,), periodic=True)
run = jax.jit(make_gps_mpc_runner(env, horizon=20, nb_steps=100, nb_iter=5,
                                  init_action_sigma=1.0, kl_bound=2.0,
                                  action_penalty=1e-5))
xs, us, cs = run(jax.random.PRNGKey(0), env.sample_init(jax.random.PRNGKey(0)))
print(f"accumulated cost: {float(jnp.sum(cs)):.2f}, final theta: {float(xs[-1, 1]):.3f}")
plot_trajectory(args, np.asarray(xs), np.asarray(us))
