"""Robust-vs-standard GPS ablation on the adversarial LQR env (mirror of
examples/rgps/mb_lqr.py:53-111): run LRGPS with and without the adversary and
compare expected costs under nominal and worst-case dynamics."""
import sys, pathlib
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[2]))
from examples._common import setup

args = setup()
import jax.numpy as jnp, numpy as np
import trajopt_tpu
from trajopt_tpu.solvers import LRGPS

env = trajopt_tpu.make("LQR-TO-v1", sigma_scale=1e-4)
kwargs = dict(nb_steps=40, init_state=env.init(), init_action_sigma=100.0,
              policy_kl_bound=0.25, param_nominal_kl_bound=100.0,
              param_regularizer_kl_bound=10.0)

rgps = LRGPS(env, **kwargs)
rgps_trace = rgps.run(nb_iter=15, verbose=True)

gps = LRGPS(env, **kwargs)
gps_trace = gps.run(nb_iter=15, verbose=True, optimize_adversary=False)

# evaluate both controllers under nominal and adversarial parameter dists
def expected_cost(solver, ctl, param):
    xd, ud, _ = solver._cubature(ctl, param)
    return solver._expected_cost(xd, ud)

print("\n            nominal      adversarial")
print(f"robust   {expected_cost(rgps, rgps.ctl, rgps.nominal):10.2f} "
      f"{expected_cost(rgps, rgps.ctl, rgps.param):12.2f}")
print(f"standard {expected_cost(gps, gps.ctl, gps.nominal):10.2f} "
      f"{expected_cost(gps, gps.ctl, rgps.param):12.2f}")
