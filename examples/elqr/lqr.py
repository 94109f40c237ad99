"""eLQR on the LQR task (mirror of examples/elqr/lqr.py)."""
import sys, pathlib
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[2]))
from examples._common import setup, plot_trajectory

args = setup()
import numpy as np
import trajopt_tpu
from trajopt_tpu.solvers import eLQR

env = trajopt_tpu.make("LQR-TO-v0")
alg = eLQR(env, nb_steps=60, init_state=np.array(env.x0))
trace = alg.run(nb_iter=10)
print(f"eLQR LQR trace: {trace[0]:.2f} -> {trace[-1]:.2f}")
plot_trajectory(args, alg.xref, alg.uref)
