"""Tour of the TPU-native layer — the capabilities the reference has no analogue
for (SURVEY.md §2.4), on whatever devices are attached (works on the CPU
backend too; pass --cpu to force it).

1. batched MPC farm: the 50-process joblib pendulum farm as one sharded program
   (backward='pallas' on TPU for the packed lane-major backward kernel)
2. batch-native GPS-MPC: every control step's dual bisection = one batched
   program (engine='pallas' on TPU: two packed Pallas launches per step)
3. horizon sharding: exact Riccati with the time axis block-partitioned over a
   mesh, halos exchanged by a log-depth ppermute ladder
4. batch-native exact LQR: N Riccati solves with ONE packed Pallas backward
5. batch-native eLQR: each sweep one fused Pallas launch with in-kernel
   linearization (engine='pallas' on TPU; the reference has no batched eLQR)
6. batch-native belief-space iLQR: per-instance masked lambda escalation
   around ONE packed belief-backward launch per trial
"""
import sys, pathlib
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
from examples._common import setup

args = setup()
import jax, jax.numpy as jnp, numpy as np
from jax.sharding import Mesh

import trajopt_tpu
from trajopt_tpu.parallel.gps import run_gps_mpc_batch
from trajopt_tpu.parallel.mesh import make_mesh
from trajopt_tpu.parallel.mpc import run_mpc_batch
from trajopt_tpu.parallel.riccati import make_riccati_solver_batched
from trajopt_tpu.solvers import Riccati

on_tpu = jax.devices()[0].platform not in ("cpu",)
engine = "pallas" if on_tpu else "scan"
mesh = make_mesh(("dp",)) if len(jax.devices()) > 1 else None

env = trajopt_tpu.make("Pendulum-TO-v0", dt=0.05).replace(uw=(1e-5,))

# 1. iLQR-MPC episode farm (examples/ilqr/mpc/pendulum_parallel.py, device-native)
data = run_mpc_batch(env, jax.random.PRNGKey(0), nb_episodes=16, horizon=25,
                     nb_steps=40, nb_iter=6, mesh=mesh, batched=True,
                     backward=engine)
print(f"[1] iLQR-MPC farm: 16 episodes, mean cost "
      f"{float(jnp.mean(jnp.sum(data['c'], axis=1))):.2f}")

# 2. GPS-MPC farm with the batched dual bisection
data = run_gps_mpc_batch(env, jax.random.PRNGKey(1), nb_episodes=8, horizon=15,
                         nb_steps=10, nb_iter=3, kl_bound=2.0, mesh=mesh,
                         batched=True, engine=engine)
print(f"[2] GPS-MPC farm: 8 episodes, mean cost "
      f"{float(jnp.mean(jnp.sum(data['c'], axis=1))):.2f}")

# 3. horizon-sharded exact LQR (sequence-parallel axis)
lqr = trajopt_tpu.make("LQR-TO-v0")
tmesh = (Mesh(np.array(jax.devices()), ("time",))
         if len(jax.devices()) > 1 else None)
cost = Riccati(lqr, nb_steps=100, init_state=lqr.init(), mesh=tmesh).run()
print(f"[3] {'time-sharded ' if tmesh else ''}Riccati T=100: cost {cost:.2f}")

# 4. batch of exact-LQR solves, one packed backward launch
solve = jax.jit(make_riccati_solver_batched(lqr, 100, backward=engine))
mu0, _ = lqr.init()
x0s = jnp.asarray(np.array(mu0))[None] + 0.1 * jax.random.normal(
    jax.random.PRNGKey(2), (32, lqr.dm_state))
_, _, _, costs, div = solve(x0s.astype(jnp.float32 if on_tpu else x0s.dtype))
print(f"[4] batched Riccati x32 ({engine}): mean cost "
      f"{float(jnp.mean(jnp.sum(costs, axis=1))):.2f}, diverged {int(jnp.sum(div))}")

# 5. batch-native eLQR: three fused Pallas launches per iteration on TPU
from trajopt_tpu.parallel.elqr import make_elqr_solver_batched

cp = trajopt_tpu.make("Cartpole-TO-v0")
solve_elqr = make_elqr_solver_batched(cp, nb_steps=20, nb_iter=4,
                                      engine="pallas" if on_tpu else "scan")
if engine == "scan":
    solve_elqr = jax.jit(solve_elqr)
keys = jax.random.split(jax.random.PRNGKey(3), 8)
x0e = jnp.zeros((8, cp.dm_state), jnp.float32 if on_tpu else jnp.float64)
x0e = x0e.at[:, 1].add(0.3 + 0.05 * jnp.arange(8, dtype=x0e.dtype))  # pole tilt
_, _, _, tr = solve_elqr(keys, x0e)
print(f"[5] batched eLQR x8 ({engine}): mean final cost "
      f"{float(jnp.mean(tr[:, -1])):.2f}")

# 6. batch-native belief-space iLQR with the packed belief backward
from trajopt_tpu.parallel.bsp import make_bsp_solver_batched

ld = trajopt_tpu.make("LightDark-TO-v0")
solve_bsp = make_bsp_solver_batched(ld, nb_steps=10, nb_iter=5, engine=engine)
if engine == "scan":
    solve_bsp = jax.jit(solve_bsp)
mu0, sigma0 = ld.init()
dtype = jnp.float32 if on_tpu else jnp.float64
mu0s = jnp.tile(jnp.asarray(np.array(mu0), dtype), (8, 1)) \
    + 0.05 * jnp.arange(8, dtype=dtype)[:, None]
sigma0s = jnp.tile(jnp.asarray(np.array(sigma0), dtype), (8, 1, 1))
state, trace = solve_bsp(mu0s, sigma0s)
print(f"[6] batched BSP-iLQR x8 ({engine}): mean final cost "
      f"{float(jnp.mean(state.last_return)):.2f}")
