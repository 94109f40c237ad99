"""Child process for the 2-process ``jax.distributed`` smoke test.

Run by ``tests/test_multihost.py`` as::

    python tests/multihost_child.py <coordinator_port> <process_id> <num_processes>

Each process contributes 4 virtual CPU devices (``XLA_FLAGS`` set by the
parent), initializes the distributed runtime through the library's
``init_multihost`` helper, builds the global mesh with ``make_mesh``, and runs

* a jit global reduction over a ``dp``-sharded global array assembled from
  process-local shards (the multi-host data-ingest pattern), and
* an explicit ``shard_map`` ``psum`` across all 8 devices (2 processes).

Prints ``MULTIHOST_OK <sum> <psum0>`` on success; the parent asserts the
values from both processes.
"""

import sys

import jax

# The container sitecustomize pre-imports jax with an accelerator plugin
# registered; steer this child to CPU before any backend is initialized
# (env vars alone are too late — see tests/conftest.py).
jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
from jax.sharding import NamedSharding, PartitionSpec as P  # noqa: E402

from trajopt_tpu.parallel.mesh import init_multihost, make_mesh  # noqa: E402


def main(port: int, pid: int, nproc: int) -> None:
    init_multihost(
        coordinator_address=f"localhost:{port}",
        num_processes=nproc,
        process_id=pid,
    )
    assert jax.process_count() == nproc, jax.process_count()
    n_local = jax.local_device_count()
    n_global = jax.device_count()
    assert n_global == nproc * n_local, (n_global, n_local)

    mesh = make_mesh(("dp",))
    sharding = NamedSharding(mesh, P("dp"))

    # Global (n_global, 4) array assembled from process-local shards.
    n_rows = 2 * n_global
    global_shape = (n_rows, 4)

    def local_chunk(index):
        # index is a tuple of slices into the global shape for one shard.
        r = np.arange(n_rows, dtype=np.float64)[index[0]]
        return r[:, None] * np.ones((1, 4))

    x = jax.make_array_from_callback(global_shape, sharding, local_chunk)

    total = jax.jit(
        lambda a: jnp.sum(a * a),
        out_shardings=NamedSharding(mesh, P()),
    )(x)
    total = float(total)
    expect = float(np.sum(np.arange(n_rows) ** 2) * 4)
    assert abs(total - expect) < 1e-6, (total, expect)

    # Explicit cross-process collective.
    def block(a):
        return jax.lax.psum(jnp.sum(a), "dp")[None]

    ps = jax.jit(
        jax.shard_map(block, mesh=mesh, in_specs=P("dp"), out_specs=P("dp"))
    )(x)
    # ps spans non-addressable devices; every shard holds the same psum value,
    # so read the first process-local one.
    ps0 = float(np.asarray(ps.addressable_shards[0].data)[0])
    expect_sum = float(np.sum(np.arange(n_rows)) * 4)
    assert abs(ps0 - expect_sum) < 1e-6, (ps0, expect_sum)

    print(f"MULTIHOST_OK {total:.1f} {ps0:.1f}", flush=True)


if __name__ == "__main__":
    main(int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3]))
