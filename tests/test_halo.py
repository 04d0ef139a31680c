import numpy as np
import pytest

import jax
import jax.numpy as jnp


def test_halo_grad_matches_global():
    from jax.sharding import NamedSharding, PartitionSpec as P
    from peleanalysis_tpu.parallel.dense_shard import make_spatial_mesh
    from peleanalysis_tpu.parallel.halo import halo_grad_x
    from peleanalysis_tpu.ops.stencil import centered_gradient, magnitude

    mesh = make_spatial_mesh(8)
    rng = np.random.default_rng(0)
    arr = jnp.asarray(rng.normal(size=(1, 32, 12, 16)))
    dx = (0.1, 0.2, 0.3)
    sharded = jax.device_put(arr, NamedSharding(mesh, P(None, "x")))
    got = np.asarray(halo_grad_x(sharded, dx, mesh))

    # global reference: edge-padded centered differences
    g = np.pad(np.asarray(arr), ((0, 0), (1, 1), (1, 1), (1, 1)),
               mode="edge")
    gx, gy, gz = centered_gradient(jnp.asarray(g), dx, 1)
    want = np.concatenate([np.asarray(gx), np.asarray(gy), np.asarray(gz),
                           np.asarray(magnitude(gx, gy, gz))], axis=0)
    np.testing.assert_allclose(got, want, rtol=1e-12, atol=1e-13)
