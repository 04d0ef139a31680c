import numpy as np
import pytest

from peleanalysis_tpu.ops.pallas_kernels import HAVE_PALLAS, grad_mag_pallas
from peleanalysis_tpu.ops.stencil import centered_gradient, magnitude


@pytest.mark.skipif(not HAVE_PALLAS, reason="pallas unavailable")
def test_grad_mag_pallas_interpret_matches_jnp():
    import jax.numpy as jnp
    rng = np.random.default_rng(0)
    X, Y, Z = 13, 18, 21  # deliberately unaligned
    grown = jnp.asarray(rng.normal(size=(X + 2, Y + 2, Z + 2))
                        .astype(np.float32))
    dx = (0.1, 0.2, 0.3)
    got = np.asarray(grad_mag_pallas(grown, dx, interpret=True))
    gx, gy, gz = centered_gradient(grown[None], dx, 1)
    want = np.asarray(jnp.concatenate(
        [gx, gy, gz, magnitude(gx, gy, gz)], axis=0))
    assert got.shape == (4, X, Y, Z)
    np.testing.assert_allclose(got, want, rtol=2e-6, atol=1e-6)
