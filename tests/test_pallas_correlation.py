"""Pallas correlation kernel vs the XLA reference (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np

from islam_tpu.ops.correlation import correlation_reference
from islam_tpu.ops.pallas.correlation_kernel import correlation_pallas

from tests.rng_helpers import PerTestRNG

RNG = PerTestRNG(21)


class TestPallasCorrelation:
    def test_forward_matches_reference(self):
        f1 = jnp.asarray(RNG.normal(size=(2, 16, 12, 20)), jnp.float32)
        f2 = jnp.asarray(RNG.normal(size=(2, 16, 12, 20)), jnp.float32)
        out = correlation_pallas(f1, f2, 4)
        ref = correlation_reference(f1, f2, md=4)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=1e-5)

    def test_forward_nondivisible_rows(self):
        # H=7 (level-6 size): exercises the partial row block
        f1 = jnp.asarray(RNG.normal(size=(1, 8, 7, 10)), jnp.float32)
        f2 = jnp.asarray(RNG.normal(size=(1, 8, 7, 10)), jnp.float32)
        out = correlation_pallas(f1, f2, 4)
        ref = correlation_reference(f1, f2, md=4)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=1e-5)

    def test_custom_vjp_matches_autodiff(self):
        f1 = jnp.asarray(RNG.normal(size=(1, 4, 8, 10)), jnp.float32)
        f2 = jnp.asarray(RNG.normal(size=(1, 4, 8, 10)), jnp.float32)

        def loss_pallas(a, b):
            return jnp.sum(jnp.sin(correlation_pallas(a, b, 4)))

        def loss_ref(a, b):
            return jnp.sum(jnp.sin(correlation_reference(a, b, md=4)))

        g1p, g2p = jax.grad(loss_pallas, argnums=(0, 1))(f1, f2)
        g1r, g2r = jax.grad(loss_ref, argnums=(0, 1))(f1, f2)
        np.testing.assert_allclose(np.asarray(g1p), np.asarray(g1r),
                                   atol=1e-4)
        np.testing.assert_allclose(np.asarray(g2p), np.asarray(g2r),
                                   atol=1e-4)
