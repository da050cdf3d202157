"""Multi-output subsystem tests, porting the block-Gram assembly semantics of
``/root/reference/tests/mo/test_kernel.py`` and the GPAR-style multi-output
workflows of ``readme_example4_multi-output.py``."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import stheno_tpu.matrix as M
from stheno_tpu import (
    EQ,
    GP,
    Measure,
    cross,
    dimensionality,
    infer_size,
    num_elements,
    pairwise,
    elwise,
)
from stheno_tpu.mo import MultiOutputKernel, MultiOutputMean
from tests.util import approx


@pytest.fixture
def setup():
    m = Measure()
    f1 = GP(1.0, EQ(), measure=m)
    f2 = GP(2.0, EQ().stretch(2.0), measure=m)
    x = jnp.linspace(0, 3, 4)
    return m, f1, f2, x


def test_block_assembly(setup):
    m, f1, f2, x = setup
    mok = MultiOutputKernel(m, f1, f2)
    K = np.asarray(M.dense(pairwise(mok, x, x)))
    assert K.shape == (8, 8)
    K11 = np.asarray(M.dense(pairwise(m.kernels[f1], x)))
    K22 = np.asarray(M.dense(pairwise(m.kernels[f2], x)))
    np.testing.assert_allclose(K[:4, :4], K11, rtol=1e-10)
    np.testing.assert_allclose(K[4:, 4:], K22, rtol=1e-10)
    # Independent processes: off-diagonal blocks vanish.
    np.testing.assert_allclose(K[:4, 4:], 0, atol=1e-12)

    # FDD-tagged inputs select blocks.
    K12 = np.asarray(M.dense(pairwise(mok, f1(x), f2(x))))
    np.testing.assert_allclose(K12, 0, atol=1e-12)
    K11b = np.asarray(M.dense(pairwise(mok, f1(x), f1(x))))
    np.testing.assert_allclose(K11b, K11, rtol=1e-10)

    # Mixed: FDD vs plain fans out the plain input.
    Km = np.asarray(M.dense(pairwise(mok, f1(x), x)))
    assert Km.shape == (4, 8)
    np.testing.assert_allclose(Km[:, :4], K11, rtol=1e-10)


def test_mom(setup):
    m, f1, f2, x = setup
    mom = MultiOutputMean(m, f1, f2)
    out = np.asarray(mom(x))
    np.testing.assert_allclose(out[:4, 0], 1.0)
    np.testing.assert_allclose(out[4:, 0], 2.0)


def test_elwise_mo(setup):
    m, f1, f2, x = setup
    mok = MultiOutputKernel(m, f1, f2)
    el = np.asarray(elwise(mok, x, x))
    assert el.shape == (8, 1)
    np.testing.assert_allclose(el[:, 0], 1.0, rtol=1e-10)
    with pytest.raises(ValueError):
        elwise(mok, f1(x), x)


def test_dimensionality_and_infer_size(setup):
    m, f1, f2, x = setup
    mok = MultiOutputKernel(m, f1, f2)
    assert dimensionality(mok) == 2
    assert dimensionality(EQ()) == 1
    assert dimensionality(EQ() + EQ()) == 1
    assert infer_size(mok, x) == 8
    assert infer_size(mok, f1(x)) == 4
    assert infer_size(mok, (f1(x), f2(x))) == 8
    assert infer_size(EQ(), x) == 4
    assert num_elements(f1(x)) == 4
    assert num_elements((f1(x), f2(x))) == 8


def test_cross_process(setup):
    m, f1, f2, x = setup
    p = cross(f1, f2)
    fdd = p(x)
    mean, var = fdd.mean, fdd.var
    assert np.asarray(mean).shape == (8, 1)
    assert M.dense(var).shape == (8, 8)
    # Sampling and conditioning through the cross process.
    key = jax.random.PRNGKey(0)
    key, s = fdd.sample(key)
    assert s.shape == (8, 1)


def test_multi_output_conditioning(setup):
    m, f1, f2, x = setup
    r = np.random.RandomState(0)
    y1 = jnp.asarray(np.sin(np.asarray(x)))
    y2 = jnp.asarray(np.cos(np.asarray(x)))
    post = m.condition((f1(x, 1e-6), y1), (f2(x, 1e-6), y2))
    m1, _ = post(f1)(x).marginals()
    m2, _ = post(f2)(x).marginals()
    np.testing.assert_allclose(np.asarray(m1), np.asarray(y1), atol=1e-4)
    np.testing.assert_allclose(np.asarray(m2), np.asarray(y2), atol=1e-4)


def test_correlated_multi_output():
    # Correlated outputs: observing one output informs the other.
    m = Measure()
    latent = GP(EQ(), measure=m)
    f1 = latent + GP(1e-2 * EQ(), measure=m)
    f2 = latent + GP(1e-2 * EQ().stretch(2.0), measure=m)
    x = jnp.linspace(0, 5, 10)
    y = jnp.sin(x)
    post = m.condition(f1(x, 1e-6), y)
    m2, v2 = post(f2)(x).marginals()
    np.testing.assert_allclose(np.asarray(m2), np.asarray(y), atol=0.15)
    # Variance shrinks vs prior.
    _, v2_prior = f2(x).marginals()
    assert np.all(np.asarray(v2) < np.asarray(v2_prior))


def test_combined_joint_logpdf(setup):
    m, f1, f2, x = setup
    y1 = jnp.asarray(np.sin(np.asarray(x)))
    y2 = jnp.asarray(np.cos(np.asarray(x)))
    joint = m.logpdf((f1(x, 0.1), y1), (f2(x, 0.1), y2))
    # Independent processes: factorises.
    lp1 = m.logpdf(f1(x, 0.1), y1)
    lp2 = m.logpdf(f2(x, 0.1), y2)
    np.testing.assert_allclose(
        np.asarray(joint), np.asarray(lp1) + np.asarray(lp2), rtol=1e-8
    )


def test_posterior_cross_process_marginals():
    """Conditioning a multi-output model and evaluating the posterior cross
    process must work: transposed cross-kernels (_SwappedKernel) defer their
    dimensionality to the wrapped kernel (reference infer.py:72-73)."""
    import stheno_tpu as st

    m = st.Measure()
    p1 = st.GP(st.EQ(), measure=m)
    p2 = st.GP(st.Matern32(), measure=m)
    pc = st.cross(p1, p2)
    x = jnp.linspace(0, 5, 10)
    key, y = m.sample(jax.random.PRNGKey(0), p1(x, 0.1))
    post = m | (p1(x, 0.1), y[:, 0])
    mean, var = post(pc)(x, 1e-2).marginals()
    assert mean.shape == (20,) and var.shape == (20,)
    # The p1 block of the cross posterior equals the posterior of p1.
    mean1, var1 = post(p1(x, 1e-2)).marginals()
    np.testing.assert_allclose(np.asarray(mean[:10]), np.asarray(mean1), rtol=1e-8)
    np.testing.assert_allclose(np.asarray(var[:10]), np.asarray(var1), rtol=1e-6)
