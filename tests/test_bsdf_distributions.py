"""Distribution-level BSDF sampling tests (SURVEY.md §4: 'BSDF sampling
distributions via chi-square') — the statistical layer of the test pyramid
the reference lacks entirely.

Pins: cosine_sample produces a cosine-weighted hemisphere (chi-square on the
cos-theta CDF and uniform azimuth), mirror_dir is an exact reflection,
refr_terms conserves energy and obeys Snell/TIR, and russian_roulette is
unbiased (survival boost cancels the kill rate in expectation)."""

import math

import numpy as np
import jax.numpy as jnp

from smallpt_tpu.ops import bsdf
from smallpt_tpu.core import rng as prng

try:
    from scipy import stats as sps
    HAVE_SCIPY = True
except ImportError:  # pragma: no cover
    HAVE_SCIPY = False


def _chi2_pvalue(counts, expected):
    """Chi-square goodness-of-fit p-value (scipy-free fallback via the
    regularized gamma survival function through numpy if scipy missing)."""
    counts = np.asarray(counts, float)
    expected = np.asarray(expected, float)
    chi2 = ((counts - expected) ** 2 / expected).sum()
    dof = len(counts) - 1
    if HAVE_SCIPY:
        return sps.chi2.sf(chi2, dof)
    # Wilson-Hilferty normal approximation
    z = ((chi2 / dof) ** (1 / 3) - (1 - 2 / (9 * dof))) / np.sqrt(2 / (9 * dof))
    return 0.5 * (1 - math.erf(z / np.sqrt(2)))


def _uniforms(n, seed=0):
    key = prng.base_key(seed)
    sid = jnp.arange(n, dtype=jnp.int32)
    z = jnp.zeros_like(sid)
    u = prng.shade_uniforms(key, sid, z, z)
    return u


def test_cosine_sample_is_cosine_weighted():
    n = 200_000
    u = _uniforms(n)
    nl = jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]], jnp.float32), (n, 1))
    d = np.asarray(bsdf.cosine_sample(nl, u[:, 1], u[:, 2]))
    # unit vectors in the upper hemisphere
    assert np.abs(np.linalg.norm(d, axis=1) - 1).max() < 1e-4
    assert (d[:, 2] >= -1e-6).all()
    # cos-weighted => cos^2(theta) = d_z^2 ~ Uniform[0,1]
    bins = 20
    counts, _ = np.histogram(d[:, 2] ** 2, bins=bins, range=(0.0, 1.0))
    p = _chi2_pvalue(counts, np.full(bins, n / bins))
    assert p > 1e-4, p
    # azimuth uniform on [-pi, pi]
    phi = np.arctan2(d[:, 1], d[:, 0])
    counts, _ = np.histogram(phi, bins=bins, range=(-np.pi, np.pi))
    p = _chi2_pvalue(counts, np.full(bins, n / bins))
    assert p > 1e-4, p


def test_cosine_sample_respects_frame():
    """Sampling around an arbitrary normal: cos(theta) distribution is
    frame-invariant (the tangent-frame construction, smallpt.cpp:208-212)."""
    n = 100_000
    u = _uniforms(n, seed=3)
    nrm = jnp.tile(
        jnp.asarray([[0.6, -0.64, 0.48]], jnp.float32), (n, 1)
    )  # unit
    d = np.asarray(bsdf.cosine_sample(nrm, u[:, 1], u[:, 2]))
    cos_t = d @ np.asarray([0.6, -0.64, 0.48])
    assert (cos_t >= -1e-5).all()
    assert abs(cos_t.mean() - 2 / 3) < 5e-3  # E[cos] = 2/3 for cos-weighted


def test_mirror_dir_exact():
    rng = np.random.default_rng(0)
    d = rng.normal(size=(1000, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    n = rng.normal(size=(1000, 3)).astype(np.float32)
    n /= np.linalg.norm(n, axis=1, keepdims=True)
    r = np.asarray(bsdf.mirror_dir(jnp.asarray(d), jnp.asarray(n)))
    # |r| == 1; angle of incidence == angle of reflection
    assert np.abs(np.linalg.norm(r, axis=1) - 1).max() < 1e-5
    np.testing.assert_allclose((r * n).sum(1), -(d * n).sum(1), atol=1e-4)
    # reflected ray stays in the incidence plane: r, d, n coplanar
    cross = np.cross(d, n)
    assert np.abs((r * cross).sum(1)).max() < 1e-4


def test_refr_energy_and_snell():
    """Schlick Re + Tr == 1; transmitted direction obeys Snell's law; TIR
    occurs exactly past the critical angle for inside->outside rays."""
    n_samples = 20_000
    rng = np.random.default_rng(1)
    # rays hitting a z+ surface from above (outside -> inside)
    d = rng.normal(size=(n_samples, 3))
    d[:, 2] = -np.abs(d[:, 2]) - 1e-3
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    n = np.tile([0.0, 0.0, 1.0], (n_samples, 1)).astype(np.float32)
    nl = n  # faces against the ray (dot(n, d) < 0) => into = True
    rt = bsdf.refr_terms(jnp.asarray(d, jnp.float32), jnp.asarray(n),
                         jnp.asarray(nl), 1.5)
    re, tr = np.asarray(rt.re), np.asarray(rt.tr)
    tir = np.asarray(rt.tir)
    assert not tir.any()  # entering glass never TIRs
    np.testing.assert_allclose(re + tr, 1.0, atol=1e-5)
    assert (re >= -1e-6).all() and (re <= 1.0 + 1e-6).all()
    # Snell: sin(theta_t) = sin(theta_i) / 1.5
    tdir = np.asarray(rt.tdir)
    sin_i = np.sqrt(np.clip(1 - d[:, 2] ** 2, 0, 1))
    sin_t = np.sqrt(np.clip(1 - tdir[:, 2] ** 2, 0, 1))
    np.testing.assert_allclose(sin_t, sin_i / 1.5, atol=1e-4)

    # inside -> outside: TIR iff sin(theta) > 1/1.5
    d2 = rng.normal(size=(n_samples, 3))
    d2[:, 2] = np.abs(d2[:, 2]) + 1e-3
    d2 /= np.linalg.norm(d2, axis=1, keepdims=True)
    nl2 = -n  # flipped against the ray => into = False
    rt2 = bsdf.refr_terms(jnp.asarray(d2, jnp.float32), jnp.asarray(n),
                          jnp.asarray(nl2), 1.5)
    sin2 = 1 - d2[:, 2] ** 2
    expect_tir = sin2 > (1 / 1.5) ** 2 + 1e-6
    clear = np.abs(sin2 - (1 / 1.5) ** 2) > 1e-4  # away from the critical angle
    assert (np.asarray(rt2.tir)[clear] == expect_tir[clear]).all()


def test_russian_roulette_unbiased():
    """E[boost * survive] == 1 for active lanes: the kill rate is exactly
    compensated (smallpt.cpp:187-198)."""
    n = 400_000
    u = np.asarray(_uniforms(n, seed=9))[:, 0]
    albedo = jnp.tile(jnp.asarray([[0.6, 0.3, 0.1]], jnp.float32), (n, 1))
    depth = jnp.full((n,), 10, jnp.int32)  # active (> rr_depth)
    survive, boost = bsdf.russian_roulette(albedo, depth, jnp.asarray(u), 5)
    survive, boost = np.asarray(survive), np.asarray(boost)
    est = (survive * boost).mean()
    assert abs(est - 1.0) < 5e-3, est
    assert abs(survive.mean() - 0.6) < 5e-3  # p = max albedo
