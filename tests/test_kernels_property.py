"""Property-based kernel tests (hypothesis) — the engine's analog of
the reference's proptest FFI fuzzing of scalar kernels
(tests/cpp_fuzz.rs:19-57): algebraic invariants that must hold for
ARBITRARY finite inputs, not just the fixture zoo.
"""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st
from hypothesis.extra.numpy import arrays

from sparkval import kernels as K

_f = st.floats(min_value=-1e6, max_value=1e6, allow_nan=False, width=64)
_vec = arrays(np.float64, st.integers(8, 64), elements=_f)
_pos_vec = arrays(
    np.float64, st.integers(8, 64),
    elements=st.floats(min_value=0.0, max_value=1e6, allow_nan=False, width=64),
)
_settings = settings(max_examples=60, deadline=None)


@_settings
@given(_vec, st.floats(0.0, 100.0, allow_nan=False))
def test_remove_range_shrinks_toward_zero(v, r):
    out = K.remove_range_around_zero(v, r)
    assert np.all(np.abs(out) <= np.abs(v) + 1e-12)
    assert np.all(np.abs(v) - np.abs(out) <= r + np.abs(v) * 1e-12 + 1e-12)
    assert np.all((np.sign(out) == np.sign(v)) | (out == 0.0))


@_settings
@given(_vec, st.floats(0.0, 100.0, allow_nan=False))
def test_amplify_range_bounded_boost(v, r):
    out = K.amplify_range_around_zero(v, r)
    assert np.all(np.abs(out) >= np.abs(v) - 1e-12)
    assert np.all(np.abs(out) <= np.abs(v) + r + 1e-12)


@_settings
@given(_vec, st.floats(0.5, 1e5, allow_nan=False))
def test_maximum_clamp_soft_knee(v, m):
    out = K.maximum_clamp(v, m)
    inside = np.abs(v) <= m
    assert np.allclose(out[inside], v[inside])
    over = ~inside
    want = np.sign(v[over]) * (m + 0.724 * (np.abs(v[over]) - m))
    assert np.allclose(out[over], want)


@_settings
@given(_vec, st.sampled_from([1.2, K.SIGMA_UHF, K.SIGMA_HF, K.SIGMA_LF]))
def test_blur_is_linear_and_bounded(v, sigma):
    # clamp+renorm blur: linear, and output stays inside [min, max]
    out = K.blur1d(v, sigma)
    assert np.all(out >= v.min() - 1e-9) and np.all(out <= v.max() + 1e-9)
    assert np.allclose(K.blur1d(2.5 * v, sigma), 2.5 * out, rtol=1e-12, atol=1e-9)


@_settings
@given(_vec)
def test_blur_mirror_preserves_constants_and_interior(v):
    c = float(v[0])
    const = np.full(32, c)
    assert np.allclose(K.blur1d_mirror(const, 1.2), c, atol=max(1e-9, abs(c) * 1e-12))


@_settings
@given(_pos_vec)
def test_malta_identity_zero_and_nonnegative(v):
    assert np.allclose(K.malta_diff_1d(v, v.copy(), 10.0, 1e6), 0.0)
    w = v + 1.0  # arbitrary different signal
    assert np.all(K.malta_diff_1d(v, w, 10.0, 1e6) >= 0.0)


@_settings
@given(_pos_vec)
def test_score_identity_and_order(v):
    """drift_score: identity = exact 0; score (max-norm) dominates
    pnorm_3 (each constituent p-norm is mean-normalized <= max)."""
    lang = np.abs(v[:9]) if len(v) >= 9 else np.abs(np.resize(v, 9))
    hb = {"byte": np.resize(np.abs(v), 256), "len": np.resize(np.abs(v), 64),
          "lang": lang}
    s, p, dm = K.drift_score(hb, {k: x.copy() for k, x in hb.items()})
    assert s == 0.0 and p == 0.0 and not dm.any()
    hs = {k: x + np.linspace(0, 3, len(x)) for k, x in hb.items()}
    s2, p2, dm2 = K.drift_score(hb, hs)
    assert s2 >= 0.0 and p2 >= 0.0
    assert s2 >= p2 - 1e-9
    assert np.all(dm2 >= 0.0)


@_settings
@given(_pos_vec)
def test_downsample_mass_and_length(v):
    d = K.downsample_2x(v)
    assert np.isclose(d.sum(), v.sum(), rtol=1e-12)
    assert len(d) == (len(v) + 1) // 2


@_settings
@given(arrays(np.float64, st.integers(1, 7), elements=_f))
def test_reflect_pad_head_preserved(v):
    p = K.reflect_pad_min(v, 8)
    assert len(p) == 8
    assert np.array_equal(p[: len(v)], v)


@_settings
@given(_pos_vec, st.floats(0.1, 8.0, allow_nan=False))
def test_xmul_monotone_lang_channel(v, x):
    lang0 = np.abs(np.resize(v, 9)) + 1.0
    lang1 = lang0[::-1].copy() + 5.0
    hb = {"byte": np.full(256, 50.0), "len": np.full(64, 50.0), "lang": lang0}
    hs = {"byte": np.full(256, 50.0), "len": np.full(64, 50.0), "lang": lang1}
    lo = K.drift_score(hb, hs, xmul=x)[0]
    hi = K.drift_score(hb, hs, xmul=x * 2.0)[0]
    assert hi >= lo - 1e-12


@_settings
@given(_pos_vec, _pos_vec, _pos_vec)
def test_opsin_absorbance_affine_and_ordered(r, g, b):
    """Mixing is affine (mix(v)+mix(0) relation via linearity of the
    matrix part) and monotone: raising any input raises every output
    (all matrix coefficients are positive, opsin.rs:20-33)."""
    n = min(len(r), len(g), len(b))
    r, g, b = r[:n], g[:n], b[:n]
    o = K.opsin_absorbance(r, g, b, clamp=False)
    o_shift = K.opsin_absorbance(r + 1.0, g, b, clamp=False)
    for i in range(3):
        assert np.all(o_shift[i] >= o[i])
    # linearity of the matrix part: mix(2v) - bias == 2*(mix(v) - bias)
    o2 = K.opsin_absorbance(2 * r, 2 * g, 2 * b, clamp=False)
    for i in range(3):
        assert np.allclose(o2[i] - K.OPSIN_BIAS[i],
                           2 * (o[i] - K.OPSIN_BIAS[i]), rtol=1e-9, atol=1e-9)


@_settings
@given(_pos_vec)
def test_opsin_dynamics_triple_finite_and_floored(v):
    """Full triple dynamics never produces NaN/inf and the mixed
    channels respect their clamp floors for arbitrary non-negative
    input (opsin.rs:237-239)."""
    X, Y, B = K.opsin_dynamics_triple(v, v[::-1].copy(), np.sqrt(v))
    for out in (X, Y, B):
        assert np.all(np.isfinite(out))
    assert np.all((X + Y) / 2 >= K.OPSIN_MIN[0] - 1e-9)
    assert np.all((Y - X) / 2 >= K.OPSIN_MIN[1] - 1e-9)
    assert np.all(B >= K.OPSIN_MIN[2] - 1e-9)
