"""DSP building blocks shared by UGens.

The centerpiece is :func:`affine_scan`: IIR filters are linear recurrences
``s[t+1] = M[t] s[t] + c[t]``, which TPUs evaluate in O(log B) depth via
``jax.lax.associative_scan`` over affine maps instead of a sequential
per-sample loop. This is the TPU-native answer to the reference's per-sample
filter loops (e.g. SvfFilter::process_sample, svf.rs) — identical math per
sample, parallel evaluation, and it vectorizes over channels/voices for free.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# degree-9 odd minimax polynomial for sin(u) on [-pi/2, pi/2]: max error
# 1.2e-7 (the float32 rounding floor). Same coefficients as the bank
# kernels' quantized sine (parallel/pallas_bank.py _SIN_C). Plain Python
# floats so the closure stays Mosaic-legal (jnp scalars created outside a
# kernel body are rejected as captured constants).
_SIN9_C = (1.0, -0.16666652, 0.008332964, -0.00019804752, 2.5981028e-06)
_HALF_PI = 1.5707963267948966


def sin_poly_quadrant(u):
    """sin(u) for u in [-pi/2, pi/2] via the degree-9 odd minimax
    polynomial (f32 error <= 1.2e-7). Mosaic-legal."""
    u2 = u * u
    p = _SIN9_C[4]
    p = p * u2 + _SIN9_C[3]
    p = p * u2 + _SIN9_C[2]
    p = p * u2 + _SIN9_C[1]
    return (p * u2 + _SIN9_C[0]) * u


def tan_first_quadrant(x):
    """tan(x) for x in [0, pi/2) as sin(x)/sin(pi/2 - x) with the minimax
    polynomial — NOT ``jnp.tan``.

    XLA-TPU's f32 tan approximation carries enough error that a resonant
    filter chain amplifies it to audibility: on a 10-deep Bell-EQ chain the
    scan executor measured 6.2e-3 from f64 ground truth with ``jnp.tan``
    coefficients while the Pallas chain kernel (polynomial math) was
    7.6e-6 (DESIGN_NOTES "72-check sweep"). This form keeps the relative
    coefficient error at the f32 floor (~2e-7) on every backend and is
    Mosaic-legal, so both SVF executors share it. f64 keeps ``jnp.tan``:
    the polynomial is fitted to f32 and CPU f64 tan is correctly rounded.
    """
    if x.dtype == jnp.float64:
        return jnp.tan(x)
    s = sin_poly_quadrant(x)
    c = sin_poly_quadrant(_HALF_PI - x)
    return s / c


def affine_scan_1d(a: jnp.ndarray, b: jnp.ndarray, s0: jnp.ndarray):
    """Scalar linear recurrence ``s[t+1] = a[t]*s[t] + b[t]``.

    a, b: ``[..., B]`` (time on the last axis); s0: ``[...]``.
    Returns ``(s_pre [..., B], s_final [...])`` where ``s_pre[..., t]`` is the
    state *before* applying step t (s_pre[..., 0] == s0).
    """

    def combine(l, r):
        al, bl = l
        ar, br = r
        return al * ar, ar * bl + br

    A, Bc = jax.lax.associative_scan(combine, (a, b), axis=-1)
    # inclusive prefix: state AFTER step t = A[t]*s0 + Bc[t]
    s_after = A * s0[..., None] + Bc
    s_pre = jnp.concatenate([s0[..., None], s_after[..., :-1]], axis=-1)
    return s_pre, s_after[..., -1]


def affine_scan_2x2_rows(m00, m01, m10, m11, c0, c1, s00, s01):
    """Row-layout variant of :func:`affine_scan_2d` for the Pallas chain
    kernel (graph/chain_kernel.py): the 2x2 matrix and the 2-vector are
    passed as six separate ``[..., B]`` rows (time on the last axis) so the
    whole scan stays on 2D vector tiles — no ``[B, 2, 2]`` intermediates,
    which Mosaic has no good layout for. The combine uses the same
    multiply-add order as affine_scan_2d's einsums over the same
    associative_scan tree; results match it to the ULP (XLA's FMA-fusion
    choices differ between the two lowerings, measured ~1.2e-7 max).

    s00/s01 broadcast against a row (``[..., 1]``). Returns
    ``(s_pre0, s_pre1, s_final0, s_final1)`` with s_pre* shaped like m00
    and s_final* shaped ``[..., 1]``.
    """

    def combine(l, r):
        l00, l01, l10, l11, lc0, lc1 = l
        r00, r01, r10, r11, rc0, rc1 = r
        return (
            r00 * l00 + r01 * l10,
            r00 * l01 + r01 * l11,
            r10 * l00 + r11 * l10,
            r10 * l01 + r11 * l11,
            r00 * lc0 + r01 * lc1 + rc0,
            r10 * lc0 + r11 * lc1 + rc1,
        )

    A00, A01, A10, A11, C0, C1 = jax.lax.associative_scan(
        combine, (m00, m01, m10, m11, c0, c1), axis=-1
    )
    s_after0 = A00 * s00 + A01 * s01 + C0
    s_after1 = A10 * s00 + A11 * s01 + C1
    ones = jnp.ones_like(s_after0[..., :1])
    s_pre0 = jnp.concatenate([s00 * ones, s_after0[..., :-1]], axis=-1)
    s_pre1 = jnp.concatenate([s01 * ones, s_after1[..., :-1]], axis=-1)
    return s_pre0, s_pre1, s_after0[..., -1:], s_after1[..., -1:]


def _shift_fill(x, s, fill):
    """[1, B] row shifted ``s`` lanes right, identity ``fill`` in front."""
    return jnp.concatenate(
        [jnp.full((1, s), fill, x.dtype), x[:, : x.shape[-1] - s]], axis=-1
    )


def affine_scan_1d_lanes(a, b, s0):
    """Mosaic-safe :func:`affine_scan_1d` on [1, B] rows for chain-kernel
    bodies: ``associative_scan``'s strided odd/even lane slices don't
    lower in Mosaic ("Invalid vector register cast"), so the same affine
    combine runs as Hillis-Steele doubling with identity fills — shifted
    lanes carry (1, 0), the combine's neutral element, so no masks. Float
    association differs from associative_scan's tree at the ULP level
    (parity tests on these paths are allclose already). ``s0``: [1, 1]."""
    B = a.shape[-1]
    A, Bc = a, b
    s = 1
    while s < B:
        Al = _shift_fill(A, s, 1.0)
        Bl = _shift_fill(Bc, s, 0.0)
        Bc = A * Bl + Bc
        A = Al * A
        s *= 2
    s_after = A * s0 + Bc
    s_pre = jnp.concatenate([s0, s_after[:, :-1]], axis=-1)
    return s_pre, s_after[:, -1:]


def affine_scan_2x2_rows_lanes(m00, m01, m10, m11, c0, c1, s00, s01):
    """Mosaic-safe :func:`affine_scan_2x2_rows` (see
    :func:`affine_scan_1d_lanes`): Hillis-Steele doubling with the 2x2
    identity as the shifted fill, same multiply-add order per combine.
    All rows [1, B]; s00/s01 broadcast ([1, 1])."""
    B = m00.shape[-1]
    A00, A01, A10, A11, C0, C1 = m00, m01, m10, m11, c0, c1
    s = 1
    while s < B:
        l00 = _shift_fill(A00, s, 1.0)
        l01 = _shift_fill(A01, s, 0.0)
        l10 = _shift_fill(A10, s, 0.0)
        l11 = _shift_fill(A11, s, 1.0)
        lc0 = _shift_fill(C0, s, 0.0)
        lc1 = _shift_fill(C1, s, 0.0)
        n00 = A00 * l00 + A01 * l10
        n01 = A00 * l01 + A01 * l11
        n10 = A10 * l00 + A11 * l10
        n11 = A10 * l01 + A11 * l11
        nc0 = A00 * lc0 + A01 * lc1 + C0
        nc1 = A10 * lc0 + A11 * lc1 + C1
        A00, A01, A10, A11, C0, C1 = n00, n01, n10, n11, nc0, nc1
        s *= 2
    s_after0 = A00 * s00 + A01 * s01 + C0
    s_after1 = A10 * s00 + A11 * s01 + C1
    s_pre0 = jnp.concatenate([s00, s_after0[:, :-1]], axis=-1)
    s_pre1 = jnp.concatenate([s01, s_after1[:, :-1]], axis=-1)
    return s_pre0, s_pre1, s_after0[:, -1:], s_after1[:, -1:]


def affine_scan_2d(M: jnp.ndarray, c: jnp.ndarray, s0: jnp.ndarray):
    """2-state linear recurrence ``s[t+1] = M[t] @ s[t] + c[t]``.

    M: ``[B, 2, 2]``, c: ``[B, 2]``, s0: ``[2]`` (or with leading batch dims
    before B). Returns ``(s_pre [B, 2], s_final [2])``.

    Implemented by unpacking onto :func:`affine_scan_2x2_rows` — scalar
    multiplies on the VPU, NOT einsums. The original einsum combine hit
    XLA-TPU's default matmul precision (bf16 MXU passes for the tiny 2x2
    products): a 10-deep Bell-EQ chain measured 1.1e-2 from f64 truth
    against 4.7e-7 for this form (round-5 probe; the error the round-4
    sweep mis-attributed to ``jnp.tan``). Elementwise form is also faster
    at these shapes — no [B, 2, 2] layout for the MXU to tile.
    """
    m00, m01 = M[..., 0, 0], M[..., 0, 1]
    m10, m11 = M[..., 1, 0], M[..., 1, 1]
    p0, p1, f0, f1 = affine_scan_2x2_rows(
        m00, m01, m10, m11, c[..., 0], c[..., 1], s0[..., 0:1], s0[..., 1:2]
    )
    return jnp.stack([p0, p1], axis=-1), jnp.concatenate([f0, f1], axis=-1)
