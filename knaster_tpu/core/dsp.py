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


def affine_scan_2d(M: jnp.ndarray, c: jnp.ndarray, s0: jnp.ndarray):
    """2-state linear recurrence ``s[t+1] = M[t] @ s[t] + c[t]``.

    M: ``[B, 2, 2]``, c: ``[B, 2]``, s0: ``[2]`` (or with leading batch dims
    before B). Returns ``(s_pre [B, 2], s_final [2])``.
    """

    def combine(l, r):
        Ml, cl = l
        Mr, cr = r
        Mo = jnp.einsum("...ij,...jk->...ik", Mr, Ml)
        co = jnp.einsum("...ij,...j->...i", Mr, cl) + cr
        return Mo, co

    A, Cc = jax.lax.associative_scan(combine, (M, c), axis=0)
    s_after = jnp.einsum("tij,j->ti", A, s0) + Cc
    s_pre = jnp.concatenate([s0[None, :], s_after[:-1]], axis=0)
    return s_pre, s_after[-1]
