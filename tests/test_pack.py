"""Unit tests for the round-5 packing/precision primitives.

The end-to-end backend-equality tests exercise these indirectly; the
direct round-trips here pin the bit-level contracts (f16 pack/decode
matching XLA's upcast, bf16-pair grad words, exact bf16 operand splits)
so a regression is attributed at the primitive, not three layers up.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gsjax.ops.pallas_composite import (
    _bf16_exact_split,
    _f16_pair_rows,
    _pack_bf16_pair_rows,
    _unpack_bf16_pair_word,
    pack_f16_pair,
)
from gsjax.ops.binning import slot_layout_of
from gsjax.ops.projection import quantize_f16


def _rand(n, lo=0.0, hi=2.0, seed=0):
    rng = np.random.default_rng(seed)
    return jnp.asarray(rng.uniform(lo, hi, n).astype(np.float32))


def test_f16_pack_decode_bit_exact_roundtrip():
    # normals, zeros, exact-one, denormal-range values
    rng = np.random.default_rng(1)
    x = jnp.asarray(np.concatenate([
        rng.uniform(0, 2, 500), rng.uniform(0, 1e-4, 100),
        [0.0, 1.0, 0.5, 2.0 ** -14],
    ]).astype(np.float32))
    y = jnp.asarray(rng.uniform(0, 1, x.shape[0]).astype(np.float32))
    qx, qy = quantize_f16(x), quantize_f16(y)
    hi, lo = _f16_pair_rows(pack_f16_pair(qx, qy))
    # decode must reproduce the quantized value BIT-exactly: the kernels
    # and the XLA oracle must composite identical alphas/colors
    np.testing.assert_array_equal(np.asarray(hi), np.asarray(qx))
    np.testing.assert_array_equal(np.asarray(lo), np.asarray(qy))


def test_quantize_f16_error_bound_and_flush():
    x = _rand(4096, 0.0, 4.0, seed=2)
    q = np.asarray(quantize_f16(x))
    x_np = np.asarray(x)
    rel = np.abs(q - x_np) / np.maximum(x_np, 1e-6)
    # normal range: half-ulp of f16 (2^-12 relative on [1,2) mantissas)
    assert rel[x_np >= 2.0 ** -14].max() <= 2.0 ** -11
    # below the f16 normal range everything flushes to exact zero
    sub = np.asarray(quantize_f16(jnp.asarray([1e-5, 6e-5, 0.0], jnp.float32)))
    assert sub[0] == 0.0 and sub[2] == 0.0


def test_bf16_pair_word_roundtrip_and_rounding():
    rng = np.random.default_rng(3)
    a = jnp.asarray(rng.normal(0, 3, (1, 256)).astype(np.float32))
    b = jnp.asarray(rng.normal(0, 3, (1, 256)).astype(np.float32))
    w = jax.lax.bitcast_convert_type(
        _pack_bf16_pair_rows(a, b), jnp.int32
    )
    hi, lo = _unpack_bf16_pair_word(w)
    for orig, got in ((a, hi), (b, lo)):
        o, g = np.asarray(orig), np.asarray(got)
        # round-half-up on the bf16 mantissa cut: within one bf16 ulp
        rel = np.abs(g - o) / np.maximum(np.abs(o), 1e-30)
        assert rel.max() <= 2.0 ** -8, rel.max()
    # negatives keep their sign through the bit-pattern rounding
    neg = jnp.asarray(np.full((1, 8), -1.5, np.float32))
    w2 = jax.lax.bitcast_convert_type(
        _pack_bf16_pair_rows(neg, neg), jnp.int32
    )
    h2, l2 = _unpack_bf16_pair_word(w2)
    assert float(jnp.max(h2)) < 0 and float(jnp.max(l2)) < 0


def test_bf16_exact_split_reconstructs_f16_values():
    x = quantize_f16(_rand(1024, 0.0, 2.0, seed=4))
    hi, lo = _bf16_exact_split(x)
    # hi and lo are each bf16-exact and sum to x exactly
    np.testing.assert_array_equal(
        np.asarray(hi),
        np.asarray(hi.astype(jnp.bfloat16).astype(jnp.float32)),
    )
    np.testing.assert_array_equal(
        np.asarray(lo),
        np.asarray(lo.astype(jnp.bfloat16).astype(jnp.float32)),
    )
    np.testing.assert_array_equal(np.asarray(hi + lo), np.asarray(x))


@pytest.mark.parametrize(
    "expansion,eds,expect",
    [
        ("grid", False, "grid"),
        ("compact", False, "rowmajor"),
        ("compact", True, "grid"),  # exact_depth_sort disables compact
        ("grid", True, "grid"),
    ],
)
def test_slot_layout_of(expansion, eds, expect):
    assert slot_layout_of(expansion, eds) == expect
