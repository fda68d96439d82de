"""Inference precision policy for the decode / serving surfaces.

Training has always had a precision knob (``train.precision`` — params are
cast to bf16 for the forward pass, ``train/state.py:loss_fn``), but the
decode surfaces historically ran fp32 end-to-end.  Small-batch decode on TPU
is HBM-bandwidth-bound: a streaming tick reads every encoder/prednet/joint
weight once per chunk, so serving in bf16 halves the bytes each tick streams
from HBM — the MXU computes bf16 natively, there is no speed penalty, and
greedy/beam token decisions are argmax/top-k over well-separated logits.

The reference has no inference-precision control at all (its eval path runs
whatever Lightning's trainer precision left behind,
``/root/reference/inference.py:13-66``); this is framework surface beyond
parity.

Policy (three rules, each enforced in one place):

* **params** — float leaves are cast ONCE at surface construction
  (:func:`cast_float_leaves`); integer leaves (embedding tables' shape
  metadata, step counters) pass through untouched.
* **activations** — every decode entry point casts its floating inputs to
  the params' dtype (:func:`match_param_dtype`), so the single cast choice
  made at construction propagates through encoder scans, prednet steps and
  joint GEMMs without callers having to know (and a caller handing fp32
  features to fp32 params pays a no-op).
* **score numerics** — beam log-probs upcast to fp32 at ``log_softmax`` and
  every score accumulator is fp32 (``decode/beam*.py``), so hypothesis
  ranking never happens in 8-bit-mantissa arithmetic.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

#: decode-surface precision names -> dtypes (mirrors train.precision)
DECODE_DTYPES = {"fp32": jnp.float32, "bf16": jnp.bfloat16}


def decode_dtype(precision: str):
    """Map a precision name ('fp32' | 'bf16') to its jnp dtype."""
    try:
        return DECODE_DTYPES[precision]
    except KeyError:
        raise ValueError(
            f"unknown precision {precision!r}; choose from "
            f"{sorted(DECODE_DTYPES)}") from None


def cast_float_leaves(tree, dtype):
    """Cast every floating-point leaf of ``tree`` to ``dtype``.

    Non-float leaves (ints, bools) pass through.  Works on host numpy
    arrays without forcing a device transfer (numpy understands ml_dtypes'
    bfloat16), and on device arrays / tracers alike.
    """
    def cast(x):
        if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating):
            return x.astype(dtype)
        return x
    return jax.tree_util.tree_map(cast, tree)


def param_dtype(tree, default=jnp.float32):
    """The dtype of the first floating-point leaf of a params tree.

    Decode surfaces treat this as THE compute dtype: all float params are
    cast together (:func:`cast_float_leaves`), so any float leaf speaks for
    the tree.  Inside ``jit`` the leaves are tracers but dtypes are static,
    so this is trace-time-free.
    """
    for leaf in jax.tree_util.tree_leaves(tree):
        if hasattr(leaf, "dtype") and jnp.issubdtype(leaf.dtype,
                                                     jnp.floating):
            return leaf.dtype
    return default


def match_param_dtype(variables, x):
    """Cast floating array ``x`` to the params' compute dtype (no-op when
    they already agree, e.g. the default fp32/fp32 path)."""
    dt = param_dtype(variables)
    if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating) \
            and x.dtype != dt:
        return x.astype(dt)
    return x
