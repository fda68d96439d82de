"""NumPy oracle for the RNN-T loss (Graves 2012, arXiv:1211.3711).

Tier A of the three-tier loss stack (SURVEY.md §7 hard-part 1): a direct,
slow, obviously-correct forward-backward over the T x U alignment lattice.
It is the golden reference that the lax.scan and Pallas implementations
(capability-equivalents of warp-transducer / torchaudio RNNTLoss used at
``model.py:5-6,28-39,57,74`` in the reference) are tested against at 1e-5.

Lattice convention: state (t, u) has consumed t audio frames and emitted u
labels.  From (t, u): emit blank -> (t+1, u) with lp[t, u, blank]; emit
labels[u] -> (t, u+1) with lp[t, u, labels[u]].  A path ends by emitting
blank from (T-1, U).
"""

from __future__ import annotations

import numpy as np


def log_softmax(x, axis=-1):
    m = np.max(x, axis=axis, keepdims=True)
    s = x - m
    return s - np.log(np.sum(np.exp(s), axis=axis, keepdims=True))


def _logaddexp(a, b):
    return np.logaddexp(a, b)


def rnnt_loss_single(log_probs: np.ndarray, labels: np.ndarray, T: int, U: int,
                     blank: int = 0, fastemit_lambda: float = 0.0):
    """One utterance. log_probs: (T_pad, U_pad+1, V) log-softmaxed logits;
    labels: (U_pad,) int. Returns (loss, grad w.r.t. log_probs).

    ``fastemit_lambda``: FastEmit regularization (arXiv:2010.11148 eq. 9-10)
    — the label-arc occupancy gradient is scaled by (1 + lambda), pushing
    probability mass toward emitting labels earlier; the loss value itself
    is the unregularized -logZ (the paper's gradient surrogate)."""
    NEG = -np.inf
    alpha = np.full((T, U + 1), NEG, dtype=np.float64)
    alpha[0, 0] = 0.0
    for t in range(T):
        for u in range(U + 1):
            if t == 0 and u == 0:
                continue
            a = alpha[t - 1, u] + log_probs[t - 1, u, blank] if t > 0 else NEG
            b = alpha[t, u - 1] + log_probs[t, u - 1, labels[u - 1]] if u > 0 else NEG
            alpha[t, u] = _logaddexp(a, b)
    logZ = alpha[T - 1, U] + log_probs[T - 1, U, blank]

    beta = np.full((T, U + 1), NEG, dtype=np.float64)
    beta[T - 1, U] = log_probs[T - 1, U, blank]
    for t in range(T - 1, -1, -1):
        for u in range(U, -1, -1):
            if t == T - 1 and u == U:
                continue
            a = log_probs[t, u, blank] + beta[t + 1, u] if t < T - 1 else NEG
            b = log_probs[t, u, labels[u]] + beta[t, u + 1] if u < U else NEG
            beta[t, u] = _logaddexp(a, b)

    # occupancy-based gradient wrt log_probs (then the caller chains through
    # log_softmax for logits grads)
    grad = np.zeros_like(log_probs, dtype=np.float64)
    for t in range(T):
        for u in range(U + 1):
            # blank transition (t,u) -> (t+1,u); final blank ends the path
            nxt = beta[t + 1, u] if t < T - 1 else (0.0 if u == U else NEG)
            g = alpha[t, u] + log_probs[t, u, blank] + nxt - logZ
            grad[t, u, blank] -= np.exp(g)
            if u < U:
                g = alpha[t, u] + log_probs[t, u, labels[u]] + beta[t, u + 1] - logZ
                grad[t, u, labels[u]] -= (1.0 + fastemit_lambda) * np.exp(g)
    return -logZ, grad


def rnnt_loss(logits: np.ndarray, labels: np.ndarray, logit_lengths: np.ndarray,
              label_lengths: np.ndarray, blank: int = 0, reduction: str = "mean",
              fastemit_lambda: float = 0.0):
    """Batched oracle. logits: (B, T, U+1, V) raw; labels: (B, U).
    Returns (losses or reduced loss, grad w.r.t. raw logits)."""
    B = logits.shape[0]
    losses = np.zeros((B,), np.float64)
    grads = np.zeros_like(logits, dtype=np.float64)
    for b in range(B):
        T, U = int(logit_lengths[b]), int(label_lengths[b])
        lp = log_softmax(logits[b].astype(np.float64))
        loss, g_lp = rnnt_loss_single(lp, labels[b], T, U, blank,
                                      fastemit_lambda=fastemit_lambda)
        losses[b] = loss
        # chain rule through log_softmax: dlogit = dlp - softmax * sum(dlp)
        sm = np.exp(lp)
        gsum = g_lp.sum(axis=-1, keepdims=True)
        g_logit = g_lp - sm * gsum
        # zero out padded region
        g_logit[T:] = 0.0
        g_logit[:, U + 1:] = 0.0
        grads[b] = g_logit
    if reduction == "mean":
        return losses.mean(), grads / B
    if reduction == "sum":
        return losses.sum(), grads
    return losses, grads
