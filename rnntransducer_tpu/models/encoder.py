"""Audio encoder ("transcription network").

Capability-equivalent to the reference's ``AudioTransNet``
(``networks/encoder.py:20-108``): multi-layer (bi)directional LSTM/GRU/RNN over
log-mel frames followed by an output projection — but built on masked
``lax.scan`` cells (static shapes) instead of sort/pack_padded/cuDNN/unsort.
The returned ``RNNState`` doubles as the streaming-chunk carry (the reference
has no streaming encoder API; its README bills the model as streaming-capable
via the decoder's hidden-state threading only).

Time reduction (``cfg.time_reduction_stride > 1``): after
``cfg.time_reduction_layer`` layers, every ``stride`` consecutive frames are
stacked into one (feature dim x stride) so the remaining layers — and
everything downstream: joint lattice, loss, decode scans — run at 1/stride
the frame rate.  Callers map frame counts with ``cfg.output_lengths``.
A reduced group is valid if ANY of its frames is valid; invalid frames
inside a partially-valid group contribute zeros (the masked scans emit
zeros past each row's length), so chunked/streaming evaluation matches
offline exactly when the chunk size is a multiple of the stride.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp
from flax import linen as nn

from rnntransducer_tpu.config import TransNetConfig
from rnntransducer_tpu.models.cells import FastDropout, RNNState, StackedRNN
from rnntransducer_tpu.utils.masking import length_mask


def stack_frames(x: jnp.ndarray, stride: int) -> jnp.ndarray:
    """(B, T, F) -> (B, ceil(T/stride), stride*F): concatenate each group of
    ``stride`` consecutive frames along features (zero-padding a ragged
    tail group)."""
    if stride <= 1:
        return x
    B, T, F = x.shape
    pad = (-T) % stride
    if pad:
        x = jnp.pad(x, ((0, 0), (0, pad), (0, 0)))
    return x.reshape(B, (T + pad) // stride, stride * F)


class AudioEncoder(nn.Module):
    cfg: TransNetConfig
    unroll: int = 1

    def setup(self):
        cfg = self.cfg
        stride = cfg.time_reduction_stride
        k = cfg.time_reduction_layer if stride > 1 else 0
        dirs = 2 if cfg.bidirectional else 1

        def make_stack(input_size, num_layers, name):
            return StackedRNN(
                input_size=input_size,
                hidden_size=cfg.hidden_size,
                num_layers=num_layers,
                rnn_type=cfg.rnn_type.lower(),
                dropout=cfg.dropout,
                bidirectional=cfg.bidirectional,
                unroll=self.unroll,
                remat=cfg.remat,
                scan_layers=cfg.scan_layers,
                use_pallas=cfg.use_pallas_cells,
                name=name,
            )

        # layer split: "rnn" = layers before the reduction point (all of them
        # when stride==1 or the reduction sits at layer 0 / num_layers),
        # "rnn_post" = layers after it, fed stacked (stride x wider) frames
        if stride > 1 and 0 < k < cfg.num_layers:
            self.rnn = make_stack(cfg.input_size, k, "rnn")
            self.rnn_post = make_stack(stride * dirs * cfg.hidden_size,
                                       cfg.num_layers - k, "rnn_post")
        else:
            in_size = cfg.input_size * (stride if stride > 1 and k == 0 else 1)
            self.rnn = make_stack(in_size, cfg.num_layers, "rnn")
            self.rnn_post = None
        # inter-layer dropout for the stack boundary (torch semantics:
        # dropout on every layer's output except the last's)
        self.boundary_drop = (FastDropout(cfg.dropout)
                              if self.rnn_post is not None and cfg.dropout > 0.0
                              else None)
        # reference: out_proj = Linear(2H if bidir else H, output_size)
        # (networks/encoder.py:76,103)
        self.out_proj = nn.Dense(self.cfg.output_size)

    def __call__(self, inputs, lengths=None, initial_state: Optional[RNNState] = None,
                 deterministic: bool = True) -> Tuple[jnp.ndarray, RNNState]:
        """inputs: (B, T, n_mels) log-mel frames. Returns
        ((B, T', output_size), carry state for streaming chunks) where
        T' = cfg.output_frames(T) (== T unless time reduction is on)."""
        cfg = self.cfg
        stride = cfg.time_reduction_stride
        if stride <= 1:
            out, state = self.rnn(inputs, lengths, initial_state, deterministic)
            return self.out_proj(out), state

        k = cfg.time_reduction_layer
        red_lengths = None if lengths is None else cfg.output_lengths(
            lengths.astype(jnp.int32))
        if k == 0:
            # zero frames past each row's length BEFORE stacking: the last
            # valid group may straddle the boundary, and raw pad content
            # must not leak into it (at k > 0 the masked scans already emit
            # zeros there; the inputs are the one unmasked surface)
            if lengths is not None:
                valid = length_mask(lengths, inputs.shape[1])
                inputs = jnp.where(valid[..., None], inputs, 0)
            out, state = self.rnn(stack_frames(inputs, stride), red_lengths,
                                  initial_state, deterministic)
        elif k == cfg.num_layers:
            out, state = self.rnn(inputs, lengths, initial_state, deterministic)
            out = stack_frames(out, stride)
        else:
            pre_state = post_state = None
            if initial_state is not None:
                pre_state = RNNState(
                    initial_state.h[:k],
                    None if initial_state.c is None else initial_state.c[:k])
                post_state = RNNState(
                    initial_state.h[k:],
                    None if initial_state.c is None else initial_state.c[k:])
            out, s_pre = self.rnn(inputs, lengths, pre_state, deterministic)
            out = stack_frames(out, stride)
            if self.boundary_drop is not None:
                out = self.boundary_drop(out, deterministic=deterministic)
            out, s_post = self.rnn_post(out, red_lengths, post_state,
                                        deterministic)
            state = RNNState(
                jnp.concatenate([s_pre.h, s_post.h], axis=0),
                None if s_pre.c is None
                else jnp.concatenate([s_pre.c, s_post.c], axis=0))
        return self.out_proj(out), state
