"""Time reduction (frame stacking) in the encoder: config validation,
composition parity at every reduction point, masking invariance, loss-path
lengths, greedy-decode wiring, and streaming == offline exactness.

The reference runs every encoder layer at the 10 ms frame rate
(``networks/encoder.py:67-75``); time reduction is the production RNN-T
throughput/memory lever this framework adds on top.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import rnntransducer_tpu as rt
from rnntransducer_tpu.config import (
    AudioConfig, Config, DataConfig, JointNetConfig, ModelConfig,
    PredNetConfig, TrainConfig, TransNetConfig,
)
from rnntransducer_tpu.decode import greedy_decode
from rnntransducer_tpu.decode.streaming import StreamingRecognizer
from rnntransducer_tpu.frontend import LogMelFrontend
from rnntransducer_tpu.models import RNNTransducer
from rnntransducer_tpu.models.cells import StackedRNN
from rnntransducer_tpu.models.encoder import AudioEncoder, stack_frames


def _tn(stride, layer, **kw):
    base = dict(input_size=6, hidden_size=8, output_size=5, num_layers=3,
                rnn_type="lstm", dropout=0.0, bidirectional=False,
                use_pallas_cells="off",
                time_reduction_stride=stride, time_reduction_layer=layer)
    base.update(kw)
    return TransNetConfig(**base)


def test_config_validation_and_lengths():
    with pytest.raises(ValueError, match="must be >= 1"):
        TransNetConfig(time_reduction_stride=0)
    with pytest.raises(ValueError, match="time_reduction_layer"):
        TransNetConfig(num_layers=3, time_reduction_stride=2,
                       time_reduction_layer=4)
    # layer bound only enforced when reduction is on
    TransNetConfig(num_layers=3, time_reduction_stride=1,
                   time_reduction_layer=7)

    cfg = _tn(3, 1)
    np.testing.assert_array_equal(
        np.asarray(cfg.output_lengths(jnp.array([0, 1, 3, 4, 7]))),
        [0, 1, 1, 2, 3])
    assert cfg.output_frames(7) == 3 and cfg.output_frames(9) == 3
    assert _tn(1, 0).output_frames(7) == 7


def test_stack_frames():
    x = jnp.arange(2 * 5 * 3, dtype=jnp.float32).reshape(2, 5, 3)
    y = stack_frames(x, 2)
    assert y.shape == (2, 3, 6)
    np.testing.assert_array_equal(np.asarray(y[0, 0]), np.asarray(
        jnp.concatenate([x[0, 0], x[0, 1]])))
    # ragged tail group zero-padded
    np.testing.assert_array_equal(np.asarray(y[1, 2, 3:]), np.zeros(3))
    assert stack_frames(x, 1) is x


@pytest.mark.parametrize("s,k,bidi", [(2, 0, False), (2, 1, False),
                                      (2, 2, True), (2, 3, False),
                                      (3, 1, False), (4, 2, True)])
def test_reduction_matches_manual_composition(s, k, bidi):
    """Encoder with (stride=s, layer=k) == manually composing plain stacks
    around an explicit stack_frames, using the encoder's own params.
    T=11 is ragged for every stride tested (tail-group zero padding)."""
    L, H, F = 3, 8, 6
    cfg = _tn(s, k, bidirectional=bidi)
    B, T = 2, 11
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(B, T, F).astype(np.float32))
    lengths = jnp.array([T, 5], jnp.int32)

    enc = AudioEncoder(cfg)
    params = enc.init(jax.random.PRNGKey(1), x, lengths)["params"]
    got, got_state = enc.apply({"params": params}, x, lengths,
                               deterministic=True)
    red_lengths = cfg.output_lengths(lengths)
    dirs = 2 if bidi else 1

    def run_stack(sub, input_size, num_layers, xs, ls):
        m = StackedRNN(input_size=input_size, hidden_size=H,
                       num_layers=num_layers, rnn_type="lstm", dropout=0.0,
                       bidirectional=bidi, scan_layers=cfg.scan_layers,
                       use_pallas="off")
        return m.apply({"params": sub}, xs, ls)

    if k == 0:
        # the encoder zeroes input frames past each row's length before
        # stacking (pad content must not leak into the last valid group)
        valid = np.arange(T)[None, :] < np.asarray(lengths)[:, None]
        xz = jnp.where(jnp.asarray(valid)[..., None], x, 0)
        out, state = run_stack(params["rnn"], s * F, L, stack_frames(xz, s),
                               red_lengths)
    elif k == L:
        out, state = run_stack(params["rnn"], F, L, x, lengths)
        out = stack_frames(out, s)
    else:
        out, st_pre = run_stack(params["rnn"], F, k, x, lengths)
        out, st_post = run_stack(params["rnn_post"], s * dirs * H, L - k,
                                 stack_frames(out, s), red_lengths)
        state = type(st_pre)(
            jnp.concatenate([st_pre.h, st_post.h], 0),
            jnp.concatenate([st_pre.c, st_post.c], 0))
    proj = params["out_proj"]
    want = out @ proj["kernel"] + proj["bias"]

    assert got.shape == (B, cfg.output_frames(T) if k < L
                         else -(-T // s), cfg.output_size)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(np.asarray(got_state.h),
                               np.asarray(state.h), rtol=1e-6, atol=1e-6)


@pytest.mark.parametrize("k", [0, 1, 3])
def test_reduction_masking_invariance(k):
    """Garbage in pad frames beyond a row's length must not change its
    valid outputs (groups straddling the boundary included).  k=0 is the
    regression case: raw inputs are the one unmasked surface, so stacking
    them without zeroing leaked pad content into the last valid group."""
    cfg = _tn(2, k)
    B, T = 2, 12
    rng = np.random.RandomState(3)
    x = rng.randn(B, T, 6).astype(np.float32)
    lengths = jnp.array([7, 12], jnp.int32)  # row 0: partial group at 6..7

    enc = AudioEncoder(cfg)
    params = enc.init(jax.random.PRNGKey(2), jnp.asarray(x), lengths)["params"]
    base, _ = enc.apply({"params": params}, jnp.asarray(x), lengths)
    x2 = x.copy()
    x2[0, 7:] = 99.0  # garbage strictly beyond row 0's length
    got, _ = enc.apply({"params": params}, jnp.asarray(x2), lengths)
    n0 = int(cfg.output_lengths(lengths)[0])
    np.testing.assert_allclose(np.asarray(got[0, :n0]),
                               np.asarray(base[0, :n0]), rtol=1e-6, atol=1e-6)


def _model_cfg(stride, layer, num_layers=2):
    return ModelConfig(
        transnet=TransNetConfig(input_size=80, hidden_size=16, output_size=12,
                                num_layers=num_layers, rnn_type="lstm",
                                dropout=0.0, bidirectional=False,
                                use_pallas_cells="off",
                                time_reduction_stride=stride,
                                time_reduction_layer=layer),
        prednet=PredNetConfig(embedding_size=32, hidden_size=16,
                              output_size=12, num_layers=1, rnn_type="lstm",
                              dropout=0.0),
        jointnet=JointNetConfig(num_classes=32),
    )


@pytest.mark.parametrize("joint_chunk_frames", [0, 8])
def test_train_step_with_reduction(joint_chunk_frames):
    """train_step runs with a reduced-rate lattice on both the full-logits
    and factored loss paths; loss is finite and the lattice length is the
    REDUCED length (a full-rate mask would index past the encoder output)."""
    from rnntransducer_tpu.train import TrainState, make_optimizer
    from rnntransducer_tpu.train.state import train_step

    cfg = Config(
        data=DataConfig(audio=AudioConfig(spec_augment=False)),
        model=_model_cfg(2, 1),
        train=TrainConfig(max_steps=2, per_device_train_batch_size=2,
                          precision="fp32", learning_rate=1e-3,
                          joint_chunk_frames=joint_chunk_frames),
    )
    tx = make_optimizer(cfg.train)
    state = TrainState.create(cfg)
    rng = np.random.RandomState(0)
    B, T, U = 2, 21, 5
    batch = {
        "feats": jnp.asarray(rng.randn(B, T, 80).astype(np.float32)),
        "feat_lengths": jnp.array([T, 13], jnp.int32),
        "text_in": jnp.asarray(
            np.pad(rng.randint(1, 32, (B, U)), ((0, 0), (1, 0)))
            .astype(np.int32)),
        "text_lengths": jnp.array([U + 1, U + 1], jnp.int32),
        "targets": jnp.asarray(rng.randint(1, 32, (B, U)).astype(np.int32)),
        "target_lengths": jnp.array([U, 3], jnp.int32),
    }
    losses = []
    for _ in range(3):
        state, metrics = train_step(cfg, tx, state, batch)
        losses.append(float(metrics["loss"]))
    assert all(np.isfinite(losses)), losses
    assert losses[-1] < losses[0]


def test_greedy_decode_respects_reduced_lengths():
    """Frames past a row's (full-rate) length must not influence its decode:
    decode(T frames, len=n) == decode(n frames padded to T, len=n)."""
    cfg = _model_cfg(2, 1)
    model = RNNTransducer(cfg)
    rng = np.random.RandomState(4)
    T, n = 20, 13
    x = rng.randn(1, T, 80).astype(np.float32) * 2
    variables = model.init(jax.random.PRNGKey(3), jnp.asarray(x),
                           jnp.array([T]), jnp.zeros((1, 2), jnp.int32),
                           jnp.array([2]))
    toks_a, len_a = greedy_decode(model, variables, jnp.asarray(x),
                                  jnp.array([n]))
    x2 = x.copy()
    x2[0, n:] = 99.0
    toks_b, len_b = greedy_decode(model, variables, jnp.asarray(x2),
                                  jnp.array([n]))
    assert int(len_a[0]) == int(len_b[0])
    np.testing.assert_array_equal(np.asarray(toks_a), np.asarray(toks_b))


@pytest.mark.parametrize("chunk_frames", [8, 16])
def test_streaming_with_reduction_matches_offline(chunk_frames):
    """Chunked streaming over a time-reduced encoder == offline greedy
    (chunk multiple of stride -> groups align across chunk boundaries)."""
    cfg = _model_cfg(2, 1)
    model = RNNTransducer(cfg)
    acfg = AudioConfig(normalize=False)
    rng = np.random.RandomState(5)
    wav = (rng.randn(16000) * 2).astype(np.float32)
    variables = model.init(jax.random.PRNGKey(6), jnp.zeros((1, 4, 80)),
                           jnp.array([4]), jnp.zeros((1, 2), jnp.int32),
                           jnp.array([2]))

    feats, lengths = LogMelFrontend(acfg)(jnp.asarray(wav[None]))
    toks, lens = greedy_decode(model, variables, feats, lengths,
                               max_output_len=512)
    want = list(np.asarray(toks)[0, :int(lens[0])])

    rec = StreamingRecognizer(model, variables, acfg,
                              chunk_frames=chunk_frames, normalize="none")
    out = []
    for s in range(0, len(wav), 1600):
        out.extend(rec.feed(wav[s:s + 1600]))
    out.extend(rec.flush())
    assert out == want, (chunk_frames, out[:20], want[:20])


def test_streaming_rejects_misaligned_chunk():
    cfg = _model_cfg(2, 1)
    model = RNNTransducer(cfg)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 4, 80)),
                           jnp.array([4]), jnp.zeros((1, 2), jnp.int32),
                           jnp.array([2]))
    with pytest.raises(ValueError, match="multiple of"):
        StreamingRecognizer(model, variables, AudioConfig(), chunk_frames=15)

    from rnntransducer_tpu.decode.session_batch import BatchedStreamingRunner
    with pytest.raises(ValueError, match="multiple of"):
        BatchedStreamingRunner(model, variables, AudioConfig(),
                               chunk_frames=15)


def test_wavefront_rejects_reduction():
    from rnntransducer_tpu.parallel import make_time_mesh, wavefront_encode
    cfg = _tn(2, 1)
    with pytest.raises(ValueError, match="time reduction"):
        wavefront_encode({}, cfg, jnp.zeros((1, 8, 6)), jnp.ones((1,)),
                         make_time_mesh())
