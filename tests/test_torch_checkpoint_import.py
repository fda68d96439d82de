"""Real-model parity: import a torch-constructed RNNTransducer checkpoint
(the reference's module tree: ``model.py:27``, ``networks/transducer.py:35-39``,
``networks/encoder.py:67-76``, ``networks/decoder.py:69-80``) into the flax
model and assert lattice-logit parity <= 1e-4 and greedy-decode parity
(VERDICT round-1 item #3).

The torch model here is built from torch primitives with the reference's
exact structure and state_dict key layout (encoder.rnn.*, decoder.embedding.*,
fc.*) — the reference package itself is not importable in this image (its
pytorch_lightning / pyctcdecode deps are absent).
"""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from rnntransducer_tpu.config import (
    JointNetConfig, ModelConfig, PredNetConfig, TransNetConfig,
)
from rnntransducer_tpu.decode import greedy_decode
from rnntransducer_tpu.models import RNNTransducer
from rnntransducer_tpu.utils.torch_import import (
    load_torch_checkpoint, params_from_torch_state_dict,
)

V = 40  # vocab


class _TorchEncoder(torch.nn.Module):
    """AudioTransNet equivalent (networks/encoder.py:67-76,93-103)."""

    def __init__(self, input_size, hidden, out, layers, rnn_type, bidir):
        super().__init__()
        cls = {"lstm": torch.nn.LSTM, "gru": torch.nn.GRU}[rnn_type]
        self.rnn = cls(input_size, hidden, num_layers=layers,
                       batch_first=True, bidirectional=bidir)
        self.out_proj = torch.nn.Linear((2 if bidir else 1) * hidden, out)

    def forward(self, x, lengths=None):
        if lengths is not None:
            sl, idx = torch.sort(torch.as_tensor(lengths), descending=True)
            packed = torch.nn.utils.rnn.pack_padded_sequence(
                x[idx], sl, batch_first=True)
            out, _ = self.rnn(packed)
            out, _ = torch.nn.utils.rnn.pad_packed_sequence(
                out, batch_first=True, total_length=x.shape[1])
            _, deidx = torch.sort(idx)
            out = out[deidx]
        else:
            out, _ = self.rnn(x)
        return self.out_proj(out)


class _TorchPredNet(torch.nn.Module):
    """TextPredNet equivalent (networks/decoder.py:69-80)."""

    def __init__(self, vocab, hidden, out, layers, rnn_type):
        super().__init__()
        cls = {"lstm": torch.nn.LSTM, "gru": torch.nn.GRU}[rnn_type]
        self.embedding = torch.nn.Embedding(vocab, hidden, padding_idx=0)
        self.rnn = cls(hidden, hidden, num_layers=layers, batch_first=True)
        self.out_proj = torch.nn.Linear(hidden, out)

    def forward(self, tokens, hidden=None):
        out, hidden = self.rnn(self.embedding(tokens), hidden)
        return self.out_proj(out), hidden


class _TorchRNNT(torch.nn.Module):
    """JointNet equivalent (networks/transducer.py:35-71): broadcast,
    concat, GELU(tanh), fc. State_dict keys match the reference layout."""

    def __init__(self, enc_kw, dec_kw, num_classes):
        super().__init__()
        self.encoder = _TorchEncoder(**enc_kw)
        self.decoder = _TorchPredNet(**dec_kw)
        self.act = torch.nn.GELU(approximate="tanh")
        self.fc = torch.nn.Linear(
            enc_kw["out"] + dec_kw["out"], num_classes)

    def joint(self, enc, dec):
        if enc.dim() == 3 and dec.dim() == 3:
            T, U = enc.size(1), dec.size(1)
            enc = enc.unsqueeze(2).repeat(1, 1, U, 1)
            dec = dec.unsqueeze(1).repeat(1, T, 1, 1)
        return self.fc(self.act(torch.cat((enc, dec), dim=-1)))

    def forward(self, feats, feat_lengths, text_in):
        enc = self.encoder(feats, feat_lengths)
        dec, _ = self.decoder(text_in)
        return self.joint(enc, dec)


def _make_pair(enc_type="gru", enc_layers=3, scan_layers=True,
               dec_layers=2, hidden=16, out=12, input_size=8, seed=0):
    torch.manual_seed(seed)
    tm = _TorchRNNT(
        dict(input_size=input_size, hidden=hidden, out=out,
             layers=enc_layers, rnn_type=enc_type, bidir=True),
        dict(vocab=V, hidden=hidden, out=out, layers=dec_layers,
             rnn_type="lstm"),
        num_classes=V)
    cfg = ModelConfig(
        transnet=TransNetConfig(input_size=input_size, hidden_size=hidden,
                                output_size=out, num_layers=enc_layers,
                                rnn_type=enc_type, dropout=0.0,
                                bidirectional=True, scan_layers=scan_layers),
        prednet=PredNetConfig(embedding_size=V, hidden_size=hidden,
                              output_size=out, num_layers=dec_layers,
                              rnn_type="lstm", dropout=0.0),
        jointnet=JointNetConfig(num_classes=V),
    )
    params = params_from_torch_state_dict(tm.state_dict(), cfg)
    return tm, RNNTransducer(cfg), params


def _batch(B=3, T=12, U=5, input_size=8, seed=1):
    rng = np.random.RandomState(seed)
    feats = rng.randn(B, T, input_size).astype(np.float32)
    lengths = np.array([T, T - 3, T // 2][:B], np.int64)
    text_in = np.concatenate(
        [np.zeros((B, 1), np.int64), rng.randint(1, V, (B, U))], axis=1)
    return feats, lengths, text_in


@pytest.mark.parametrize("enc_type,scan_layers", [("gru", True),
                                                  ("lstm", False)])
def test_lattice_logit_parity(enc_type, scan_layers):
    tm, fm, params = _make_pair(enc_type=enc_type, scan_layers=scan_layers)
    feats, lengths, text_in = _batch()
    with torch.no_grad():
        want = tm(torch.from_numpy(feats), lengths,
                  torch.from_numpy(text_in)).numpy()
    got = np.asarray(fm.apply(
        {"params": params}, jnp.asarray(feats),
        jnp.asarray(lengths, jnp.int32), jnp.asarray(text_in, jnp.int32),
        jnp.asarray(np.full((3,), text_in.shape[1]), jnp.int32)))
    assert got.shape == want.shape
    # compare only lattice rows within each utterance's true length — frames
    # beyond length are zeroed by the mask in ours, garbage-free but not
    # defined to match torch's pad_packed zeros after the out_proj bias
    for b, L in enumerate(lengths):
        np.testing.assert_allclose(got[b, :L], want[b, :L], atol=1e-4)


def test_greedy_decode_parity():
    """Imported params must produce identical greedy transcripts to a faithful
    torch implementation of recognize_greedy (transducer.py:95-145)."""
    tm, fm, params = _make_pair(seed=3)
    B, T = 2, 10
    rng = np.random.RandomState(4)
    feats = rng.randn(B, T, 8).astype(np.float32)
    lengths = np.full((B,), T, np.int64)

    toks, lens = greedy_decode(fm, {"params": params}, jnp.asarray(feats),
                               jnp.asarray(lengths, jnp.int32), blank_id=0,
                               max_symbols=3, max_output_len=32)
    toks, lens = np.asarray(toks), np.asarray(lens)

    with torch.no_grad():
        enc = tm.encoder(torch.from_numpy(feats))
        for b in range(B):
            dec_out, hidden = tm.decoder(torch.zeros((1, 1), dtype=torch.long))
            out, last = [], 0
            for t in range(T):
                u = 0
                while u < 3:
                    logits = tm.joint(enc[b:b + 1, t], dec_out[:, 0])
                    tok = int(logits.argmax(-1))
                    if tok == 0:
                        break
                    if tok != last:
                        out.append(tok)
                        last = tok
                    dec_out, hidden = tm.decoder(
                        torch.tensor([[tok]], dtype=torch.long), hidden)
                    u += 1
            assert out == toks[b, :lens[b]].tolist(), f"utt {b}"


def test_lightning_prefix_and_ckpt_file(tmp_path):
    """jointnet.-prefixed Lightning state_dicts and .ckpt files load to the
    same params as the bare state_dict."""
    tm, fm, params = _make_pair(seed=5)
    sd = tm.state_dict()
    wrapped = {f"jointnet.{k}": v for k, v in sd.items()}
    mcfg = ModelConfig(
        transnet=TransNetConfig(input_size=8, hidden_size=16, output_size=12,
                                num_layers=3, rnn_type="gru", dropout=0.0,
                                bidirectional=True, scan_layers=True),
        prednet=PredNetConfig(embedding_size=V, hidden_size=16,
                              output_size=12, num_layers=2, rnn_type="lstm",
                              dropout=0.0),
        jointnet=JointNetConfig(num_classes=V))
    p2 = params_from_torch_state_dict(wrapped, mcfg)
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(p2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    path = tmp_path / "ref.ckpt"
    torch.save({"state_dict": wrapped, "epoch": 7}, path)
    p3 = load_torch_checkpoint(str(path), mcfg)
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(p3)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_shape_mismatch_raises():
    tm, fm, _ = _make_pair(seed=6)
    bad = ModelConfig(
        transnet=TransNetConfig(input_size=8, hidden_size=16, output_size=12,
                                num_layers=3, rnn_type="gru", dropout=0.0,
                                bidirectional=True, scan_layers=True),
        # self-consistent (embedding covers num_classes — ModelConfig
        # validates that at construction now) but one class larger than the
        # checkpoint's vocab: the importer's joint-fc shape check must fire
        prednet=PredNetConfig(embedding_size=V + 1, hidden_size=16,
                              output_size=12, num_layers=2, rnn_type="lstm",
                              dropout=0.0),
        jointnet=JointNetConfig(num_classes=V + 1))
    with pytest.raises(ValueError, match="does not match"):
        params_from_torch_state_dict(tm.state_dict(), bad)


def test_convert_to_orbax_roundtrip(tmp_path):
    """torch .ckpt -> orbax dir -> CheckpointManager.restore gives the same
    forward as the directly-imported params."""
    from rnntransducer_tpu.config import (
        AudioConfig, Config, DataConfig, TrainConfig,
    )
    from rnntransducer_tpu.train.checkpoint import CheckpointManager
    from rnntransducer_tpu.train.state import TrainState
    from rnntransducer_tpu.utils.torch_import import convert_to_orbax

    tm, fm, params = _make_pair(seed=8)
    ckpt = tmp_path / "ref.ckpt"
    torch.save({"state_dict": {f"jointnet.{k}": v
                               for k, v in tm.state_dict().items()}}, ckpt)
    cfg = Config(data=DataConfig(audio=AudioConfig()), model=fm.cfg,
                 train=TrainConfig(checkpoint_dir=str(tmp_path / "orbax")))
    out = convert_to_orbax(str(ckpt), cfg, str(tmp_path / "orbax"))

    mgr = CheckpointManager(out)
    state = mgr.restore(TrainState.create(cfg), step=0)
    mgr.close()
    feats, lengths, text_in = _batch()
    a = fm.apply({"params": params}, jnp.asarray(feats),
                 jnp.asarray(lengths, jnp.int32), jnp.asarray(text_in, jnp.int32),
                 jnp.asarray(np.full((3,), text_in.shape[1]), jnp.int32))
    b = fm.apply({"params": state.params}, jnp.asarray(feats),
                 jnp.asarray(lengths, jnp.int32), jnp.asarray(text_in, jnp.int32),
                 jnp.asarray(np.full((3,), text_in.shape[1]), jnp.int32))
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)
