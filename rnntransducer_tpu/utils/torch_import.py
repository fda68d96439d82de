"""Torch -> flax checkpoint importer.

Loads a reference PyTorch(-Lightning) RNNTransducer checkpoint
(``/root/reference/inference.py:19-25``: ``RNNTransducer.load_from_checkpoint``
over the module tree built at ``model.py:27`` / ``networks/transducer.py:35-39``)
into this framework's flax param tree, so a model trained with the reference
can be served/evaluated/fine-tuned here with demonstrable numeric parity
(tests/test_torch_checkpoint_import.py).

Weight layout mapping (torch -> ours):

* ``torch.nn.{LSTM,GRU,RNN}`` ``weight_ih_l{k}[_reverse]`` is (G*H, in);
  ours is ``w_ih`` (in, G*H) — transpose. Gate order is identical by
  construction (i,f,g,o / r,z,n — ``models/cells.py:16-19``); the
  ``_reverse`` suffix maps to the ``bwd`` direction.
* With ``scan_layers=True`` layers 1..L-1 live under ``stack/{fwd,bwd}``
  with a leading (L-1) layer axis — stacked here.
* ``torch.nn.Linear.weight`` is (out, in); flax ``Dense.kernel`` is (in, out).
* ``torch.nn.Embedding.weight`` is (V, H) in both.

No torch import happens at module import time — only inside the loaders — so
the package stays importable without torch.
"""

from __future__ import annotations

import os
from typing import Dict, Mapping

import numpy as np

from rnntransducer_tpu.config import Config, ModelConfig

GATES = {"lstm": 4, "gru": 3, "rnn": 1}


def _np(x) -> np.ndarray:
    if hasattr(x, "detach"):  # torch tensor
        x = x.detach().cpu().numpy()
    return np.asarray(x, np.float32)


def strip_prefix(state_dict: Mapping) -> Dict[str, np.ndarray]:
    """Normalizes key prefixes: the Lightning module nests everything under
    ``jointnet.`` (``model.py:27``); bare JointNet state_dicts do not."""
    anchor = "encoder.rnn.weight_ih_l0"
    prefix = None
    for k in state_dict:
        if k.endswith(anchor):
            prefix = k[: len(k) - len(anchor)]
            break
    if prefix is None:
        raise KeyError(
            f"no '*{anchor}' key — not an RNNTransducer state_dict? "
            f"got keys like {list(state_dict)[:5]}")
    return {k[len(prefix):]: _np(v) for k, v in state_dict.items()
            if k.startswith(prefix)}


def _rnn_params(sd: Dict[str, np.ndarray], prefix: str, num_layers: int,
                bidirectional: bool, scan_layers: bool) -> Dict:
    def layer(l: int, reverse: bool) -> Dict[str, np.ndarray]:
        sfx = "_reverse" if reverse else ""
        return {
            "w_ih": np.ascontiguousarray(sd[f"{prefix}weight_ih_l{l}{sfx}"].T),
            "w_hh": np.ascontiguousarray(sd[f"{prefix}weight_hh_l{l}{sfx}"].T),
            "b_ih": sd[f"{prefix}bias_ih_l{l}{sfx}"],
            "b_hh": sd[f"{prefix}bias_hh_l{l}{sfx}"],
        }

    out: Dict = {"fwd_0": layer(0, False)}
    if bidirectional:
        out["bwd_0"] = layer(0, True)
    if num_layers == 1:
        return out
    rest = range(1, num_layers)
    if scan_layers:
        stack: Dict = {"fwd": _stack([layer(l, False) for l in rest])}
        if bidirectional:
            stack["bwd"] = _stack([layer(l, True) for l in rest])
        out["stack"] = stack
    else:
        for l in rest:
            out[f"fwd_{l}"] = layer(l, False)
            if bidirectional:
                out[f"bwd_{l}"] = layer(l, True)
    return out


def _stack(layers):
    return {k: np.stack([l[k] for l in layers]) for k in layers[0]}


def _dense(sd: Dict[str, np.ndarray], prefix: str) -> Dict[str, np.ndarray]:
    return {"kernel": np.ascontiguousarray(sd[f"{prefix}weight"].T),
            "bias": sd[f"{prefix}bias"]}


def params_from_torch_state_dict(state_dict: Mapping,
                                 model_cfg: ModelConfig) -> Dict:
    """JointNet/Lightning state_dict -> flax params tree for RNNTransducer.

    Validates the shapes implied by ``model_cfg`` against the checkpoint and
    raises with a diagnostic on mismatch (wrong config for the checkpoint).
    """
    sd = strip_prefix(state_dict)
    t, p, j = model_cfg.transnet, model_cfg.prednet, model_cfg.jointnet
    if j.combine != "concat":
        raise ValueError(
            "reference checkpoints use the concat joint "
            f"(networks/transducer.py:64-67); got combine={j.combine!r}")

    params = {
        "encoder": {
            "rnn": _rnn_params(sd, "encoder.rnn.", t.num_layers,
                               t.bidirectional, t.scan_layers
                               and t.num_layers > 1),
            "out_proj": _dense(sd, "encoder.out_proj."),
        },
        "prednet": {
            "embedding": {"embedding": sd["decoder.embedding.weight"]},
            "rnn": _rnn_params(sd, "decoder.rnn.", p.num_layers,
                               bidirectional=False, scan_layers=False),
            "out_proj": _dense(sd, "decoder.out_proj."),
        },
        "joint": {"fc": _dense(sd, "fc.")},
    }

    checks = [
        ("encoder w_ih_l0",
         params["encoder"]["rnn"]["fwd_0"]["w_ih"].shape,
         (t.input_size, GATES[t.rnn_type.lower()] * t.hidden_size)),
        ("encoder out_proj",
         params["encoder"]["out_proj"]["kernel"].shape,
         ((2 if t.bidirectional else 1) * t.hidden_size, t.output_size)),
        ("embedding",
         params["prednet"]["embedding"]["embedding"].shape,
         (p.embedding_size, p.hidden_size)),
        ("prednet out_proj",
         params["prednet"]["out_proj"]["kernel"].shape,
         (p.hidden_size, p.output_size)),
        ("joint fc",
         params["joint"]["fc"]["kernel"].shape,
         (t.output_size + p.output_size, j.num_classes)),
    ]
    for name, got, want in checks:
        if tuple(got) != tuple(want):
            raise ValueError(
                f"{name}: checkpoint shape {tuple(got)} != config shape "
                f"{tuple(want)} — the ModelConfig does not match this "
                "checkpoint")
    return params


def load_torch_checkpoint(path: str, model_cfg: ModelConfig) -> Dict:
    """Loads a .ckpt/.pt file (Lightning checkpoint with a ``state_dict``
    entry, or a bare state_dict) and returns the flax params tree."""
    import torch

    blob = torch.load(path, map_location="cpu", weights_only=False)
    sd = blob.get("state_dict", blob) if isinstance(blob, dict) else blob
    return params_from_torch_state_dict(sd, model_cfg)


def convert_to_orbax(torch_ckpt: str, cfg: Config, out_dir: str) -> str:
    """Imports a torch checkpoint and writes a step-0 orbax checkpoint that
    train.py --resume / inference.py / serve.py can restore directly."""
    import jax

    from rnntransducer_tpu.train.checkpoint import CheckpointManager
    from rnntransducer_tpu.train.state import TrainState

    params = load_torch_checkpoint(torch_ckpt, cfg.model)
    state = TrainState.create(cfg)
    state = state.replace(params=jax.tree.map(
        lambda ref, new: np.asarray(new, ref.dtype), state.params, params))
    mgr = CheckpointManager(out_dir, save_top_k=1)
    mgr.save(0, state, metrics={}, config=cfg)
    mgr.close()
    return out_dir


def main(argv=None):
    import argparse

    ap = argparse.ArgumentParser(
        description="Convert a reference PyTorch RNNTransducer checkpoint to "
                    "an orbax checkpoint directory for this framework.")
    ap.add_argument("--torch_ckpt", required=True)
    ap.add_argument("--config", required=True,
                    help="reference-schema config.json for the checkpoint")
    ap.add_argument("--out_dir", required=True)
    args = ap.parse_args(argv)
    cfg = Config.from_json(args.config)
    convert_to_orbax(args.torch_ckpt, cfg, args.out_dir)
    print(f"wrote orbax checkpoint (step 0) to {args.out_dir}")


if __name__ == "__main__":
    main()
