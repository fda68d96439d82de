#!/usr/bin/env python
"""Build the raw HF-dataset shards the training pipeline consumes from a
plain (wav, transcript) manifest — the step the reference assumes was done
out-of-band (its pipeline starts from pre-built raw datasets holding
'input_values' float32 PCM + 'grapheme_labels', README.md:24-34).

Manifest: a TSV file with one `<wav_path>\t<transcript>` line per utterance.
Korean transcripts are decomposed to compatibility jamo and encoded with the
72-entry grapheme vocab (or --vocab_path).

Example:
  python scripts/prepare_manifest.py --manifest train.tsv \
      --out /data/raw --split train --num_shards 4
  # then: python train.py --hf_data_dirs /data/raw --pl_data_dir /data/logmel ...
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--manifest", required=True,
                   help="TSV: wav_path<TAB>transcript per line")
    p.add_argument("--out", required=True, help="output dataset root")
    p.add_argument("--split", default="train",
                   choices=["train", "dev", "eval_clean", "eval_other"])
    p.add_argument("--num_shards", type=int, default=1)
    p.add_argument("--vocab_path", default=None)
    p.add_argument("--sample_rate", type=int, default=16000)
    args = p.parse_args()

    from datasets import Dataset
    from rnntransducer_tpu.tokenizer import decompose_hangul, load_tokenizer
    from rnntransducer_tpu.utils.audio_io import read_wav

    tok = load_tokenizer(args.vocab_path, 72)

    wavs, ids, skipped = [], [], 0
    with open(args.manifest) as f:
        for ln, line in enumerate(f, 1):
            line = line.rstrip("\n")
            if not line:
                continue
            try:
                path, text = line.split("\t", 1)
                wav = read_wav(path, args.sample_rate)
                token_ids = tok.encode(decompose_hangul(text.strip()))
            except Exception as e:  # malformed row: skip loudly, keep going
                print(f"[skip] line {ln}: {e}")
                skipped += 1
                continue
            if len(wav) == 0 or len(token_ids) == 0:
                skipped += 1
                continue
            wavs.append(np.asarray(wav, np.float32))
            ids.append(token_ids)

    if not wavs:
        raise SystemExit("no usable utterances in the manifest")
    ds = Dataset.from_dict({"input_values": wavs, "input_ids": ids})
    for i in range(args.num_shards):
        shard = ds.shard(num_shards=args.num_shards, index=i)
        shard.save_to_disk(os.path.join(args.out, args.split, str(i)))
    print(f"wrote {len(ds)} utterances ({skipped} skipped) to "
          f"{args.out}/{args.split}/ in {args.num_shards} shard(s)")


if __name__ == "__main__":
    main()
