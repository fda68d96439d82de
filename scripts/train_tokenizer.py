#!/usr/bin/env python
"""Train a subword (BPE) tokenizer from transcripts.

Beyond-reference capability: the reference ships a fixed 72-jamo grapheme
vocab (/root/reference/config/config.json:13); this trains a subword vocab of
any size on your corpus, saved as a single JSON every CLI accepts via
--vocab_path / config.vocab_path (format sniffed automatically). Set
model.jointnet.num_classes and model.prednet.embedding_size to the printed
vocab size when configuring the model.

Input: a text file with one transcript per line, or a TSV manifest
(wav_path<TAB>transcript — the prepare_manifest.py format, pass --manifest).

Example:
  python scripts/train_tokenizer.py --text corpus.txt --vocab_size 1024 \
      --out bpe_1024.json
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser(description=__doc__)
    src = p.add_mutually_exclusive_group(required=True)
    src.add_argument("--text", help="one transcript per line")
    src.add_argument("--manifest", help="wav_path<TAB>transcript TSV")
    p.add_argument("--vocab_size", type=int, required=True)
    p.add_argument("--normalize", default="jamo", choices=["jamo", "none"],
                   help="'jamo' decomposes Hangul first (the data-prep "
                        "convention); 'none' models raw text")
    p.add_argument("--out", required=True, help="output tokenizer JSON")
    args = p.parse_args()

    from rnntransducer_tpu.tokenizer import train_bpe

    def lines():
        with open(args.text or args.manifest) as f:
            for line in f:
                line = line.rstrip("\n")
                if not line:
                    continue
                if args.manifest:
                    parts = line.split("\t", 1)
                    if len(parts) != 2:
                        continue
                    line = parts[1]
                yield line

    tok = train_bpe(lines(), args.vocab_size, normalize=args.normalize)
    tok.save(args.out)
    print(f"trained {len(tok)} pieces ({len(tok.merges)} merges) -> "
          f"{args.out}; set model.jointnet.num_classes = "
          f"model.prednet.embedding_size = {len(tok)}")


if __name__ == "__main__":
    main()
