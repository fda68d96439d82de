"""Grapheme tokenizer (Wav2Vec2CTC-vocab-compatible, dependency-free).

The reference uses ``transformers.Wav2Vec2CTCTokenizer(vocab_file=...)``
(``model.py:24``) over a 72-entry Korean-jamo vocab (``README.md:41``,
``config/config.json:13,21``) with ``blank == pad == 0`` (``model.py:25``).
This module re-implements that surface natively so the framework has no
tokenizer dependency on torch/transformers:

* loads/saves the same ``vocab.json`` format ({token: id}),
* ``|`` is the word-delimiter token (space on decode),
* ``decode``/``batch_decode`` mirror Wav2Vec2CTCTokenizer semantics
  (consecutive-duplicate grouping, special-token skipping).
"""

from __future__ import annotations

import json
from typing import Iterable, List, Sequence

PAD = "<pad>"
UNK = "<unk>"
BOS = "<s>"
EOS = "</s>"
WORD_DELIMITER = "|"

# Korean compatibility jamo: consonants U+3131..U+314E, vowels U+314F..U+3163.
_JAMO = [chr(c) for c in range(0x3131, 0x3164)]


def build_default_vocab(target_size: int = 72) -> dict:
    """Default Korean-jamo vocab: 4 specials + word delimiter + 51 compat jamo,
    padded with reserved tokens up to ``target_size`` (the reference's vocab
    has 72 entries; its exact token list is data, not code)."""
    tokens = [PAD, UNK, BOS, EOS, WORD_DELIMITER] + _JAMO
    if len(tokens) > target_size:
        raise ValueError(f"target_size {target_size} < base vocab {len(tokens)}")
    tokens += [f"<extra_{i}>" for i in range(target_size - len(tokens))]
    return {tok: i for i, tok in enumerate(tokens)}


class GraphemeTokenizer:
    """CTC/RNN-T grapheme tokenizer with blank == pad == id 0."""

    def __init__(self, vocab: dict, word_delimiter_token: str = WORD_DELIMITER):
        self.vocab = dict(vocab)
        self.ids_to_tokens = {i: t for t, i in self.vocab.items()}
        if len(self.ids_to_tokens) != len(self.vocab):
            raise ValueError("vocab has duplicate ids")
        self.word_delimiter_token = word_delimiter_token
        self.pad_token_id = self.vocab.get(PAD, 0)
        self.blank_token_id = self.pad_token_id  # model.py:25
        self.unk_token_id = self.vocab.get(UNK, self.pad_token_id)
        self.bos_token_id = self.vocab.get(BOS, 2)
        self.eos_token_id = self.vocab.get(EOS, 3)
        self.word_delimiter_token_id = self.vocab.get(word_delimiter_token)
        self._special_ids = {
            self.vocab[t] for t in (PAD, UNK, BOS, EOS) if t in self.vocab
        } | {i for t, i in self.vocab.items() if t.startswith("<extra_")}

    # -- construction ------------------------------------------------------
    @classmethod
    def from_file(cls, vocab_path: str) -> "GraphemeTokenizer":
        with open(vocab_path) as f:
            return cls(json.load(f))

    @classmethod
    def default(cls, vocab_size: int = 72) -> "GraphemeTokenizer":
        return cls(build_default_vocab(vocab_size))

    def save(self, vocab_path: str) -> None:
        with open(vocab_path, "w") as f:
            json.dump(self.vocab, f, ensure_ascii=False, indent=1)

    # -- core API ----------------------------------------------------------
    def __len__(self) -> int:
        return len(self.vocab)

    @property
    def vocab_size(self) -> int:
        return len(self.vocab)

    def encode(self, text: str) -> List[int]:
        """Text -> grapheme ids. Spaces map to the word delimiter."""
        ids = []
        for ch in text:
            if ch == " ":
                ids.append(self.word_delimiter_token_id)
            else:
                ids.append(self.vocab.get(ch, self.unk_token_id))
        return ids

    def decode(
        self,
        token_ids: Sequence[int],
        group_tokens: bool = True,
        skip_special_tokens: bool = True,
    ) -> str:
        """Ids -> text. Mirrors Wav2Vec2CTCTokenizer.decode: consecutive
        duplicates are grouped (the reference decodes RNN-T outputs through
        the CTC tokenizer, model.py:77-78), specials are dropped, ``|`` maps
        to a space, and whitespace is collapsed."""
        toks: List[str] = []
        prev = None
        for i in token_ids:
            i = int(i)
            if group_tokens and prev is not None and i == prev:
                continue
            prev = i
            if skip_special_tokens and i in self._special_ids:
                continue
            tok = self.ids_to_tokens.get(i)
            if tok is None:
                continue
            toks.append(" " if tok == self.word_delimiter_token else tok)
        return " ".join("".join(toks).split())

    def batch_decode(self, batch: Iterable[Sequence[int]], **kw) -> List[str]:
        return [self.decode(ids, **kw) for ids in batch]
