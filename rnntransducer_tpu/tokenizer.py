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
                if self.word_delimiter_token_id is None:
                    # fail here, not as a TypeError deep in the data
                    # pipeline when a None id hits an int array
                    raise ValueError(
                        "text contains spaces but the vocab has no "
                        f"word-delimiter token {self.word_delimiter_token!r}")
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


# -- Hangul syllable <-> jamo -----------------------------------------------
# The reference's KsponSpeech prep produced jamo-level labels (README.md:41:
# 72 graphemes, syllables decomposed). These helpers make encode()/decode()
# usable on real Korean text: syllables decompose to compatibility jamo for
# encoding, and jamo sequences re-compose to syllables for display.

_CHO = [0x3131, 0x3132, 0x3134, 0x3137, 0x3138, 0x3139, 0x3141, 0x3142,
        0x3143, 0x3145, 0x3146, 0x3147, 0x3148, 0x3149, 0x314A, 0x314B,
        0x314C, 0x314D, 0x314E]  # 19 initials (compat jamo codepoints)
_JUNG = list(range(0x314F, 0x3164))  # 21 medials
_JONG = [0, 0x3131, 0x3132, 0x3133, 0x3134, 0x3135, 0x3136, 0x3137, 0x3139,
         0x313A, 0x313B, 0x313C, 0x313D, 0x313E, 0x313F, 0x3140, 0x3141,
         0x3142, 0x3144, 0x3145, 0x3146, 0x3147, 0x3148, 0x314A, 0x314B,
         0x314C, 0x314D, 0x314E]  # 28 finals (0 = none)


def decompose_hangul(text: str) -> str:
    """Hangul syllables -> compatibility jamo; other chars pass through.
    '간다' -> 'ㄱㅏㄴㄷㅏ'."""
    out = []
    for ch in text:
        code = ord(ch)
        if 0xAC00 <= code <= 0xD7A3:
            idx = code - 0xAC00
            cho, rest = divmod(idx, 21 * 28)
            jung, jong = divmod(rest, 28)
            out.append(chr(_CHO[cho]))
            out.append(chr(_JUNG[jung]))
            if _JONG[jong]:
                out.append(chr(_JONG[jong]))
        else:
            out.append(ch)
    return "".join(out)


def compose_jamo(text: str) -> str:
    """Best-effort inverse of decompose_hangul: greedy recombination of
    compatibility jamo runs into syllables; unmatched jamo pass through."""
    out = []
    i = 0
    n = len(text)
    cho_set = {chr(c) for c in _CHO}
    jung_set = {chr(c) for c in _JUNG}
    jong_map = {chr(c): j for j, c in enumerate(_JONG) if c}
    while i < n:
        ch = text[i]
        if ch in cho_set and i + 1 < n and text[i + 1] in jung_set:
            cho = _CHO.index(ord(ch))
            jung = _JUNG.index(ord(text[i + 1]))
            i += 2
            jong = 0
            # a final is consumed only if NOT itself the start of a next
            # syllable (i.e. not followed by a medial)
            if i < n and text[i] in jong_map and not (
                    i + 1 < n and text[i + 1] in jung_set):
                jong = jong_map[text[i]]
                i += 1
            out.append(chr(0xAC00 + (cho * 21 + jung) * 28 + jong))
        else:
            out.append(ch)
            i += 1
    return "".join(out)
