"""ARPA -> kenlm "format version 5" PROBING binary writer.

Counterpart of the reader in ``native/ngram_lm.cpp`` (see the layout comment
there); gives users of the reference's kenlm-binary workflow
(``/root/reference/inference.py:29`` loads a pyctcdecode model directory that
wraps a kenlm file) a dependency-free way to produce/consume the same
artifact, and gives the tests a fixture generator so the binary reader is
exercised end-to-end in-image (kenlm itself is not installable here).

The layout written here is the 64-bit little-endian probing layout:
sanity header, fixed-width params, per-order counts, murmur-hashed vocab
probing table, unigram ProbBackoff array, chained-hash middle/longest
probing tables, and '\0'-joined trailing vocabulary strings.
"""

from __future__ import annotations

import struct
from typing import Dict, List, Tuple

MAGIC = b"mmap lm http://kheafield.com/code format version 5\n\x00"
_M64 = (1 << 64) - 1
_CHAIN_A = 8978948897894561157
_CHAIN_B = 17894857484156487943
DEFAULT_MULTIPLIER = 1.5


def murmur64a(data: bytes, seed: int = 0) -> int:
    """MurmurHash64A — kenlm's vocab word hash on x86-64."""
    m = 0xC6A4A7935BD1E995
    r = 47
    h = (seed ^ (len(data) * m)) & _M64
    n8 = len(data) & ~7
    for i in range(0, n8, 8):
        k = int.from_bytes(data[i:i + 8], "little")
        k = (k * m) & _M64
        k ^= k >> r
        k = (k * m) & _M64
        h ^= k
        h = (h * m) & _M64
    tail = data[n8:]
    if tail:
        h ^= int.from_bytes(tail, "little")
        h = (h * m) & _M64
    h ^= h >> r
    h = (h * m) & _M64
    h ^= h >> r
    return h


def chain_hash(ids: List[int]) -> int:
    """kenlm n-gram key: fold the ids right-to-left (extend-left order)."""
    h = ids[-1] & _M64
    for w in reversed(ids[:-1]):
        h = ((h * _CHAIN_A) ^ ((w + 1) * _CHAIN_B)) & _M64
    return h


def _buckets(entries: int, multiplier: float) -> int:
    # float32 on purpose: real kenlm (and native/ngram_lm.cpp KenlmBuckets)
    # computes (uint64)(multiplier * (float)entries) in SINGLE precision —
    # double math here would disagree by one slot once entries exceeds
    # float32's 2^23 integer spacing (~5.6M n-grams), misaligning every
    # table after the first oversized one.
    import numpy as np
    scaled = int(np.float32(multiplier) * np.float32(entries))
    return max(entries + 1, scaled)


def _place(table: List[Tuple[int, bytes]], buckets: int,
           entry_size: int) -> bytearray:
    """Linear-probing placement; key 0 marks an empty slot."""
    slots: List[bytes] = [b"\x00" * entry_size] * buckets
    used = [False] * buckets
    for key, payload in table:
        b = key % buckets
        while used[b]:
            b = (b + 1) % buckets
        used[b] = True
        slots[b] = struct.pack("<Q", key) + payload
    return bytearray(b"".join(slots))


def parse_arpa(text: str):
    """Minimal ARPA parse -> (order, counts, {n: [(words, prob, backoff)]})."""
    lines = iter(text.splitlines())
    counts: List[int] = []
    for line in lines:
        line = line.strip()
        if line.startswith("ngram "):
            counts.append(int(line.split("=")[1]))
        elif line.endswith("-grams:"):
            cur = int(line[1:line.index("-")])
            break
    else:
        raise ValueError("no n-gram sections in ARPA input")
    order = len(counts)
    grams: Dict[int, list] = {n: [] for n in range(1, order + 1)}
    for line in lines:
        line = line.strip()
        if not line:
            continue
        if line.startswith("\\"):
            if line.endswith("-grams:"):
                cur = int(line[1:line.index("-")])
            continue
        parts = line.split()
        prob = float(parts[0])
        words = parts[1:1 + cur]
        backoff = float(parts[1 + cur]) if len(parts) > 1 + cur else 0.0
        grams[cur].append((words, prob, backoff))
    return order, counts, grams


def write_probing_binary(arpa_text: str, out_path: str,
                         multiplier: float = DEFAULT_MULTIPLIER) -> None:
    order, counts, grams = parse_arpa(arpa_text)
    if [len(grams[n]) for n in range(1, order + 1)] != counts:
        raise ValueError("ARPA counts header disagrees with section sizes")

    # ids: <unk> is always 0; the rest in unigram-section order (kenlm's
    # insertion order while reading the ARPA)
    vocab: Dict[str, int] = {"<unk>": 0}
    for words, _, _ in grams[1]:
        vocab.setdefault(words[0], len(vocab))
    if len(vocab) != counts[0]:
        raise ValueError("ARPA unigram section must include <unk>")

    out = bytearray()
    out += MAGIC.ljust(56, b"\x00")
    out += struct.pack("<f4xdQ", 0.0, 1.0, _M64)
    out += struct.pack("<B3xfi B3xI", order, multiplier, 0, 1, 0)
    for c in counts:
        out += struct.pack("<Q", c)
    while len(out) % 8:
        out += b"\x00"

    # vocabulary probing table
    out += struct.pack("<Q", len(vocab))  # header: bound (lowest unused id)
    vtab = [(murmur64a(w.encode()), struct.pack("<I4x", i))
            for w, i in vocab.items()]
    out += _place(vtab, _buckets(counts[0], multiplier), 16)

    # unigram ProbBackoff array, indexed by id (one spare trailing slot)
    uni = bytearray(struct.pack("<2f", 0.0, 0.0)) * (counts[0] + 1)
    for words, prob, backoff in grams[1]:
        i = vocab[words[0]]
        uni[8 * i:8 * i + 8] = struct.pack("<2f", prob, backoff)
    out += uni

    # middle orders (key, prob, backoff), longest order (key, prob, pad)
    for n in range(2, order + 1):
        longest = n == order
        rows = []
        for words, prob, backoff in grams[n]:
            ids = [vocab.get(w, 0) for w in words]
            payload = (struct.pack("<f4x", prob) if longest
                       else struct.pack("<2f", prob, backoff))
            rows.append((chain_hash(ids), payload))
        out += _place(rows, _buckets(counts[n - 1], multiplier), 16)

    # trailing vocabulary strings in id order
    words_by_id = sorted(vocab, key=vocab.get)
    out += b"\x00".join(w.encode() for w in words_by_id) + b"\x00"

    with open(out_path, "wb") as f:
        f.write(bytes(out))


def main() -> None:  # pragma: no cover - thin CLI
    import argparse

    p = argparse.ArgumentParser(
        description="Convert a text ARPA LM to a kenlm-probing binary")
    p.add_argument("arpa")
    p.add_argument("out")
    args = p.parse_args()
    with open(args.arpa) as f:
        write_probing_binary(f.read(), args.out)


if __name__ == "__main__":  # pragma: no cover
    main()
