"""Python binding for the native C++ n-gram LM (native/ngram_lm.cpp) —
capability-equivalent of the reference's KenLM-via-pyctcdecode stack
(``networks/transducer.py:22-24``, ``inference.py:29``).

Scoring semantics mirror pyctcdecode.LanguageModel:

* ``score(state, word, is_last_word)``: backoff n-gram log-prob, converted
  from ARPA log10 to natural log, scaled by ``alpha`` (lm weight) plus a
  constant ``beta`` word-insertion bonus; OOV words take a fixed penalty;
  ``is_last_word`` also scores ``</s>``;
* ``score_partial_token(tok)``: 0 if any vocab word starts with ``tok``,
  otherwise a length-scaled unknown penalty (pyctcdecode's char-trie check).

State is the tuple of the last (order-1) word ids — cheap, hashable, and
explicit (KenLM hides this in an opaque state object).
"""

from __future__ import annotations

import ctypes
import math
import os
import subprocess
from typing import Optional, Tuple

_LOG10 = math.log(10.0)
UNK_PENALTY = -10.0        # pyctcdecode UNK_SCORE_OFFSET
AVG_TOKEN_LEN = 6          # pyctcdecode AVG_TOKEN_LEN
DEFAULT_ALPHA = 0.5
DEFAULT_BETA = 1.5

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "native")


def _load_lib() -> ctypes.CDLL:
    so = os.path.join(_NATIVE_DIR, "libngram_lm.so")
    cpp = os.path.join(_NATIVE_DIR, "ngram_lm.cpp")
    # the source may be absent (prebuilt .so shipped without native/ src):
    # an existing library is then authoritative, never "stale"
    stale = (os.path.exists(so) and os.path.exists(cpp)
             and os.path.getmtime(so) < os.path.getmtime(cpp))
    if not os.path.exists(so) or stale:
        # atomic build (concurrent first calls must not load a partial .so)
        tmp = f"{so}.build.{os.getpid()}"
        subprocess.run(
            ["g++", "-O2", "-std=c++17", "-fPIC", "-shared", "-o", tmp,
             os.path.join(_NATIVE_DIR, "ngram_lm.cpp")],
            check=True, capture_output=True)
        os.replace(tmp, so)
    lib = ctypes.CDLL(so)
    lib.ngram_load.restype = ctypes.c_void_p
    lib.ngram_load.argtypes = [ctypes.c_char_p]
    lib.ngram_free.argtypes = [ctypes.c_void_p]
    lib.ngram_order.restype = ctypes.c_int
    lib.ngram_order.argtypes = [ctypes.c_void_p]
    lib.ngram_vocab_size.restype = ctypes.c_int
    lib.ngram_vocab_size.argtypes = [ctypes.c_void_p]
    lib.ngram_word_id.restype = ctypes.c_int
    lib.ngram_word_id.argtypes = [ctypes.c_void_p, ctypes.c_char_p]
    lib.ngram_score.restype = ctypes.c_float
    lib.ngram_score.argtypes = [ctypes.c_void_p,
                                ctypes.POINTER(ctypes.c_int32),
                                ctypes.c_int, ctypes.c_int32]
    lib.ngram_has_prefix.restype = ctypes.c_int
    lib.ngram_has_prefix.argtypes = [ctypes.c_void_p, ctypes.c_char_p]
    lib.ngram_kenlm_error.restype = ctypes.c_int
    lib.ngram_kenlm_error.argtypes = []
    return lib


_lib: Optional[ctypes.CDLL] = None


def _lib_handle() -> ctypes.CDLL:
    global _lib
    if _lib is None:
        _lib = _load_lib()
    return _lib


LMState = Tuple[int, ...]  # last (order-1) word ids


def _resolve_pyctcdecode_dir(d: str) -> Tuple[str, dict]:
    """Locate the LM file + attrs inside a pyctcdecode ``save_to_dir`` layout.

    The layout (reference loads it at ``inference.py:29``) is a directory
    holding the kenlm/arpa model under its original name plus ``attrs.json``
    with the fusion weights.  Filenames drifted across pyctcdecode versions,
    so match by extension rather than exact name.
    """
    import json

    attrs: dict = {}
    model = None
    for name in sorted(os.listdir(d)):
        p = os.path.join(d, name)
        low = name.lower()
        if low.endswith("attrs.json"):
            with open(p) as f:
                attrs = json.load(f)
        elif low.endswith((".arpa", ".arpa.gz", ".bin", ".binary")) or (
                low.endswith(".gz") and ".arpa" in low):
            model = p
    if model is None:
        raise FileNotFoundError(
            f"no .arpa/.bin LM file inside directory {d} (expected a "
            "pyctcdecode save_to_dir layout)")
    return model, attrs


# error codes from native ngram_kenlm_error() when a kenlm binary refuses
_KENLM_ERRORS = {
    1: "cannot open file",
    2: "not a kenlm 'format version 5' binary",
    3: "sanity/header mismatch (32-bit or foreign-endian build?)",
    4: "unsupported kenlm model type (PROBING and TRIE binaries are "
       "supported; rebuild with `build_binary probing|trie lm.arpa lm.bin`, "
       "or pass the .arpa directly — this loader reads ARPA natively)",
    5: "binary lacks trailing vocabulary strings (rebuild without -w "
       "suppression, or pass the .arpa directly)",
    6: "table layout drift detected (entry counts / prob ranges implausible "
       "for this kenlm version — pass the .arpa directly)",
    7: "bhiksha-array trie binaries (-a) are unsupported (rebuild without "
       "-a: `build_binary [-q N -b M] trie lm.arpa lm.bin`, or pass the "
       ".arpa directly)",
    8: "quantized-trie layout drift detected (quant header / table sizes "
       "implausible for this kenlm version — rebuild unquantized or pass "
       "the .arpa directly)",
}


class NGramLM:
    """N-gram LM with KenLM-style shallow-fusion scoring.

    ``load`` accepts everything the reference's ``pyctcdecode``-based loader
    (``/root/reference/inference.py:29``) accepts:

    * a text ARPA file (optionally gzip-compressed ``.arpa.gz``),
    * a kenlm ``format version 5`` PROBING or TRIE binary
      (``.bin``/``.binary``; unquantized AND quantized (``-q``) tries —
      the ``build_binary [-q N -b M] trie`` outputs; bhiksha-array
      (``-a``) variants are refused with a rebuild hint),
    * a pyctcdecode ``save_to_dir`` directory — ``attrs.json`` (alpha/beta/
      unk_score_offset) + ``unigrams.txt`` + the kenlm/arpa file inside.
    """

    def __init__(self, handle: int, alpha: float = DEFAULT_ALPHA,
                 beta: float = DEFAULT_BETA,
                 unk_offset: float = UNK_PENALTY):
        self._h = handle
        self._lib = _lib_handle()
        self.order = self._lib.ngram_order(self._h)
        self.alpha = alpha
        self.beta = beta
        self.unk_offset = unk_offset
        self._bos = self.word_id("<s>")
        self._eos = self.word_id("</s>")

    @classmethod
    def load(cls, path: str, weight: Optional[float] = None,
             beta: Optional[float] = None) -> "NGramLM":
        alpha_d, beta_d, unk_d = DEFAULT_ALPHA, DEFAULT_BETA, UNK_PENALTY
        if os.path.isdir(path):
            path, attrs = _resolve_pyctcdecode_dir(path)
            alpha_d = attrs.get("alpha", alpha_d)
            beta_d = attrs.get("beta", beta_d)
            unk_d = attrs.get("unk_score_offset", unk_d)
        tmp = None
        if path.endswith(".gz"):
            import gzip
            import tempfile
            with gzip.open(path, "rb") as f:
                data = f.read()
            tmp = tempfile.NamedTemporaryFile(suffix=".arpa", delete=False)
            tmp.write(data)
            tmp.close()
            path = tmp.name
        try:
            lib = _lib_handle()
            h = lib.ngram_load(path.encode())
            if not h:
                err = lib.ngram_kenlm_error()
                detail = _KENLM_ERRORS.get(err, "unreadable ARPA file")
                raise FileNotFoundError(f"cannot load LM {path}: {detail}")
        finally:
            if tmp is not None:
                os.unlink(tmp.name)
        return cls(h, alpha=alpha_d if weight is None else weight,
                   beta=beta_d if beta is None else beta, unk_offset=unk_d)

    def __del__(self):
        if getattr(self, "_h", None) and self._lib is not None:
            self._lib.ngram_free(self._h)
            self._h = None

    # -- low level -----------------------------------------------------
    def word_id(self, word: str) -> int:
        return self._lib.ngram_word_id(self._h, word.encode())

    def raw_score(self, context_ids: Tuple[int, ...], word_id: int) -> float:
        """log10 P(word | context) with backoff."""
        arr = (ctypes.c_int32 * len(context_ids))(*context_ids)
        return self._lib.ngram_score(self._h, arr, len(context_ids), word_id)

    def has_prefix(self, prefix: str) -> bool:
        return bool(self._lib.ngram_has_prefix(self._h, prefix.encode()))

    # -- pyctcdecode-compatible surface ---------------------------------
    def get_start_state(self) -> LMState:
        return (self._bos,) if self._bos >= 0 else ()

    def score(self, prev_state: LMState, word: str,
              is_last_word: bool = False) -> Tuple[float, LMState]:
        wid = self.word_id(word)
        if wid < 0:
            lm_log10 = self.unk_offset / _LOG10  # OOV penalty (natural units)
            new_state = prev_state
        else:
            lm_log10 = self.raw_score(prev_state or (), wid)
            # keep the last order-1 words; [-0:] would keep EVERYTHING, so
            # an order-1 LM's state must be pinned to () explicitly
            keep = self.order - 1
            new_state = ((tuple(prev_state or ()) + (wid,))[-keep:]
                         if keep > 0 else ())
        score = self.alpha * lm_log10 * _LOG10 + self.beta
        if is_last_word and self._eos >= 0:
            score += self.alpha * self.raw_score(new_state, self._eos) * _LOG10
        return score, new_state

    def score_partial_token(self, partial: str) -> float:
        if not partial:
            return 0.0
        if self.has_prefix(partial):
            unk = 0.0
        else:
            unk = self.unk_offset
        if len(partial) > AVG_TOKEN_LEN:
            unk = unk * len(partial) / AVG_TOKEN_LEN
        return self.alpha * unk
