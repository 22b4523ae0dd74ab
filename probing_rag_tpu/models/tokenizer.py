"""Tokenizer protocol + implementations.

The reference uses Gemma's sentencepiece tokenizer through transformer_lens
(``model.to_tokens`` / ``to_string``, pad == eos — exp_rag.py:304). Tokenizer
fidelity is a parity trap (SURVEY.md §7): prober inputs shift if tokenization
changes. This module defines the small protocol the rest of the framework
needs and two implementations:

- ``SentencePieceTokenizer``: loads a real checkpoint tokenizer when model
  files are available (via ``sentencepiece`` or a HF ``transformers``
  tokenizer object) — the deployment path.
- ``ByteTokenizer``: a self-contained byte-level tokenizer with BOS/EOS/PAD,
  exact round trip, used by tests and benchmarks in environments without
  checkpoint files (zero-egress CI).
"""

from __future__ import annotations

import re
from typing import List, Protocol, Sequence

# sentencepiece byte-fallback piece, e.g. "<0x0A>" for "\n" (Mistral-family
# vocabs encode control characters this way; Gemma has them too)
_BYTE_PIECE = re.compile(r"^<0x([0-9A-Fa-f]{2})>$")


def _piece_to_string(piece: str) -> str:
    """Surface form of one vocab piece: decode byte-fallback pieces to their
    byte's character (StopTables must see '\\n' to flag newline tokens —
    otherwise the paragraph stop silently never fires and decode always runs
    to max_new_tokens) and map the sentencepiece word-boundary marker to a
    space."""
    m = _BYTE_PIECE.match(piece)
    if m:
        try:
            return bytes([int(m.group(1), 16)]).decode("utf-8")
        except UnicodeDecodeError:
            return ""
    return piece.replace("▁", " ")


class Tokenizer(Protocol):
    vocab_size: int
    bos_id: int
    eos_id: int
    pad_id: int

    def encode(self, text: str, add_bos: bool = False) -> List[int]: ...

    def decode(self, ids: Sequence[int]) -> str: ...

    def token_strings(self) -> List[str]: ...


class ByteTokenizer:
    """UTF-8 byte vocab + {PAD, BOS, EOS}. pad==eos mirrored via pad_id."""

    def __init__(self, vocab_size: int = 512):
        assert vocab_size >= 259
        self.vocab_size = vocab_size
        self.bos_id = 256
        self.eos_id = 257
        self.pad_id = 257  # reference sets pad = eos (exp_rag.py:304)

    def encode(self, text: str, add_bos: bool = False) -> List[int]:
        ids = list(text.encode("utf-8"))
        return ([self.bos_id] + ids) if add_bos else ids

    def decode(self, ids: Sequence[int]) -> str:
        return bytes(i for i in ids if i < 256).decode("utf-8", errors="ignore")

    def token_strings(self) -> List[str]:
        out = []
        for i in range(self.vocab_size):
            if i < 256:
                try:
                    out.append(bytes([i]).decode("utf-8"))
                except UnicodeDecodeError:
                    out.append("")
            else:
                out.append("")
        return out


class SentencePieceTokenizer:
    """Checkpoint tokenizer. Accepts either a sentencepiece model path or a
    ready HF tokenizer object (``transformers.AutoTokenizer``)."""

    def __init__(self, source):
        if isinstance(source, (str,)):
            import sentencepiece as spm  # optional dependency

            sp = spm.SentencePieceProcessor()
            sp.Load(source)
            self._sp = sp
            self._hf = None
            self.vocab_size = sp.GetPieceSize()
            self.bos_id = sp.bos_id()
            self.eos_id = sp.eos_id()
        else:
            self._sp = None
            self._hf = source
            self.vocab_size = len(source)
            self.bos_id = source.bos_token_id
            self.eos_id = source.eos_token_id
        self.pad_id = self.eos_id  # parity: pad = eos (exp_rag.py:304)

    def encode(self, text: str, add_bos: bool = False) -> List[int]:
        if self._sp is not None:
            ids = self._sp.EncodeAsIds(text)
        else:
            ids = self._hf.encode(text, add_special_tokens=False)
        return ([self.bos_id] + ids) if add_bos else ids

    def decode(self, ids: Sequence[int]) -> str:
        if self._sp is not None:
            return self._sp.DecodeIds(list(ids))
        return self._hf.decode(ids, skip_special_tokens=False)

    def token_strings(self) -> List[str]:
        if self._sp is not None:
            return [
                _piece_to_string(self._sp.IdToPiece(i))
                for i in range(self.vocab_size)
            ]
        toks = self._hf.convert_ids_to_tokens(list(range(self.vocab_size)))
        return [_piece_to_string(t) if isinstance(t, str) else "" for t in toks]
