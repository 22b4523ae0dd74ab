"""ctypes binding for the native C++ index builder (indexer.cpp).

Builds the shared library on first use (g++ -O3) into the package directory;
falls back to the pure-Python builder when no compiler is available. The
native builder replaces the tokenize/hash/count hot loop of index
construction (make_indexer.py:434-444 in the reference's stack).
"""

from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path
from typing import List, Optional, Sequence, Tuple

import numpy as np

_DIR = Path(__file__).parent
_SO = _DIR / "libindexer.so"
_SRC = _DIR / "indexer.cpp"

_lib = None


class _BuildResult(ctypes.Structure):
    _fields_ = [
        ("n_docs", ctypes.c_int64),
        ("n_terms", ctypes.c_int64),
        ("nnz", ctypes.c_int64),
        ("term_offsets", ctypes.POINTER(ctypes.c_int64)),
        ("postings_doc", ctypes.POINTER(ctypes.c_int32)),
        ("postings_tf", ctypes.POINTER(ctypes.c_float)),
        ("doc_lens", ctypes.POINTER(ctypes.c_int32)),
        ("vocab_blob", ctypes.POINTER(ctypes.c_char)),
        ("vocab_blob_len", ctypes.c_int64),
    ]


def _compile() -> bool:
    try:
        subprocess.run(
            ["g++", "-O3", "-march=native", "-shared", "-fPIC",
             str(_SRC), "-o", str(_SO)],
            check=True, capture_output=True, timeout=120,
        )
        return True
    except Exception:
        return False


def load_library() -> Optional[ctypes.CDLL]:
    global _lib
    if _lib is not None:
        return _lib or None
    if not _SO.exists() and not _compile():
        _lib = False
        return None
    lib = ctypes.CDLL(str(_SO))
    lib.bm25_build.restype = ctypes.POINTER(_BuildResult)
    lib.bm25_build.argtypes = [
        ctypes.c_char_p,
        ctypes.POINTER(ctypes.c_int64),
        ctypes.c_int64,
        ctypes.c_int,
        ctypes.c_int,
        ctypes.c_int,
    ]
    lib.bm25_free.argtypes = [ctypes.POINTER(_BuildResult)]
    lib.porter_stem.restype = ctypes.c_int
    lib.porter_stem.argtypes = [ctypes.c_char_p, ctypes.c_int, ctypes.c_char_p]
    lib.encoder_create.restype = ctypes.c_void_p
    lib.encoder_create.argtypes = [
        ctypes.c_char_p, ctypes.c_int64, ctypes.c_int, ctypes.c_int, ctypes.c_int,
    ]
    lib.encoder_free.argtypes = [ctypes.c_void_p]
    lib.encode_queries.restype = ctypes.c_int64
    lib.encode_queries.argtypes = [
        ctypes.c_void_p,
        ctypes.c_char_p,
        ctypes.POINTER(ctypes.c_int64),
        ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_int64),
        ctypes.c_int64,
    ]
    _lib = lib
    return lib


def available() -> bool:
    return load_library() is not None


def porter_stem(word: str) -> str:
    lib = load_library()
    assert lib is not None
    buf = ctypes.create_string_buffer(256)
    raw = word.encode("utf-8")
    n = lib.porter_stem(raw, len(raw), buf)
    return buf.raw[:n].decode("utf-8")


class QueryEncoder:
    """Native batch query analyzer+encoder against a fixed index vocab —
    the host-side serving hot path (per-query Python tokenize/stem caps out
    far below the device engines' throughput). Same analyzer chain as the
    native builder, so valid for indexes built with lowercase/stopword
    settings matching and ``stemmer_mode='original'`` (or stem=False)."""

    def __init__(
        self,
        vocab: dict,
        lowercase: bool = True,
        remove_stopwords: bool = True,
        stem: bool = True,
    ):
        lib = load_library()
        if lib is None:
            raise RuntimeError("native encoder unavailable (no compiler)")
        self._lib = lib
        terms = sorted(vocab, key=vocab.get)
        blob = ("\n".join(terms) + "\n").encode("utf-8", errors="ignore") if terms else b""
        self._handle = lib.encoder_create(
            blob, len(blob), int(lowercase), int(remove_stopwords), int(stem)
        )

    def __del__(self):
        if getattr(self, "_handle", None):
            self._lib.encoder_free(self._handle)
            self._handle = None

    def encode(self, queries: Sequence[str]) -> List[np.ndarray]:
        """Per-query term-id arrays (OOV dropped, duplicates kept)."""
        blob = "\x00".join(queries).encode("utf-8", errors="ignore")
        offsets = np.zeros(len(queries) + 1, np.int64)
        pos = 0
        for i, t in enumerate(queries):
            pos += len(t.encode("utf-8", errors="ignore")) + (1 if i < len(queries) - 1 else 0)
            offsets[i + 1] = min(pos, len(blob))
        cap = max(64, 4 * len(blob))
        out_ids = np.empty(cap, np.int32)
        out_offs = np.empty(len(queries) + 1, np.int64)
        n = self._lib.encode_queries(
            self._handle, blob,
            offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            len(queries),
            out_ids.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            out_offs.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            cap,
        )
        if n < 0:
            raise RuntimeError("encoder output capacity exceeded")
        return [
            out_ids[out_offs[i]:out_offs[i + 1]].copy()
            for i in range(len(queries))
        ]


def build_postings(
    texts: Sequence[str],
    lowercase: bool = True,
    remove_stopwords: bool = True,
    stem: bool = True,
) -> Tuple[dict, np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Native CSR build. Returns (vocab, term_offsets, postings_doc,
    postings_tf, doc_lens) matching BM25Index.build_tokenized's internals."""
    lib = load_library()
    if lib is None:
        raise RuntimeError("native indexer unavailable (no compiler)")
    blob = "\x00".join(texts).encode("utf-8", errors="ignore")
    # offsets into the utf-8 buffer per doc
    offsets = np.zeros(len(texts) + 1, np.int64)
    pos = 0
    for i, t in enumerate(texts):
        pos += len(t.encode("utf-8", errors="ignore")) + (1 if i < len(texts) - 1 else 0)
        offsets[i + 1] = min(pos, len(blob))
    res = lib.bm25_build(
        blob,
        offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        len(texts),
        int(lowercase),
        int(remove_stopwords),
        int(stem),
    )
    try:
        r = res.contents
        term_offsets = np.ctypeslib.as_array(r.term_offsets, (r.n_terms + 1,)).copy()
        postings_doc = np.ctypeslib.as_array(r.postings_doc, (max(r.nnz, 1),))[: r.nnz].copy()
        postings_tf = np.ctypeslib.as_array(r.postings_tf, (max(r.nnz, 1),))[: r.nnz].copy()
        doc_lens = np.ctypeslib.as_array(r.doc_lens, (r.n_docs,)).copy()
        vocab_terms = (
            ctypes.string_at(r.vocab_blob, r.vocab_blob_len).decode("utf-8").split("\n")[:-1]
            if r.vocab_blob_len
            else []
        )
        vocab = {t: i for i, t in enumerate(vocab_terms)}
    finally:
        lib.bm25_free(res)
    return vocab, term_offsets, postings_doc, postings_tf, doc_lens
