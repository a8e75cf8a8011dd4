"""Deterministic local text embedding (hashing-trick featurizer).

Replaces the reference's remote BGE-M3 call
(/root/reference/app/libs/text_embedder.py:10-57, invoked from
``model_dump`` at /root/reference/app/schemas/resume.py:294-300) with a
seeded, dependency-free featurizer — remote calls are banned by the
north rule. Dim 64 matches the driver testdata ``embeddings.embedding``.

Algorithm (frozen): tokens = ``[a-z0-9]+`` over lowercased text; each
token's md5 picks a bucket (first 8 hex digits mod dim) and a sign
(9th hex digit parity); token counts are signed-accumulated and the
vector L2-normalized (zero vector stays zero). float32 throughout.
"""

from __future__ import annotations

import functools
import hashlib
import re

import numpy as np

__all__ = ["embed_text", "EMBED_DIM", "KERNEL_VERSION"]

EMBED_DIM = 64
KERNEL_VERSION = "embed-1.0.0"

_TOKEN_RE = re.compile(r"[a-z0-9]+")


@functools.lru_cache(maxsize=1 << 16)
def _bucket(tok: str, dim: int) -> tuple[int, float]:
    """Token -> (bucket, sign). Cached: corpus vocabularies are Zipfian,
    so the md5 is computed once per frequent token per worker."""
    h = hashlib.md5(tok.encode("utf-8")).hexdigest()
    return int(h[:8], 16) % dim, (1.0 if int(h[8], 16) % 2 == 0 else -1.0)


def embed_text(text: str, dim: int = EMBED_DIM) -> list[float]:
    vec = np.zeros(dim, dtype=np.float32)
    if text:
        for tok in _TOKEN_RE.findall(text.lower()):
            idx, sign = _bucket(tok, dim)
            vec[idx] += sign
        norm = float(np.linalg.norm(vec))
        if norm > 0:
            vec /= norm
    return [float(v) for v in vec]
