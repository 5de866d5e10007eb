"""Scalar / array function library (SURVEY §2.9 plus LLM-pipeline text ops).

Everything here is a Column-expression builder — JVM-side, codegen-friendly,
no Python in the row path.  The only exceptions live in
``operators/multimodal.py`` (Arrow-batched pandas UDFs).
"""

from .hashing import h60, minhash_signature, PRIME31, perm_params
from .text import (
    TOKEN_REGEX,
    word_shingles,
    token_split,
    rolling_fingerprint,
    quality_score_ppm,
    scrub_pii,
    PII_EMAIL,
    PII_PHONE,
    PII_IPV4,
)

__all__ = [
    "TOKEN_REGEX",
    "h60",
    "minhash_signature",
    "PRIME31",
    "perm_params",
    "word_shingles",
    "token_split",
    "rolling_fingerprint",
    "quality_score_ppm",
    "scrub_pii",
    "PII_EMAIL",
    "PII_PHONE",
    "PII_IPV4",
]
