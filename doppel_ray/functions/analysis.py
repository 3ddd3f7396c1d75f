"""Text-analysis kernels for training-data pipelines: token counting,
quality scoring, language ID, and document fingerprinting.

All kernels are vectorized (pyarrow.compute RE2 / numpy); the regex
token and punctuation counts are defined so DuckDB's
``regexp_extract_all`` produces identical numbers (verified in
tests/test_analysis.py), making the per-doc stats SQL-oracle-checkable.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from doppel_ray.functions import suffix as S

# token regexes shared verbatim with the SQL oracles
WS_TOKEN_RE = r"\S+"
BPE_TOKEN_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"   # GPT-2-style coarse split
PUNCT_RE = r"[^\w\s]"


def token_counts(texts: pa.Array | pa.ChunkedArray, pattern: str = WS_TOKEN_RE) -> np.ndarray:
    """Number of regex-token matches per document (vectorized RE2)."""
    return pc.count_substring_regex(texts, pattern=pattern).to_numpy(
        zero_copy_only=False
    ).astype(np.int64)


def quality_features(texts: pa.Array | pa.ChunkedArray) -> dict[str, np.ndarray]:
    """Per-doc quality columns: chars/bytes/tokens, punctuation ratio,
    mean token length, stopword ratio — the standard cheap filters of
    web-corpus quality scoring (C4/Gopher-style heuristics)."""
    n_chars = pc.utf8_length(texts).to_numpy(zero_copy_only=False).astype(np.int64)
    n_bytes = pc.binary_length(texts).to_numpy(zero_copy_only=False).astype(np.int64)
    n_tokens = token_counts(texts, WS_TOKEN_RE)
    n_punct = token_counts(texts, PUNCT_RE)
    with np.errstate(divide="ignore", invalid="ignore"):
        punct_ratio = np.where(n_chars > 0, n_punct / n_chars, 0.0)
        mean_tok_len = np.where(
            n_tokens > 0, (n_chars - (n_tokens - 1).clip(0)) / n_tokens.clip(1), 0.0
        )
    n_stop = stopword_counts(texts)
    stop_ratio = np.where(n_tokens > 0, n_stop / n_tokens.clip(1), 0.0)
    return {
        "n_chars": n_chars,
        "n_bytes": n_bytes,
        "n_tokens": n_tokens,
        "n_punct": n_punct,
        "punct_ratio": punct_ratio,
        "mean_token_len": mean_tok_len,
        "stopword_ratio": stop_ratio,
    }


_STOPWORDS = (
    "the a an and or of to in is are was were for on with as at by it "
    "this that from be not have has had but they you we he she i"
).split()
_STOP_RE = r"(?i)\b(" + "|".join(_STOPWORDS) + r")\b"


def stopword_counts(texts: pa.Array | pa.ChunkedArray) -> np.ndarray:
    """Count of English stopword tokens (word-boundary RE2 match)."""
    return pc.count_substring_regex(texts, pattern=_STOP_RE).to_numpy(
        zero_copy_only=False
    ).astype(np.int64)


def quality_score(feats: dict[str, np.ndarray]) -> np.ndarray:
    """Composite [0,1] score: long-enough, not punctuation soup, has
    plausible word lengths. Deterministic, documented heuristic."""
    length_ok = np.clip(feats["n_tokens"] / 50.0, 0.0, 1.0)
    punct_ok = np.clip(1.0 - 4.0 * feats["punct_ratio"], 0.0, 1.0)
    wl = feats["mean_token_len"]
    wordlen_ok = np.where((wl >= 2.5) & (wl <= 12.0), 1.0, 0.4)
    return (length_ok * punct_ok * wordlen_ok).astype(np.float64)


# -- language ID --------------------------------------------------------

# tiny per-language marker-word profiles (top function words) + script
# ranges; a deterministic n-gram/stopword heuristic, NOT a model
_LANG_MARKERS: dict[str, str] = {
    "en": "the and of to in is you that it for was with are as at be this",
    "de": "der die und das ist nicht ich sie ein zu mit den von auf für",
    "fr": "le la les et des une est que pour dans qui pas sur avec ce",
    "es": "el la los las y que de en un una es no por con para se",
    "it": "il la che di e un per sono una non con del le si mi",
    "pt": "o que de a e do da em um para com os uma por mais",
    "nl": "de het een en van ik dat is op niet met zijn voor je",
}
_LANG_RES = {
    lang: r"(?i)\b(" + "|".join(words.split()) + r")\b"
    for lang, words in _LANG_MARKERS.items()
}
_CJK_RE = r"[\x{4E00}-\x{9FFF}]"
_CYRILLIC_RE = r"[\x{0400}-\x{04FF}]"


def lang_id(texts: pa.Array | pa.ChunkedArray) -> np.ndarray:
    """Predicted language code per doc ('und' when nothing matches).

    Script detection first (CJK -> zh, Cyrillic -> ru), then the highest
    marker-word hit-rate among the Latin-script profiles; every step one
    vectorized RE2 count over the column.
    """
    n_tokens = token_counts(texts, WS_TOKEN_RE).clip(1)
    n_chars = pc.utf8_length(texts).to_numpy(zero_copy_only=False).clip(1)
    cjk = token_counts(texts, _CJK_RE) / n_chars
    cyr = token_counts(texts, _CYRILLIC_RE) / n_chars
    scores = np.stack(
        [token_counts(texts, rx) / n_tokens for rx in _LANG_RES.values()]
    )
    langs = np.array(list(_LANG_RES.keys()))
    best = langs[np.argmax(scores, axis=0)]
    best_score = scores.max(axis=0)
    out = np.where(best_score >= 0.08, best, "und")
    out = np.where(cyr > 0.3, "ru", out)
    out = np.where(cjk > 0.3, "zh", out)
    return out.astype(object)


# -- document fingerprinting -------------------------------------------

def doc_fingerprints(
    texts: pa.Array | pa.ChunkedArray, w: int = 16
) -> np.ndarray:
    """64-bit rolling-hash document fingerprint: the minimum w-byte
    window hash (1-permutation MinHash over w-grams — winnowing-style,
    Schleimer et al. 2003). Equal texts share fingerprints; a contained
    doc's fingerprint appears among its container's window hashes."""
    out = np.empty(len(texts), dtype=np.uint64)
    data = texts.combine_chunks() if isinstance(texts, pa.ChunkedArray) else texts
    for i, v in enumerate(data.to_pylist()):
        b = (v or "").encode()
        wh = S.window_hashes(b, w)
        if len(wh) == 0:
            wh = S.window_hashes(b + b"\x00" * (w - len(b)), w)
        out[i] = wh.min()
    return out


def fingerprint_sketch(
    texts: pa.Array | pa.ChunkedArray, w: int = 16, k: int = 8
) -> list[np.ndarray]:
    """k smallest distinct window hashes per doc (bottom-k sketch): the
    overlap of two sketches estimates w-gram resemblance."""
    data = texts.combine_chunks() if isinstance(texts, pa.ChunkedArray) else texts
    out = []
    for v in data.to_pylist():
        b = (v or "").encode()
        wh = np.unique(S.window_hashes(b, w))
        out.append(wh[:k])
    return out


# ------------------------------------------------------------ PII masking

# PII patterns shared VERBATIM with the SQL oracles (both sides are RE2:
# pyarrow.compute and DuckDB) — the proven token_stats technique. Masking
# order matters and is fixed: EMAIL first (its local/domain parts contain
# digits and dots that the IP/phone patterns would otherwise chew on),
# then PHONE (dashes only, so it can't overlap IPv4), then IP.
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE_RE = r"\b\d{3}-\d{3}-\d{4}\b"
IPV4_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"

#: (pattern, replacement) in application order
PII_RULES: tuple[tuple[str, str], ...] = (
    (EMAIL_RE, "<EMAIL>"),
    (PHONE_RE, "<PHONE>"),
    (IPV4_RE, "<IP>"),
)


def pii_counts(texts: pa.Array | pa.ChunkedArray) -> dict[str, np.ndarray]:
    """Per-doc match counts for each PII family (vectorized RE2),
    counted on the ORIGINAL text before any masking."""
    return {
        "n_email": token_counts(texts, EMAIL_RE),
        "n_phone": token_counts(texts, PHONE_RE),
        "n_ip": token_counts(texts, IPV4_RE),
    }


def mask_pii(texts: pa.Array | pa.ChunkedArray) -> pa.Array:
    """Replace every PII match with its typed placeholder — the
    redaction primitive of a training-data pipeline. One vectorized
    RE2 replace per rule; rule order per ``PII_RULES``."""
    out = texts
    for pattern, repl in PII_RULES:
        out = pc.replace_substring_regex(out, pattern=pattern, replacement=repl)
    return out.combine_chunks() if isinstance(out, pa.ChunkedArray) else out
