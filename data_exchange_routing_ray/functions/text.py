"""Text analysis for large-scale training-data pipelines.

Vectorized (pyarrow.compute / numpy) batch transforms over a string column:
token counting, punctuation/stopword quality metrics, n-gram-heuristic
language ID, md5 and winnowing document fingerprints. The reference's text
surface is only a redactor stub + HTML-encode normalizer
(``fn-redactor/Function.kt:12-22``, ``FnStoreReportingEvent.kt:68-71``); these
stages generalize that per-record map slot to the operations a 100 TB
training-data pipeline needs.

Every formula here is intentionally expressible in ANSI SQL (see
``__ray_entry__.oracle_sql``) so the driver can verify it with DuckDB.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

TOKEN_RE = r"\S+"
PUNCT_RE = r"[^\w\s]"
STOP_RE = r"\b(the|a|and|of|to|in|is)\b"
# BPE-ish pre-tokenizer: letter runs, digit runs, single other non-space —
# the GPT-2-style pre-split shape, counted not materialized
BPE_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"

LANG_RES = {
    "en": r"\b(the|and|of|to|in|is|that|for)\b",
    "es": r"\b(el|los|las|de|que|y|en|una)\b",
    "fr": r"\b(le|les|des|et|une|dans|pour)\b",
    "de": r"\b(der|die|das|und|ein|eine|zu|mit|von)\b",
}
HAN_RE = r"\p{Han}"


def _count_re(col, pattern: str) -> pa.Array:
    return pc.count_substring_regex(col, pattern=pattern)


def add_text_stats(batch: pa.Table, col: str = "text") -> pa.Table:
    """Append n_tokens / n_punct / stop_hits (n_chars assumed present or
    recomputed)."""
    text = batch[col]
    if "n_chars" not in batch.column_names:
        batch = batch.append_column(
            "n_chars", pc.cast(pc.utf8_length(text), pa.int64())
        )
    batch = batch.append_column(
        "n_tokens", pc.cast(_count_re(text, TOKEN_RE), pa.int64())
    )
    batch = batch.append_column(
        "n_punct", pc.cast(_count_re(text, PUNCT_RE), pa.int64())
    )
    batch = batch.append_column(
        "stop_hits",
        pc.cast(_count_re(pc.utf8_lower(text), STOP_RE), pa.int64()),
    )
    return batch


def add_bpe_token_count(
    batch: pa.Table, col: str = "text", out_col: str = "n_bpe_tokens"
) -> pa.Table:
    """Sub-word-ish token count via the BPE pre-tokenizer regex (one Arrow
    kernel call; the training-data 'token budget' estimator)."""
    return batch.append_column(
        out_col, pc.cast(_count_re(batch[col], BPE_RE), pa.int64())
    )


def add_quality_score(batch: pa.Table, col: str = "text") -> pa.Table:
    """Quality heuristic in [0, 1]: length-bounded token count × low
    punctuation density × stopword presence. SQL mirror in oracle_sql()."""
    need = {"n_tokens", "n_punct", "stop_hits", "n_chars"}
    if not need <= set(batch.column_names):
        batch = add_text_stats(batch, col)
    toks = batch["n_tokens"].to_numpy().astype(np.float64)
    punct = batch["n_punct"].to_numpy().astype(np.float64)
    stops = batch["stop_hits"].to_numpy().astype(np.float64)
    chars = batch["n_chars"].to_numpy().astype(np.float64)
    q = (
        np.minimum(toks, 200.0)
        / 200.0
        * (1.0 - punct / np.maximum(chars, 1.0))
        * (0.5 + 0.5 * np.minimum(stops * 5.0 / np.maximum(toks, 1.0), 1.0))
    )
    return batch.append_column("quality", pa.array(np.round(q, 6), pa.float64()))


def add_lang_id(batch: pa.Table, col: str = "text", out_col: str = "lang_pred") -> pa.Table:
    """Stopword/CJK-count language heuristic (deterministic tie-break
    en > es > fr > de; 'zh' on any Han character; 'unknown' on no signal)."""
    lower = pc.utf8_lower(batch[col])
    scores = {
        lang: _count_re(lower, pattern).to_numpy().astype(np.int64)
        for lang, pattern in LANG_RES.items()
    }
    s_zh = _count_re(batch[col], HAN_RE).to_numpy().astype(np.int64)
    s_en, s_es, s_fr, s_de = (scores[l] for l in ("en", "es", "fr", "de"))
    pred = np.select(
        [
            s_zh > 0,
            (s_en >= np.maximum(np.maximum(s_es, s_fr), s_de)) & (s_en > 0),
            (s_es >= np.maximum(s_fr, s_de)) & (s_es > 0),
            (s_fr >= s_de) & (s_fr > 0),
            s_de > 0,
        ],
        ["zh", "en", "es", "fr", "de"],
        default="unknown",
    )
    return batch.append_column(out_col, pa.array(pred, pa.string()))


def add_md5_fingerprint(
    batch: pa.Table, col: str = "text", out_col: str = "fp_md5"
) -> pa.Table:
    """Hex md5 of the column (matches SQL ``md5(text)``). Per-row C-speed
    digest — the only non-Arrow-kernel op here, dominated by hashing cost."""
    vals = batch[col].to_pylist()
    fps = [
        hashlib.md5(v.encode("utf-8")).hexdigest() if v is not None else None
        for v in vals
    ]
    return batch.append_column(out_col, pa.array(fps, pa.string()))


def add_winnow_fingerprint(
    batch: pa.Table,
    col: str = "text",
    k: int = 8,
    window: int = 16,
    out_col: str = "fp_winnow",
) -> pa.Table:
    """Winnowing-style document fingerprint: min-of-window over a k-byte
    polynomial rolling hash; returns the minimum selected hash as a stable
    64-bit fingerprint (robust to small edits, unlike md5)."""
    B = np.uint64(1000003)
    vals = batch[col].to_pylist()
    out = np.zeros(len(vals), dtype=np.uint64)
    for i, v in enumerate(vals):
        if not v:
            continue
        b = np.frombuffer(v.encode("utf-8"), dtype=np.uint8).astype(np.uint64)
        if len(b) < k:
            h = np.uint64(0)
            for x in b:
                h = h * B + x
            out[i] = h
            continue
        # rolling k-gram hashes, vectorized via powers of B
        powers = B ** np.arange(k - 1, -1, -1, dtype=np.uint64)
        win = np.lib.stride_tricks.sliding_window_view(b, k)
        hashes = (win * powers).sum(axis=1, dtype=np.uint64)
        if len(hashes) >= window:
            mins = np.lib.stride_tricks.sliding_window_view(hashes, window).min(axis=1)
        else:
            mins = hashes
        out[i] = mins.min()
    return batch.append_column(out_col, pa.array(out.astype(np.int64), pa.int64()))


def html_encode_column(batch: pa.Table, col: str) -> pa.Table:
    """HTML-encode a string column before persistence (M11, the report
    normalizer ``FnStoreReportingEvent.kt:68-71``) — chained Arrow kernels,
    ampersand first."""
    c = pc.cast(batch[col], pa.string())
    for pat, repl in (("&", "&amp;"), ("<", "&lt;"), (">", "&gt;"),
                      ('"', "&quot;"), ("'", "&#39;")):
        c = pc.replace_substring(c, pattern=pat, replacement=repl)
    idx = batch.schema.get_field_index(col)
    return batch.set_column(idx, pa.field(col, pa.string()), c)


class RedactText:
    """PII-redaction stage (the reference redactor is a stub,
    ``fn-redactor/Function.kt:12-22``; ours actually scrubs). Stateful
    actor-pool stage: patterns compiled once per actor in ``__init__``."""

    DEFAULT_PATTERNS = [
        (r"\b\d{3}-\d{2}-\d{4}\b", "[SSN]"),
        (r"\b[\w.+-]+@[\w-]+\.[\w.]+\b", "[EMAIL]"),
        (r"\b(?:\+?1[-. ]?)?\(?\d{3}\)?[-. ]?\d{3}[-. ]?\d{4}\b", "[PHONE]"),
    ]

    def __init__(self, patterns=None, col: str = "text"):
        self.col = col
        self.patterns = patterns or self.DEFAULT_PATTERNS

    def __call__(self, batch: pa.Table) -> pa.Table:
        col = batch[self.col]
        for pattern, repl in self.patterns:
            col = pc.replace_substring_regex(col, pattern=pattern, replacement=repl)
        idx = batch.schema.get_field_index(self.col)
        return batch.set_column(idx, batch.schema.field(idx), col)
