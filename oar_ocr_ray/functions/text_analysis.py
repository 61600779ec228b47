"""Text analysis stages for training-data pipelines.

All of these run as vectorized `map_batches` transforms over the flat
`documents(doc_id, text, lang, source, n_chars)` table; stateful variants
(compiled regexes, stopword tables) are callable classes = actor pools.
The token split / quality definitions are written to be exactly expressible
in ANSI SQL so each has a DuckDB oracle (see oar_ocr_ray.queries).
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd

from ..numeric import round_half_away

TOKEN_RE = r"\s+"

# Tiny per-language stopword profiles for the n-gram/stopword language-ID
# heuristic. Deterministic, dependency-free.
LANG_PROFILES = {
    "en": {"the", "and", "of", "to", "a", "in", "is", "that", "it", "for", "with", "was", "on"},
    "de": {"der", "die", "das", "und", "ist", "von", "mit", "den", "nicht", "ein", "eine", "zu"},
    "fr": {"le", "la", "les", "et", "de", "des", "un", "une", "est", "que", "pour", "dans"},
    "es": {"el", "la", "los", "las", "y", "de", "que", "un", "una", "es", "por", "con"},
}

_BPE_ISH = re.compile(r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]")


def token_count(df: pd.DataFrame, col: str = "text") -> pd.DataFrame:
    """Whitespace token count; '' counts 0. SQL-oracle-compatible:
    len(regexp_split_to_array(trim(text), '\\s+')) with empty-string guard."""
    t = df[col].fillna("").str.strip()
    n = t.str.split(TOKEN_RE).str.len()
    n = n.where(t != "", 0)
    df = df.copy()
    df["n_tokens"] = n.astype("int64")
    return df


def bpe_ish_token_count(df: pd.DataFrame, col: str = "text") -> pd.DataFrame:
    """BPE-ish token proxy: alpha runs + digit runs + single punctuation."""
    df = df.copy()
    df["n_bpe_tokens"] = df[col].fillna("").str.count(_BPE_ISH).astype("int64")
    return df


def quality_score(df: pd.DataFrame, col: str = "text") -> pd.DataFrame:
    """Length / punctuation / uppercase / whitespace ratios + a composite.

    Each ratio is an exact character-class count over the raw text so the
    DuckDB oracle (length + regexp_replace lengths) matches bit-for-bit
    after rounding.
    """
    t = df[col].fillna("")
    n = t.str.len().astype("int64")
    alpha = t.str.count(r"[A-Za-z]").astype("int64")
    digit = t.str.count(r"[0-9]").astype("int64")
    punct = t.str.count(r"[^\w\s]").astype("int64")
    space = t.str.count(r"\s").astype("int64")
    denom = n.replace(0, 1)
    df = df.copy()
    df["n_chars_m"] = n
    df["alpha_ratio"] = round_half_away(alpha / denom, 6)
    df["digit_ratio"] = round_half_away(digit / denom, 6)
    df["punct_ratio"] = round_half_away(punct / denom, 6)
    df["space_ratio"] = round_half_away(space / denom, 6)
    return df


class LangId:
    """Stopword-vote language ID (actor-pool stage: profiles compiled once).

    Scores each language by the fraction of whitespace-lowercase tokens in
    its stopword set; 'und' (unknown) when the best score is below
    min_score. Deterministic; ties broken by language-code order.
    """

    def __init__(self, min_score: float = 0.03):
        self.min_score = min_score
        self.profiles = sorted(LANG_PROFILES.items())  # deterministic order

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        toks = df["text"].fillna("").str.lower().str.split()
        langs, scores = [], []
        for tl in toks:
            if not tl:
                langs.append("und")
                scores.append(0.0)
                continue
            best_lang, best = "und", 0.0
            for code, sw in self.profiles:
                s = sum(1 for w in tl if w in sw) / len(tl)
                if s > best:
                    best_lang, best = code, s
            if best < self.min_score:
                best_lang = "und"
            langs.append(best_lang)
            scores.append(round(best, 6))
        out = df.copy()
        out["pred_lang"] = langs
        out["lang_score"] = np.asarray(scores, dtype=np.float64)
        return out


def fingerprint(df: pd.DataFrame, col: str = "text", window: int = 8) -> pd.DataFrame:
    """Document fingerprint: crc32 of the full normalized text plus a
    winnowing-style min-hash over rolling crc32 of `window`-grams —
    a cheap content fingerprint for near-dup candidate grouping."""
    import zlib

    texts = df[col].fillna("").str.replace(r"\s+", " ", regex=True).str.strip()
    full = np.fromiter(
        (zlib.crc32(t.encode()) for t in texts), dtype=np.int64, count=len(texts)
    )
    mins = []
    for t in texts:
        b = t.encode()
        if len(b) < window:
            mins.append(int(zlib.crc32(b)))
            continue
        m = min(zlib.crc32(b[i:i + window]) for i in range(len(b) - window + 1))
        mins.append(int(m))
    out = df.copy()
    out["fp_crc"] = full
    out["fp_min_shingle"] = np.asarray(mins, dtype=np.int64)
    return out
