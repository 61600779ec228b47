"""Byte-pair-encoding over a document corpus, Ray-Data-first.

The split of work follows the standard BPE trainer shape (Sennrich et al.
2016, "Neural Machine Translation of Rare Words with Subword Units";
the same layout used by public tokenizer trainers): the CORPUS-scale pass
is a distributed word histogram — one coarse hash(word) exchange bounded
by the distinct-word vocabulary — and the merge iterations then run over
that bounded histogram only, never over the corpus. Per-iteration cost is
O(vocabulary), independent of corpus size, so a 100-TB corpus pays one
streaming pass plus a vocabulary-sized reduction.

Deviations from Sennrich (documented, deliberate): symbols are unicode
characters (not bytes) and there is no end-of-word marker — merges simply
never cross whitespace-word boundaries. Tokenization is the repo-standard
lower().strip().split() used by word_topk/token_counts so every text
operator agrees on what a "word" is.

Ties in pair frequency break deterministically: count DESC, then
(left, right) lexicographic — batch-order independent, so the learned
merge table is identical at any parallelism.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

__all__ = [
    "pair_explode",
    "train_merges",
    "apply_merges",
    "MAX_TRAIN_VOCAB",
]

# gate for the driver-side merge loop: the word histogram it consumes is
# vocabulary-bounded, not corpus-bounded, but a pathological corpus (e.g.
# random hex blobs) could still blow it up — refuse loudly past this.
MAX_TRAIN_VOCAB = 5_000_000


def pair_explode(words: pd.Series, counts: np.ndarray) -> pd.DataFrame:
    """Adjacent-character pair counts for a batch of DISTINCT words with
    occurrence counts — fully vectorized: the batch's words concatenate
    into one codepoint array (utf-32 view), pair positions that cross a
    word boundary mask out, and the groupby runs on integer codepoints
    (chars materialize only for the grouped uniques).

    Returns columns (pair, n) where pair is the 2-char string."""
    w = words.astype(str).to_numpy()
    lens = np.fromiter((len(x) for x in w), dtype=np.int64, count=len(w))
    keep = lens >= 2
    w, lens = w[keep], lens[keep]
    n = np.asarray(counts, dtype=np.int64)[keep]
    if len(w) == 0:
        return pd.DataFrame({"pair": pd.Series(dtype=str),
                             "n": pd.Series(dtype="int64")})
    s = "".join(w)
    cp = np.frombuffer(s.encode("utf-32-le"), dtype="<u4")
    total = len(cp)
    ends = np.cumsum(lens)
    valid = np.ones(total - 1, dtype=bool)
    valid[ends[:-1] - 1] = False  # pairs crossing a word boundary
    word_of = np.repeat(np.arange(len(w)), lens)
    left = cp[:-1][valid]
    right = cp[1:][valid]
    weight = n[word_of[:-1][valid]]
    df = pd.DataFrame({"l": left, "r": right, "n": weight})
    g = df.groupby(["l", "r"], sort=False, as_index=False)["n"].sum()
    pair = np.fromiter(
        (chr(a) + chr(b) for a, b in zip(g["l"], g["r"])),
        dtype=object, count=len(g))
    return pd.DataFrame({"pair": pair, "n": g["n"].to_numpy(dtype=np.int64)})


def _pair_stats(vocab: dict[tuple[str, ...], int]) -> dict[tuple[str, str], int]:
    stats: dict[tuple[str, str], int] = {}
    for syms, n in vocab.items():
        for i in range(len(syms) - 1):
            p = (syms[i], syms[i + 1])
            stats[p] = stats.get(p, 0) + n
    return stats


def _merge_word(syms: tuple[str, ...], pair: tuple[str, str],
                joined: str) -> tuple[str, ...]:
    out = []
    i, n = 0, len(syms)
    while i < n:
        if i < n - 1 and syms[i] == pair[0] and syms[i + 1] == pair[1]:
            out.append(joined)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return tuple(out)


def train_merges(word_counts: pd.DataFrame, num_merges: int = 50,
                 max_vocab: int = MAX_TRAIN_VOCAB) -> pd.DataFrame:
    """Learn `num_merges` BPE merges from a (word, n) histogram.

    The histogram is the output of the distributed pass; this loop is the
    vocabulary-bounded driver stage. Returns a DataFrame with columns
    (rank int64, left, right, pair_count int64), rank 0 first. Stops
    early when no pair occurs twice (merging singletons is noise)."""
    if len(word_counts) > max_vocab:
        raise ValueError(
            f"bpe train refused: word histogram has {len(word_counts)} "
            f"entries > max_vocab={max_vocab}; prune the vocabulary (e.g. "
            f"a min-count filter in the distributed pass) before the "
            f"merge loop — the loop is vocabulary-bounded by design.")
    vocab: dict[tuple[str, ...], int] = {}
    for word, n in zip(word_counts["word"].astype(str),
                       word_counts["n"].to_numpy(dtype=np.int64)):
        if len(word) >= 1:
            key = tuple(word)
            vocab[key] = vocab.get(key, 0) + int(n)
    ranks, lefts, rights, cnts = [], [], [], []
    for rank in range(num_merges):
        stats = _pair_stats(vocab)
        if not stats:
            break
        # count DESC then (left, right) lexicographic — deterministic
        best = min(stats.items(), key=lambda kv: (-kv[1], kv[0]))
        (l, r), cnt = best
        if cnt < 2:
            break
        vocab = _merge_vocab(vocab, (l, r), l + r)
        ranks.append(rank)
        lefts.append(l)
        rights.append(r)
        cnts.append(int(cnt))
    return pd.DataFrame({"rank": np.array(ranks, dtype=np.int64),
                         "left": np.array(lefts, dtype=object),
                         "right": np.array(rights, dtype=object),
                         "pair_count": np.array(cnts, dtype=np.int64)})


def _has_pair(syms: tuple[str, ...], l: str, r: str) -> bool:
    for i in range(len(syms) - 1):
        if syms[i] == l and syms[i + 1] == r:
            return True
    return False


def _merge_vocab(vocab, pair, joined):
    # re-key words containing the pair; keys colliding after a merge sum
    merged: dict[tuple[str, ...], int] = {}
    for k, n in vocab.items():
        nk = _merge_word(k, pair, joined) if _has_pair(k, pair[0], pair[1]) else k
        merged[nk] = merged.get(nk, 0) + n
    return merged


def apply_merges(words: pd.Series,
                 merge_ranks: dict[tuple[str, str], int],
                 memo: dict[str, int] | None = None) -> np.ndarray:
    """Token count per word after greedily applying learned merges in
    rank order (the standard BPE encode: repeatedly merge the
    lowest-rank adjacent pair present). Vectorizes over the batch via
    factorize — the merge loop runs once per DISTINCT word, with an
    optional cross-batch memo (per-actor state)."""
    codes, uniq = pd.factorize(words.astype(str))
    if memo is None:
        memo = {}
    per_uniq = np.empty(len(uniq), dtype=np.int64)
    for j, word in enumerate(uniq):
        hit = memo.get(word)
        if hit is not None:
            per_uniq[j] = hit
            continue
        syms = list(word)
        while len(syms) > 1:
            best_rank, best_i = None, -1
            for i in range(len(syms) - 1):
                rk = merge_ranks.get((syms[i], syms[i + 1]))
                if rk is not None and (best_rank is None or rk < best_rank):
                    best_rank, best_i = rk, i
            if best_rank is None:
                break
            syms[best_i:best_i + 2] = [syms[best_i] + syms[best_i + 1]]
        per_uniq[j] = len(syms)
        memo[word] = int(per_uniq[j])
    out = np.zeros(len(codes), dtype=np.int64)
    ok = codes >= 0
    out[ok] = per_uniq[codes[ok]]
    return out
