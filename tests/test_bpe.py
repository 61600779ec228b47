"""BPE trainer/encoder verification: the distributed histogram + bounded
merge loop (functions/bpe.py) against an INDEPENDENT naive reference
implementation (per-text Python loops, no shared code), tie determinism,
the vocabulary gate, and the oracled pair-count query's parity."""

import os

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


# ---------------------------------------------------------------------------
# naive reference (deliberately simple + independent)
# ---------------------------------------------------------------------------

def naive_train(texts, num_merges):
    words = {}
    for t in texts:
        for w in t.lower().strip().split():
            if w:
                words[w] = words.get(w, 0) + 1
    seqs = {w: list(w) for w in words}
    merges = []
    for _ in range(num_merges):
        stats = {}
        for w, syms in seqs.items():
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                stats[p] = stats.get(p, 0) + words[w]
        if not stats:
            break
        best = sorted(stats.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        (l, r), cnt = best
        if cnt < 2:
            break
        merges.append((l, r, cnt))
        for w, syms in seqs.items():
            out, i = [], 0
            while i < len(syms):
                if i < len(syms) - 1 and syms[i] == l and syms[i + 1] == r:
                    out.append(l + r)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            seqs[w] = out
    return merges


def naive_encode(word, merges):
    syms = list(word)
    ranks = {(l, r): i for i, (l, r, _) in enumerate(merges)}
    while len(syms) > 1:
        cand = [(ranks[(syms[i], syms[i + 1])], i)
                for i in range(len(syms) - 1)
                if (syms[i], syms[i + 1]) in ranks]
        if not cand:
            break
        _, i = min(cand)
        syms[i:i + 2] = [syms[i] + syms[i + 1]]
    return syms


TEXTS = [
    "the theatre is there and the theory holds",
    "low lower lowest newer newest wider widest",
    "the the the there then them",
    "banana bandana ananas",
]


def _docs_dir(tmp_path, texts=TEXTS):
    d = tmp_path / "sf"
    os.makedirs(d / "documents.parquet", exist_ok=True)
    df = pd.DataFrame({
        "doc_id": np.arange(len(texts), dtype=np.int64),
        "text": texts,
        "lang": "en", "source": [f"s{i % 2}" for i in range(len(texts))],
        "n_chars": [len(t) for t in texts]})
    pq.write_table(pa.Table.from_pandas(df),
                   d / "documents.parquet" / "part0.parquet")
    return str(d)


@pytest.mark.usefixtures("ray_session")
def test_train_matches_naive(tmp_path):
    from oar_ocr_ray.queries import bpe_train_merges

    got = bpe_train_merges(_docs_dir(tmp_path), num_merges=12)
    want = naive_train(TEXTS, 12)
    assert len(got) == len(want)
    for i, (l, r, cnt) in enumerate(want):
        row = got.iloc[i]
        assert (row["left"], row["right"], int(row["pair_count"])) == (l, r, cnt), i


@pytest.mark.usefixtures("ray_session")
def test_encode_matches_naive(tmp_path):
    from oar_ocr_ray.functions.bpe import apply_merges, train_merges

    hist = pd.DataFrame({"word": ["lower", "lowest", "newest", "low"],
                         "n": np.array([4, 3, 2, 5], dtype=np.int64)})
    merges = train_merges(hist, num_merges=6)
    naive = [(l, r, c) for l, r, c in zip(merges["left"], merges["right"],
                                          merges["pair_count"])]
    ranks = {(l, r): i for i, (l, r, _) in enumerate(naive)}
    words = pd.Series(["lower", "lowest", "unseen", "low", "a", ""])
    got = apply_merges(words, ranks)
    for w, g in zip(words, got):
        assert g == len(naive_encode(w, naive)) if w else g in (0, 1), w


@pytest.mark.usefixtures("ray_session")
def test_tie_break_deterministic():
    """Two pairs with the same count must merge in (left, right)
    lexicographic order, batch-order independent."""
    from oar_ocr_ray.functions.bpe import train_merges

    hist = pd.DataFrame({"word": ["ab", "cd"], "n": np.array([3, 3],
                                                             dtype=np.int64)})
    m1 = train_merges(hist, num_merges=2)
    m2 = train_merges(hist.iloc[::-1].reset_index(drop=True), num_merges=2)
    assert m1["left"].tolist() == m2["left"].tolist() == ["a", "c"]
    assert m1["pair_count"].tolist() == [3, 3]


def test_vocab_gate_refuses():
    from oar_ocr_ray.functions.bpe import train_merges

    hist = pd.DataFrame({"word": [f"w{i}" for i in range(100)],
                         "n": np.int64(1)})
    with pytest.raises(ValueError, match="max_vocab"):
        train_merges(hist, num_merges=1, max_vocab=50)


def test_singleton_pairs_stop_training():
    """Pairs occurring once must not become merges (cnt < 2 stop)."""
    from oar_ocr_ray.functions.bpe import train_merges

    hist = pd.DataFrame({"word": ["xy", "qz"], "n": np.array([1, 1],
                                                             dtype=np.int64)})
    assert len(train_merges(hist, num_merges=5)) == 0


def test_pair_explode_boundaries_and_unicode():
    """Pairs never cross word boundaries; astral-plane chars pair as one
    symbol each (utf-32 view, not utf-16 surrogates)."""
    from oar_ocr_ray.functions.bpe import pair_explode

    out = pair_explode(pd.Series(["ab", "ba", "a", "\U0001F600x"]),
                       np.array([2, 1, 9, 1], dtype=np.int64))
    d = dict(zip(out["pair"], out["n"]))
    assert d[("ab")] == 2 and d[("ba")] == 1
    assert d["\U0001F600x"] == 1
    assert len(d) == 3  # no cross-boundary 'bb'/'aa', no singleton 'a'


@pytest.mark.usefixtures("ray_session")
def test_pair_counts_oracle_parity(tmp_path):
    from oar_ocr_ray.queries import BPE_PAIR_COUNTS_SQL, bpe_pair_counts

    d = _docs_dir(tmp_path)
    got = bpe_pair_counts(d)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{d}/documents.parquet/*.parquet')")
    want = con.execute(BPE_PAIR_COUNTS_SQL).df()
    assert got["left_sym"].tolist() == want["left_sym"].tolist()
    assert got["right_sym"].tolist() == want["right_sym"].tolist()
    assert got["cnt"].tolist() == [int(x) for x in want["cnt"]]


@pytest.mark.usefixtures("ray_session")
def test_token_counts_compress(tmp_path):
    """More merges can only shrink (or hold) the token total; zero merges
    equals character count of the split words."""
    from oar_ocr_ray.queries import bpe_token_counts

    d = _docs_dir(tmp_path)
    t0 = bpe_token_counts(d, num_merges=0)
    t40 = bpe_token_counts(d, num_merges=40)
    chars = sum(len(w) for t in TEXTS for w in t.lower().split())
    assert int(t0["bpe_tokens"].sum()) == chars
    assert int(t40["bpe_tokens"].sum()) < chars
    assert t40["source"].tolist() == ["s0", "s1"]
