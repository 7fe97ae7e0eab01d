"""Vectorized text-analysis kernels for large-scale training-data pipelines.

These extend the engine beyond the reference's operator set (SURVEY §2 covers
the reference; these are the first-class data-pipeline additions required by
the build brief): token counting, quality scoring, language ID and document
fingerprinting — all as Arrow/numpy kernels usable inside ``map_batches``.

Design: every public function takes a ``pa.Array``/``ChunkedArray`` of utf8
and returns Arrow arrays; no Python loop over rows in the counting/scoring
kernels.  The fingerprint kernel loops over documents (winnowing needs
per-document windows) but does all inner work in numpy.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

# A GPT2-ish pre-tokenizer pattern, simplified to what `re2` (pyarrow's
# regex engine) supports: letter runs, single digits, punctuation runs.
BPE_ISH_PATTERN = r"[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]+"
_PUNCT = r"[.,;:!?'\"()\[\]{}]"

STOPWORDS = {
    "en": ("the", "and", "of", "a", "to", "in", "is", "that", "it", "for"),
    "de": ("der", "die", "und", "das", "ist", "von", "nicht", "mit", "ein", "zu"),
    "fr": ("le", "la", "et", "les", "des", "est", "pas", "que", "une", "pour"),
    "es": ("el", "la", "de", "que", "y", "los", "es", "una", "por", "con"),
}


def _arr(col) -> pa.Array:
    return col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col


def token_count(text) -> pa.Array:
    """Whitespace token count (vectorized regex count)."""
    return pc.cast(pc.count_substring_regex(_arr(text), r"[^ \t\n\r]+"), pa.int64())


def bpe_ish_token_count(text) -> pa.Array:
    """Sub-word-ish token count via the BPE-style pre-tokenizer regex."""
    return pc.cast(pc.count_substring_regex(_arr(text), BPE_ISH_PATTERN), pa.int64())


def punct_count(text) -> pa.Array:
    return pc.cast(pc.count_substring_regex(_arr(text), _PUNCT), pa.int64())


def upper_count(text) -> pa.Array:
    return pc.cast(pc.count_substring_regex(_arr(text), r"[A-Z]"), pa.int64())


def quality_score(text) -> dict[str, pa.Array]:
    """Deterministic quality heuristics: length / punctuation / casing /
    token-shape ratios plus one combined [0,1] score.

    All terms are exact integer/float arithmetic so an SQL oracle can
    reproduce them bit-for-bit (see __ray_entry__.oracle_sql)."""
    a = _arr(text)
    n_chars = pc.cast(pc.utf8_length(a), pa.int64())
    n_tokens = token_count(a)
    n_punct = punct_count(a)
    n_upper = upper_count(a)
    chars = pc.cast(pc.max_element_wise(n_chars, 1), pa.float64())
    toks = pc.cast(pc.max_element_wise(n_tokens, 1), pa.float64())
    punct_ratio = pc.divide(pc.cast(n_punct, pa.float64()), chars)
    upper_ratio = pc.divide(pc.cast(n_upper, pa.float64()), chars)
    mean_tok_len = pc.divide(chars, toks)
    # score: long-enough docs with moderate punctuation and sane word length
    len_term = pc.min_element_wise(
        pc.divide(pc.cast(n_chars, pa.float64()), 400.0), 1.0
    )
    punct_term = pc.min_element_wise(pc.multiply(punct_ratio, 10.0), 1.0)
    shape_term = pc.if_else(
        pc.and_(pc.greater_equal(mean_tok_len, 3.0), pc.less_equal(mean_tok_len, 12.0)),
        1.0,
        0.0,
    )
    score = pc.add(
        pc.multiply(0.5, len_term),
        pc.add(pc.multiply(0.2, punct_term), pc.multiply(0.3, shape_term)),
    )
    return {
        "n_chars": n_chars,
        "n_tokens": n_tokens,
        "n_punct": n_punct,
        "punct_ratio": punct_ratio,
        "upper_ratio": upper_ratio,
        "mean_tok_len": mean_tok_len,
        "quality": score,
    }


def lang_scores(text) -> dict[str, pa.Array]:
    """Per-language stopword hit counts (word-boundary regex, vectorized)."""
    a = _arr(text)
    out = {}
    for lang, words in STOPWORDS.items():
        pat = r"\b(" + "|".join(words) + r")\b"
        out[lang] = pc.count_substring_regex(a, pat, ignore_case=True)
    return out


def lang_id(text) -> pa.Array:
    """Argmax language by stopword density; ties/no-hits → 'und'."""
    scores = lang_scores(text)
    langs = list(scores)
    mat = np.stack([scores[l].to_numpy(zero_copy_only=False) for l in langs], axis=1)
    best = mat.argmax(axis=1)
    hit = mat.max(axis=1) > 0
    names = np.array(langs, dtype=object)
    return pa.array(np.where(hit, names[best], "und"), pa.string())


def line_repetition(text) -> dict[str, pa.Array]:
    """Gopher-style line-repetition stats, exact and fully vectorized.

    For each document: split on ``\\n`` and measure how much of it is
    exact-duplicate lines (the "fraction of characters in duplicate
    lines" filter of Rae et al., Gopher §A1.2 — a standard LLM-corpus
    quality signal).  Everything returned is an INTEGER so an SQL oracle
    can restate it bit-for-bit (no float division):

      n_lines          lines in the doc (split count)
      n_distinct_lines distinct line strings
      dup_line_chars   total characters of every line instance whose
                       exact text occurs >= 2 times in the doc
      line_chars       total characters across all lines

    Line identity is EXACT (Arrow ``dictionary_encode`` codes — not a
    hash, so no collision can miscount; CLAUDE.md's factorize caveat
    doesn't arise because codes never leave this kernel).  The per-doc
    grouping is one lexsort + run-length pass over the flat line stream.
    """
    a = _arr(text)
    lines = pc.split_pattern(a, "\n")
    if isinstance(lines, pa.ChunkedArray):
        lines = lines.combine_chunks()
    flat = lines.flatten()
    offsets = lines.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    doc_len = np.diff(offsets)
    n_docs = len(doc_len)
    n = len(flat)
    empty = {
        "n_lines": pa.array(doc_len, pa.int64()),
        "n_distinct_lines": pa.array(np.zeros(n_docs, np.int64)),
        "dup_line_chars": pa.array(np.zeros(n_docs, np.int64)),
        "line_chars": pa.array(np.zeros(n_docs, np.int64)),
    }
    if n == 0:
        return empty
    lens = pc.utf8_length(flat).to_numpy(zero_copy_only=False).astype(np.int64)
    codes = (
        pc.dictionary_encode(flat)
        .indices.to_numpy(zero_copy_only=False)
        .astype(np.int64)
    )
    doc_id = np.repeat(np.arange(n_docs, dtype=np.int64), doc_len)
    order = np.lexsort((codes, doc_id))
    d_s, c_s, len_s = doc_id[order], codes[order], lens[order]
    new = np.empty(n, bool)
    new[0] = True
    new[1:] = (d_s[1:] != d_s[:-1]) | (c_s[1:] != c_s[:-1])
    starts = np.flatnonzero(new)
    run_len = np.diff(np.append(starts, n))
    inst_dup = np.repeat(run_len >= 2, run_len)
    return {
        "n_lines": pa.array(doc_len, pa.int64()),
        "n_distinct_lines": pa.array(
            np.bincount(d_s[starts], minlength=n_docs).astype(np.int64)
        ),
        "dup_line_chars": pa.array(
            np.bincount(d_s, weights=np.where(inst_dup, len_s, 0), minlength=n_docs
                        ).astype(np.int64)
        ),
        "line_chars": pa.array(
            np.bincount(doc_id, weights=lens, minlength=n_docs).astype(np.int64)
        ),
    }


# ---------------------------------------------------------------------------
# token hashing shared by fingerprint / minhash / simhash


def hash_tokens(text) -> tuple[np.ndarray, np.ndarray]:
    """Tokenize (whitespace) + hash each token.

    Returns ``(flat_hashes: uint64[N], offsets: int64[rows+1])`` — the flat
    token-hash stream and per-document offsets into it.
    """
    a = _arr(text)
    toks = pc.utf8_split_whitespace(a)
    toks = toks.combine_chunks() if isinstance(toks, pa.ChunkedArray) else toks
    flat = toks.flatten()
    offsets = toks.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    if len(flat) == 0:
        return np.empty(0, np.uint64), offsets
    # Arrow's whitespace split emits empty tokens for leading/trailing
    # whitespace and for empty docs — drop them and rebuild offsets.
    nonempty = (pc.utf8_length(flat).to_numpy(zero_copy_only=False) > 0)
    cs = np.concatenate([[0], np.cumsum(nonempty)]).astype(np.int64)
    new_offsets = cs[offsets]
    kept = flat.filter(pa.array(nonempty))
    if len(kept) == 0:
        return np.empty(0, np.uint64), new_offsets
    hashes = pd.util.hash_array(
        kept.to_numpy(zero_copy_only=False), categorize=False
    ).astype(np.uint64)
    return hashes, new_offsets


def shingle_hashes(
    flat: np.ndarray, offsets: np.ndarray, k: int = 5
) -> tuple[np.ndarray, np.ndarray]:
    """k-token shingle hashes from the flat token-hash stream.

    Vectorized: combine k shifted copies of the hash stream; shingles that
    would cross a document boundary are dropped.  Documents shorter than k
    tokens contribute their (single) partial shingle so they still have a
    signature.  Returns ``(flat_shingles, shingle_offsets)``.
    """
    n = len(flat)
    doc_len = np.diff(offsets)
    if n == 0:
        return np.empty(0, np.uint64), np.zeros_like(offsets)
    idx = np.arange(n, dtype=np.int64)
    doc_id = np.repeat(np.arange(len(doc_len)), doc_len)
    doc_end = np.repeat(offsets[1:], doc_len)
    doc_start = np.repeat(offsets[:-1], doc_len)
    comb = flat.copy()
    P = np.uint64(0x100000001B3)
    for i in range(1, k):
        shifted = np.empty_like(flat)
        shifted[: n - i] = flat[i:]
        shifted[n - i :] = 0
        # zero contributions that would cross the document boundary — a
        # short doc's partial shingle must be a pure function of ITS OWN
        # tokens, never of whatever document follows it in the batch
        shifted[idx + i >= doc_end] = 0
        comb = comb * P + shifted
    # a shingle starting at pos p of doc d is valid if p + k <= doc_end,
    # or p == doc_start for short docs
    valid = (idx + k <= doc_end) | ((idx == doc_start) & (doc_len[doc_id] < k))
    out = comb[valid]
    counts = np.bincount(doc_id[valid], minlength=len(doc_len))
    new_offsets = np.concatenate([[0], np.cumsum(counts)]).astype(np.int64)
    return out, new_offsets


def winnow_fingerprint(text, k: int = 5, window: int = 4) -> pa.Array:
    """Document fingerprint via winnowing (Schleimer et al., MOSS):
    k-gram hashes → per-window minimum → xor-fold of selected fingerprints.

    Rolling-hash based and robust to local edits; returned as a 16-hex
    string.  Inner ops are numpy; the per-document loop is over window
    slices only."""
    flat, offsets = hash_tokens(text)
    sh, soff = shingle_hashes(flat, offsets, k=k)
    out = np.zeros(len(soff) - 1, dtype=np.uint64)
    for d in range(len(out)):
        h = sh[soff[d] : soff[d + 1]]
        if len(h) == 0:
            out[d] = 0
            continue
        if len(h) <= window:
            sel = h.min(keepdims=True)
        else:
            w = np.lib.stride_tricks.sliding_window_view(h, window)
            sel = w.min(axis=1)
        out[d] = np.bitwise_xor.reduce(np.unique(sel))
    return pa.array(np.char.mod("%016x", out), pa.string())
