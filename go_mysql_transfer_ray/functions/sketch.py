"""Mergeable sketches for near-duplicate detection: MinHash/LSH + SimHash.

Public-algorithm implementations (Broder's minwise hashing; Charikar's
simhash; banding LSH as in Mining of Massive Datasets) vectorized with
numpy so a ``map_batches`` stage processes a whole Arrow batch without
Python row loops:

* ``minhash_signatures`` — P permutations via affine hashing
  ``(a_j * x + b_j) mod p``, segmented min per document
  (``np.minimum.reduceat``);
* ``band_keys`` — split a P-long signature into B bands of R rows, hash
  each band → (doc, band, bucket) rows for the LSH groupby;
* ``simhash64`` — 64-bit sign-aggregate of token-hash bits per document;
* ``minhash_similarity`` / ``hamming64`` — verification kernels.

All stages are deterministic (fixed seeds) and mergeable: signatures are
computed per batch, candidate generation is a plain ``groupby`` on
(band, bucket), i.e. the shuffle moves tiny (doc_id, band, bucket) rows,
never the documents themselves.
"""

from __future__ import annotations

import numpy as np

_MERSENNE = np.uint64((1 << 61) - 1)


def _perm_params(num_perm: int, seed: int = 7) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.RandomState(seed)
    a = rng.randint(1, (1 << 61) - 1, size=num_perm, dtype=np.uint64)
    b = rng.randint(0, (1 << 61) - 1, size=num_perm, dtype=np.uint64)
    return a, b


def minhash_signatures(
    flat_shingles: np.ndarray,
    offsets: np.ndarray,
    num_perm: int = 128,
    seed: int = 7,
) -> np.ndarray:
    """(docs, num_perm) uint64 signature matrix; empty docs → MAX."""
    n_docs = len(offsets) - 1
    sig = np.full((n_docs, num_perm), np.iinfo(np.uint64).max, dtype=np.uint64)
    if len(flat_shingles) == 0:
        return sig
    a, b = _perm_params(num_perm, seed)
    x = (flat_shingles % _MERSENNE).astype(np.uint64)
    doc_len = np.diff(offsets)
    nonempty = doc_len > 0
    starts = offsets[:-1][nonempty]
    for j in range(num_perm):
        h = (a[j] * x + b[j]) % _MERSENNE
        sig[nonempty, j] = np.minimum.reduceat(h, starts)
    return sig


def band_keys(sig: np.ndarray, bands: int = 32) -> np.ndarray:
    """(docs, bands) uint64 bucket hash per band (rows = num_perm // bands)."""
    n_docs, num_perm = sig.shape
    r = num_perm // bands
    assert r * bands == num_perm, "num_perm must divide into bands"
    view = sig.reshape(n_docs, bands, r)
    P = np.uint64(0x100000001B3)
    acc = np.full((n_docs, bands), 0xCBF29CE484222325, dtype=np.uint64)
    for i in range(r):
        acc = (acc ^ view[:, :, i]) * P
    return acc


def minhash_similarity(sig_a: np.ndarray, sig_b: np.ndarray) -> np.ndarray:
    """Estimated Jaccard = fraction of equal signature positions."""
    return (sig_a == sig_b).mean(axis=-1)


def simhash64(
    flat_tokens: np.ndarray, offsets: np.ndarray
) -> np.ndarray:
    """Charikar simhash: per-document sign aggregate of token-hash bits."""
    n_docs = len(offsets) - 1
    out = np.zeros(n_docs, dtype=np.uint64)
    if len(flat_tokens) == 0:
        return out
    bits = np.unpackbits(
        flat_tokens.astype(np.uint64).view(np.uint8).reshape(-1, 8), axis=1
    )  # (N, 64), little-endian byte order is fine — consistent everywhere
    contrib = bits.astype(np.int32) * 2 - 1
    doc_len = np.diff(offsets)
    nonempty = doc_len > 0
    starts = offsets[:-1][nonempty]
    sums = np.add.reduceat(contrib, starts, axis=0)
    sel = (sums > 0).astype(np.uint8)
    packed = np.packbits(sel, axis=1).view(np.uint64).reshape(-1)
    out[nonempty] = packed
    return out


def hamming64(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Per-pair Hamming distance of 64-bit simhashes (vectorized popcount)."""
    x = np.bitwise_xor(a, b)
    cnt = np.zeros(len(x), dtype=np.int64)
    for s in range(8):
        byte = (x >> np.uint64(8 * s)) & np.uint64(0xFF)
        cnt += _POPCOUNT_TABLE[byte.astype(np.int64)]
    return cnt


_POPCOUNT_TABLE = np.array([bin(i).count("1") for i in range(256)], dtype=np.int64)


def simhash_band_keys(h: np.ndarray, blocks: int = 4) -> np.ndarray:
    """Split a 64-bit simhash into ``blocks`` equal bit-blocks (pigeonhole:
    two hashes within ``blocks-1`` bit flips share at least one block)."""
    width = 64 // blocks
    mask = np.uint64((1 << width) - 1)
    return np.stack(
        [(h >> np.uint64(i * width)) & mask for i in range(blocks)], axis=1
    )
