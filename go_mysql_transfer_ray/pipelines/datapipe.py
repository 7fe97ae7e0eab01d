"""Training-data pipeline operators over Ray Data: dedup, similarity, text.

These are the large-scale data-processing additions (build brief: "the
operations a large-scale training-data pipeline would need"), built on the
same engine idioms as the CDC path: vectorized kernels inside
``map_batches``, sketches computed per batch and merged via small groupbys,
broadcast small sides, and no full materialization of the corpus.

Scale notes per operator:

* exact dedup — hash in map_batches, ``groupby(hash)`` moves (hash, id)
  pairs only when ``payload=False``;
* MinHash-LSH — the shuffle carries (band, bucket, doc_id) triples (tiny);
  candidate verification uses signature agreement (no second text pass);
  connected components run on the driver over the *candidate pair set*,
  which is orders of magnitude smaller than the corpus (documented
  assumption — for adversarial corpora swap in the iterative min-label
  groupby);
* ANN — query matrix broadcast via ``ray.put`` once; each batch does one
  numpy matmul; top-k per batch then a tiny global re-reduce.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data

from ..functions import sketch, text as textfn


# ---------------------------------------------------------------------------
# text analysis


def text_stats(ds: "ray.data.Dataset", text_col: str = "text") -> "ray.data.Dataset":
    """Quality/statistics columns appended to each document."""

    def fn(batch: pa.Table) -> pa.Table:
        stats = textfn.quality_score(batch.column(text_col))
        out = batch.drop_columns([c for c in stats if c in batch.column_names])
        for name, arr in stats.items():
            out = out.append_column(name, arr)
        return out

    return ds.map_batches(fn, batch_format="pyarrow")


def language_id(ds: "ray.data.Dataset", text_col: str = "text") -> "ray.data.Dataset":
    def fn(batch: pa.Table) -> pa.Table:
        return batch.append_column("pred_lang", textfn.lang_id(batch.column(text_col)))

    return ds.map_batches(fn, batch_format="pyarrow")


def fingerprints(ds: "ray.data.Dataset", text_col: str = "text") -> "ray.data.Dataset":
    def fn(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "fingerprint", textfn.winnow_fingerprint(batch.column(text_col))
        )

    return ds.map_batches(fn, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# deduplication


def exact_dedup(
    ds: "ray.data.Dataset",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> "ray.data.Dataset":
    """Exact dedup: 128-bit content hash → min id per hash.

    The shuffle carries ``(h1, h2, id)`` ONLY — never the document — and
    the reduce is a plain ``groupby().aggregate(Min)`` (no per-group
    Python).  Two independent 64-bit siphashes (the text, and the text
    with a suffix byte) give a 128-bit key: collision probability at
    10^10 docs ≈ 1.5e-19, so no payload-compare pass is needed.  Output:
    one ``id_col`` row per distinct text (the smallest id)."""
    from ray.data.aggregate import Min

    def add_hash(batch: pa.Table) -> pa.Table:
        txt = batch.column(text_col)
        if isinstance(txt, pa.ChunkedArray):
            txt = txt.combine_chunks()
        h1 = pd.util.hash_array(
            txt.to_numpy(zero_copy_only=False), categorize=False
        )
        salted = pc.binary_join_element_wise(txt, pa.scalar("\x02"), "")
        h2 = pd.util.hash_array(
            salted.to_numpy(zero_copy_only=False), categorize=False
        )
        return pa.table(
            {
                "_h1": pa.array(h1.view(np.int64)),
                "_h2": pa.array(h2.view(np.int64)),
                id_col: batch.column(id_col),
            }
        )

    return (
        ds.map_batches(add_hash, batch_format="pyarrow")
        .groupby(["_h1", "_h2"])
        .aggregate(Min(id_col, alias_name=id_col))
        .select_columns([id_col])
    )


class MinHasher:
    """Actor-pool stage: tokenize → shingle → minhash signature per doc."""

    def __init__(self, text_col="text", id_col="doc_id", num_perm=128, k=5, seed=7):
        self.text_col, self.id_col = text_col, id_col
        self.num_perm, self.k, self.seed = num_perm, k, seed

    def __call__(self, batch: pa.Table) -> pa.Table:
        flat, off = textfn.hash_tokens(batch.column(self.text_col))
        sh, soff = textfn.shingle_hashes(flat, off, k=self.k)
        sig = sketch.minhash_signatures(sh, soff, self.num_perm, self.seed)
        return pa.table(
            {
                self.id_col: batch.column(self.id_col),
                "sig": pa.FixedSizeListArray.from_arrays(
                    pa.array(sig.reshape(-1).astype(np.uint64)), self.num_perm
                ),
            }
        )


def _pairs_from_buckets(df: "pd.DataFrame", bucket_cols: list, id_col: str) -> "pd.DataFrame":
    """Candidate pairs from shared buckets — vectorized run detection.

    The bucket table is sketch METADATA (a few ints per doc×band), tiny
    next to the corpus, so run-detection happens here after a driver
    collect; a per-bucket ``groupby().map_groups`` costs a Python call
    per bucket (~10^5 of them) and measured 5-8× slower.  Scale path:
    at 10^9+ docs the same run detection runs inside ``map_groups`` over
    a hash-partitioned bucket column."""
    key = df[bucket_cols[0]].to_numpy()
    if len(bucket_cols) > 1:
        # combine bucket columns into one comparable key (hash-combine)
        key = key.astype(np.uint64)
        for c in bucket_cols[1:]:
            key = key * np.uint64(0x9E3779B1) ^ df[c].to_numpy().astype(np.uint64)
    ids = df[id_col].to_numpy().astype(np.int64)
    order = np.lexsort((ids, key))
    k, i = key[order], ids[order]
    starts = np.flatnonzero(np.r_[True, k[1:] != k[:-1]])
    ends = np.r_[starts[1:], len(k)]
    out_a, out_b = [], []
    for s, e in zip(starts, ends):
        if e - s < 2:
            continue
        u = np.unique(i[s:e])
        if len(u) < 2:
            continue
        ii, jj = np.triu_indices(len(u), 1)
        out_a.append(u[ii])
        out_b.append(u[jj])
    if not out_a:
        return pd.DataFrame({"a": [], "b": []}, dtype=np.int64)
    return pd.DataFrame(
        {"a": np.concatenate(out_a), "b": np.concatenate(out_b)}
    ).drop_duplicates()


def minhash_signatures_ds(
    ds: "ray.data.Dataset",
    text_col="text",
    id_col="doc_id",
    num_perm=128,
    k=5,
) -> "ray.data.Dataset":
    # plain tasks, not an actor pool: MinHasher holds only config (the
    # permutation params are derived per call), and actor spawn costs
    # seconds per pipeline in this sandbox
    hasher = MinHasher(text_col=text_col, id_col=id_col, num_perm=num_perm, k=k)
    return ds.map_batches(hasher.__call__, batch_format="pyarrow")


def minhash_dedup(
    ds: "ray.data.Dataset",
    text_col: str = "text",
    id_col: str = "doc_id",
    num_perm: int = 128,
    bands: int = 32,
    k: int = 5,
    threshold: float = 0.8,
) -> pa.Table:
    """MinHash + banding LSH near-dup clustering.

    Returns a pa.Table ``(doc_id, cluster_id)`` covering every document,
    ``cluster_id`` = min doc_id of its near-dup component.  Candidate pairs
    come from shared (band, bucket); verification = signature agreement ≥
    threshold; components via driver-side union-find over verified pairs.
    """
    sigs = minhash_signatures_ds(ds, text_col, id_col, num_perm, k)

    def explode_bands(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        sig = np.stack(batch.column("sig").to_numpy(zero_copy_only=False))
        bk = sketch.band_keys(sig.astype(np.uint64), bands=bands)
        n, B = bk.shape
        return pa.table(
            {
                "band": pa.array(np.tile(np.arange(B, dtype=np.int32), n)),
                "bucket": pa.array(bk.reshape(-1)),
                id_col: pa.array(np.repeat(ids, B)),
            }
        )

    sigs_mat = sigs.materialize()  # reused: band explode + verification lookup
    banded = sigs_mat.map_batches(explode_bands, batch_format="pyarrow")

    pairs = _pairs_from_buckets(
        banded.to_pandas(), ["band", "bucket"], id_col
    )

    # verification: signature agreement (minhash Jaccard estimate) — fetch
    # ONLY the signatures of docs appearing in candidate pairs (a semi-
    # join), not the whole signature matrix; the id list alone is the
    # full-corpus collect
    all_ids = sorted(
        int(x) for x in sigs_mat.select_columns([id_col]).to_pandas()[id_col]
    )
    if len(pairs):
        needed = np.unique(
            np.concatenate([pairs["a"].to_numpy(), pairs["b"].to_numpy()])
        ).astype(np.int64)
        needed_ref = ray.put(needed)

        def only_needed(t: pa.Table) -> pa.Table:
            keep = np.isin(
                t.column(id_col).to_numpy(zero_copy_only=False),
                ray.get(needed_ref),
            )
            return t.filter(pa.array(keep))

        sig_tab = sigs_mat.map_batches(
            only_needed, batch_format="pyarrow"
        ).to_pandas()
        sig_map = {
            int(i): np.asarray(s, dtype=np.uint64)
            for i, s in zip(sig_tab[id_col], sig_tab["sig"])
        }
        sa = np.stack([sig_map[int(x)] for x in pairs["a"]])
        sb = np.stack([sig_map[int(x)] for x in pairs["b"]])
        sim = sketch.minhash_similarity(sa, sb)
        pairs = pairs[sim >= threshold]

    # union-find over verified pairs (assumption: |pairs| << corpus)
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        while parent.get(x, x) != x:
            parent[x] = parent.get(parent[x], parent[x])
            x = parent[x]
        return x

    for a, b in zip(pairs["a"], pairs["b"]):
        ra, rb = find(int(a)), find(int(b))
        if ra != rb:
            lo, hi = (ra, rb) if ra < rb else (rb, ra)
            parent[hi] = lo

    clusters = [find(i) for i in all_ids]
    return pa.table(
        {id_col: pa.array(all_ids, pa.int64()), "cluster_id": pa.array(clusters, pa.int64())}
    )


def simhash_dedup(
    ds: "ray.data.Dataset",
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 3,
) -> pa.Table:
    """SimHash near-dup clustering: 64-bit simhash, 4-block pigeonhole
    banding (any pair within 3 bit flips shares a block), Hamming verify,
    driver union-find.  Returns (doc_id, simhash_hex, cluster_id)."""

    def add_simhash(batch: pa.Table) -> pa.Table:
        flat, off = textfn.hash_tokens(batch.column(text_col))
        h = sketch.simhash64(flat, off)
        return pa.table(
            {
                id_col: batch.column(id_col),
                "simhash": pa.array(h),
            }
        )

    hashed = ds.map_batches(add_simhash, batch_format="pyarrow").to_pandas()
    ids = hashed[id_col].to_numpy().astype(np.int64)
    hs = hashed["simhash"].to_numpy().astype(np.uint64)
    blocks = sketch.simhash_band_keys(hs, blocks=4)

    # candidate pairs via the shared run-detection path (one frame with
    # all 4 pigeonhole blocks); verify with a vectorized Hamming pass
    n = len(ids)
    cand_df = pd.DataFrame(
        {
            "blk": np.repeat(np.arange(blocks.shape[1], dtype=np.int64), n),
            "key": blocks.T.reshape(-1).astype(np.int64),
            id_col: np.tile(ids, blocks.shape[1]),
        }
    )
    pairs = _pairs_from_buckets(cand_df, ["blk", "key"], id_col)
    verified = []
    if len(pairs):
        hmap = dict(zip(ids, hs))
        ha = np.array([hmap[int(a)] for a in pairs["a"]], dtype=np.uint64)
        hb = np.array([hmap[int(b)] for b in pairs["b"]], dtype=np.uint64)
        ok = sketch.hamming64(ha, hb) <= max_hamming
        verified = list(
            zip(pairs["a"].to_numpy()[ok], pairs["b"].to_numpy()[ok])
        )

    order = np.argsort(ids)
    clusters = dict(
        zip(sorted(ids), _union_find_clusters(sorted(int(i) for i in ids), verified))
    )
    return pa.table(
        {
            id_col: pa.array(ids[order]),
            "simhash": pa.array([f"{h:016x}" for h in hs[order]], pa.string()),
            "cluster_id": pa.array(
                [clusters[int(i)] for i in ids[order]], pa.int64()
            ),
        }
    )


# ---------------------------------------------------------------------------
# similarity search


class BruteForceTopK:
    """Actor-pool ANN stage: queries broadcast once, one matmul per batch.

    Emits each batch's local top-k per query; a tiny driver-side re-reduce
    yields the global top-k — the canonical broadcast + partial-reduce
    pattern (no shuffle of the embedding corpus)."""

    def __init__(self, queries_ref, k: int, id_col: str, vec_col: str):
        q = ray.get(queries_ref)
        self.q = np.asarray(q, dtype=np.float32)
        self.qn = self.q / np.maximum(
            np.linalg.norm(self.q, axis=1, keepdims=True), 1e-12
        )
        self.k = k
        self.id_col, self.vec_col = id_col, vec_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:  # fully-pruned block (LSH/IVF front-ends)
            return pa.table(
                {
                    "query_id": pa.array([], pa.int64()),
                    "neighbor_id": pa.array([], pa.int64()),
                    "cosine": pa.array([], pa.float64()),
                }
            )
        ids = batch.column(self.id_col).to_numpy(zero_copy_only=False)
        mat = np.stack(batch.column(self.vec_col).to_numpy(zero_copy_only=False)).astype(
            np.float32
        )
        mat = mat / np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
        sims = self.qn @ mat.T  # (Q, n)
        k = min(self.k, sims.shape[1])
        top = np.argpartition(-sims, k - 1, axis=1)[:, :k]
        rows_q = np.repeat(np.arange(sims.shape[0]), k)
        flat_idx = top.reshape(-1)
        return pa.table(
            {
                "query_id": pa.array(rows_q.astype(np.int64)),
                "neighbor_id": pa.array(ids[flat_idx].astype(np.int64)),
                "cosine": pa.array(sims[rows_q, flat_idx].astype(np.float64)),
            }
        )


def ann_topk(
    ds: "ray.data.Dataset",
    queries: np.ndarray,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> pa.Table:
    """Global top-k cosine neighbors per query (brute force, exact)."""
    qref = ray.put(np.asarray(queries))
    partials = ds.map_batches(
        BruteForceTopK,
        fn_constructor_args=(qref, k, id_col, vec_col),
        concurrency=(1, 8),
        batch_format="pyarrow",
    ).to_pandas()
    out = []
    for qid, grp in partials.groupby("query_id"):
        # deterministic: cosine desc, then neighbor id asc
        g = grp.sort_values(["cosine", "neighbor_id"], ascending=[False, True]).head(k)
        g = g.assign(rank=np.arange(1, len(g) + 1))
        out.append(g)
    if not out:  # fully-pruned corpus: empty but well-formed result
        return pa.table(
            {
                "query_id": pa.array([], pa.int64()),
                "neighbor_id": pa.array([], pa.int64()),
                "cosine": pa.array([], pa.float64()),
                "rank": pa.array([], pa.int64()),
            }
        )
    return pa.Table.from_pandas(pd.concat(out), preserve_index=False)


def lsh_bucketed_ann(
    ds: "ray.data.Dataset",
    queries: np.ndarray,
    k: int = 10,
    planes: int | None = None,
    probes: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 11,
) -> pa.Table:
    """Approximate variant: random-hyperplane LSH buckets; only buckets
    matching a query (exact bucket, plus all single-bit-flip neighbors when
    ``probes > 1``) are scanned.  The scale path when the corpus no longer
    fits a per-batch matmul budget.

    ``planes=None`` sizes the hash so buckets average ~64 vectors —
    ``log2(n/64)`` — which keeps scanned-candidate volume roughly constant
    as the corpus grows."""
    q = np.asarray(queries, dtype=np.float32)
    if planes is None:
        n = ds.count()
        planes = max(3, int(np.log2(max(n, 128) / 64.0)))
    rng = np.random.RandomState(seed)
    dim = q.shape[1]
    H = rng.normal(size=(dim, planes)).astype(np.float32)

    def bucket_of(mat: np.ndarray) -> np.ndarray:
        bits = (mat @ H) > 0
        out = np.zeros(len(mat), dtype=np.int64)
        for i in range(planes):
            out |= bits[:, i].astype(np.int64) << i
        return out

    qb = bucket_of(q)
    wanted = set(int(b) for b in qb)
    if probes > 1:
        for b in list(wanted):
            for i in range(planes):
                wanted.add(b ^ (1 << i))
    wanted_arr = np.fromiter(wanted, dtype=np.int64)
    wanted_ref = ray.put(wanted_arr)

    def filter_buckets(batch: pa.Table) -> pa.Table:
        mat = np.stack(batch.column(vec_col).to_numpy(zero_copy_only=False)).astype(
            np.float32
        )
        b = bucket_of(mat)
        keep = np.isin(b, ray.get(wanted_ref))
        return batch.filter(pa.array(keep))

    pruned = ds.map_batches(filter_buckets, batch_format="pyarrow")
    return ann_topk(pruned, q, k=k, id_col=id_col, vec_col=vec_col)


def embedding_dedup(
    ds: "ray.data.Dataset",
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> pa.Table:
    """Embedding-cosine near-dup pairs: normalized matmul per block pair.

    Small-side broadcast: the corpus is materialized once to a matrix ref
    (valid while embeddings fit the object store — the near-dup use case);
    returns pairs (a, b, cosine ≥ threshold), a < b."""
    tab = ds.select_columns([id_col, vec_col]).to_pandas()
    ids = tab[id_col].to_numpy().astype(np.int64)
    mat = np.stack(tab[vec_col].to_numpy()).astype(np.float32)
    mat = mat / np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
    sims = mat @ mat.T
    ii, jj = np.where(np.triu(sims >= threshold, 1))
    order = np.lexsort((ids[jj], ids[ii]))
    return pa.table(
        {
            "a": pa.array(ids[ii][order]),
            "b": pa.array(ids[jj][order]),
            "cosine": pa.array(sims[ii, jj][order].astype(np.float64)),
        }
    )


# ---------------------------------------------------------------------------
# n-gram Jaccard near-dup + IVF ANN


def _union_find_clusters(ids: "list[int]", pairs) -> "list[int]":
    """Driver-side union-find (assumption: |verified pairs| << corpus)."""
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        while parent.get(x, x) != x:
            parent[x] = parent.get(parent[x], parent[x])
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(int(a)), find(int(b))
        if ra != rb:
            lo, hi = (ra, rb) if ra < rb else (rb, ra)
            parent[hi] = lo
    return [find(int(i)) for i in ids]


def ngram_jaccard_dedup(
    ds: "ray.data.Dataset",
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    num_anchors: int = 8,
    threshold: float = 0.8,
) -> pa.Table:
    """EXACT n-gram Jaccard near-dup clustering (vs MinHash's estimate).

    Candidate generation: each doc's ``num_anchors`` smallest n-gram
    hashes become anchor keys (bottom-k sketch) — two docs with Jaccard ≥
    threshold share a bottom hash with overwhelming probability; pairs
    sharing any anchor are verified with the TRUE Jaccard over the full
    n-gram hash sets (numpy intersect of sorted arrays).  Returns
    ``(doc_id, cluster_id)``; cluster = min doc_id of its component.

    Scale path note: verification here joins the full sets on the driver
    (same assumption as minhash_dedup — pairs are rare); at cluster scale
    the verify becomes a shuffle join of (pair → the two hash sets).
    """

    def to_sets(batch: pa.Table) -> pa.Table:
        flat, off = textfn.hash_tokens(batch.column(text_col))
        sh, soff = textfn.shingle_hashes(flat, off, k=n)
        sets, anchors = [], []
        for d in range(batch.num_rows):
            h = np.unique(sh[soff[d] : soff[d + 1]])
            sets.append(h.astype(np.uint64))
            a = np.sort(h)[:num_anchors]
            anchors.append(a.astype(np.uint64))
        return pa.table(
            {
                id_col: batch.column(id_col),
                "ngrams": pa.array([s.tolist() for s in sets], pa.list_(pa.uint64())),
                "anchors": pa.array(
                    [a.tolist() for a in anchors], pa.list_(pa.uint64())
                ),
            }
        )

    sets_mat = ds.map_batches(to_sets, batch_format="pyarrow").materialize()

    def explode_anchors(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        anchors = batch.column("anchors").to_pylist()
        out_id, out_anchor = [], []
        for i, alist in zip(ids, anchors):
            out_id.extend([int(i)] * len(alist))
            out_anchor.extend(alist)
        return pa.table(
            {
                "anchor": pa.array(np.asarray(out_anchor, dtype=np.uint64)),
                id_col: pa.array(np.asarray(out_id, dtype=np.int64)),
            }
        )

    pairs = _pairs_from_buckets(
        sets_mat.map_batches(explode_anchors, batch_format="pyarrow").to_pandas(),
        ["anchor"],
        id_col,
    )

    tab = sets_mat.to_pandas()
    set_map = {
        int(i): np.asarray(s, dtype=np.uint64)
        for i, s in zip(tab[id_col], tab["ngrams"])
    }
    verified = []
    for a, b in zip(pairs.get("a", []), pairs.get("b", [])):
        sa, sb = set_map[int(a)], set_map[int(b)]
        inter = len(np.intersect1d(sa, sb, assume_unique=True))
        union = len(sa) + len(sb) - inter
        if union and inter / union >= threshold:
            verified.append((int(a), int(b)))

    all_ids = sorted(set_map)
    clusters = _union_find_clusters(all_ids, verified)
    return pa.table(
        {
            id_col: pa.array(all_ids, pa.int64()),
            "cluster_id": pa.array(clusters, pa.int64()),
        }
    )


def _kmeans(sample: np.ndarray, nlist: int, iters: int = 12, seed: int = 13):
    """Tiny numpy Lloyd's k-means on L2-normalized vectors (driver-side,
    sample only — the IVF coarse quantizer)."""
    rng = np.random.RandomState(seed)
    sample = sample / np.maximum(np.linalg.norm(sample, axis=1, keepdims=True), 1e-12)
    cent = sample[rng.choice(len(sample), size=min(nlist, len(sample)), replace=False)]
    for _ in range(iters):
        assign = np.argmax(sample @ cent.T, axis=1)
        for c in range(len(cent)):
            m = assign == c
            if m.any():
                v = sample[m].mean(axis=0)
                cent[c] = v / max(np.linalg.norm(v), 1e-12)
    return cent


def ivf_ann(
    ds: "ray.data.Dataset",
    queries: np.ndarray,
    k: int = 10,
    nlist: int = 16,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    sample_size: int = 4096,
    seed: int = 13,
) -> pa.Table:
    """IVF-flat ANN: coarse k-means quantizer (trained on a driver-side
    sample), per-batch cluster assignment, scan only the ``nprobe``
    closest inverted lists per query.

    The scale story: centroids are broadcast once (``ray.put``); every
    batch does one matmul to assign clusters and drops rows outside the
    probed lists BEFORE the top-k matmul — scanned volume ~ nprobe/nlist
    of the corpus, independent of corpus size."""
    q = np.asarray(queries, dtype=np.float32)
    sample = np.stack(
        ds.limit(sample_size).to_pandas()[vec_col].to_numpy()
    ).astype(np.float32)
    cent = _kmeans(sample, nlist, seed=seed)
    qn = q / np.maximum(np.linalg.norm(q, axis=1, keepdims=True), 1e-12)
    probed = np.argsort(-(qn @ cent.T), axis=1)[:, :nprobe]
    wanted = np.unique(probed.reshape(-1))
    cent_ref = ray.put(cent)
    wanted_ref = ray.put(wanted)

    def filter_lists(batch: pa.Table) -> pa.Table:
        c = ray.get(cent_ref)
        mat = np.stack(
            batch.column(vec_col).to_numpy(zero_copy_only=False)
        ).astype(np.float32)
        mat = mat / np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
        assign = np.argmax(mat @ c.T, axis=1)
        keep = np.isin(assign, ray.get(wanted_ref))
        return batch.filter(pa.array(keep))

    pruned = ds.map_batches(filter_lists, batch_format="pyarrow")
    return ann_topk(pruned, q, k=k, id_col=id_col, vec_col=vec_col)


# ---------------------------------------------------------------------------
# training-data utilities: deterministic splits + sequence packing


def train_test_split(
    ds: "ray.data.Dataset",
    id_col: str = "doc_id",
    train_permille: int = 800,
    val_permille: int = 100,
) -> "ray.data.Dataset":
    """Deterministic hash split: Knuth multiplicative hash of the id →
    permille bucket → train/val/test label.  Pure function of the id —
    stable across runs, machines, and partitionings (and simple enough
    to reproduce in SQL, which is how the driver oracle checks it)."""

    def fn(t: pa.Table) -> pa.Table:
        ids = t.column(id_col).to_numpy(zero_copy_only=False).astype(np.uint64)
        bucket = ((ids * np.uint64(2654435761)) % np.uint64(4294967296)) % np.uint64(1000)
        split = np.where(
            bucket < train_permille,
            "train",
            np.where(bucket < train_permille + val_permille, "val", "test"),
        )
        return pa.table(
            {
                id_col: t.column(id_col),
                "bucket": pa.array(bucket.astype(np.int64)),
                "split": pa.array(split, pa.string()),
            }
        )

    return ds.map_batches(fn, batch_format="pyarrow")


def pack_sequences(
    ds: "ray.data.Dataset",
    text_col: str = "text",
    id_col: str = "doc_id",
    capacity: int = 512,
) -> "ray.data.Dataset":
    """Greedy sequence packing: assign docs to bins of ≤ ``capacity``
    tokens for training-batch construction.

    Block-local greedy first-fit in arrival order — bins never span
    blocks, so packing is embarrassingly parallel and deterministic per
    block content; ``bin_id`` = the first doc id in the bin (globally
    unique).  A doc longer than ``capacity`` gets its own bin (callers
    truncate downstream).  Output: (doc_id, n_tokens, bin_id,
    offset_in_bin)."""

    def fn(t: pa.Table) -> pa.Table:
        ntok = textfn.token_count(t.column(text_col)).to_numpy(zero_copy_only=False)
        ids = t.column(id_col).to_numpy(zero_copy_only=False)
        bin_ids = np.empty(len(ids), dtype=np.int64)
        offsets = np.empty(len(ids), dtype=np.int64)
        cur_bin = -1
        cur_fill = 0
        for i in range(len(ids)):
            n = int(ntok[i])
            if cur_bin < 0 or cur_fill + n > capacity:
                cur_bin = int(ids[i])
                cur_fill = 0
            bin_ids[i] = cur_bin
            offsets[i] = cur_fill
            cur_fill += n
        return pa.table(
            {
                id_col: t.column(id_col),
                "n_tokens": pa.array(ntok.astype(np.int64)),
                "bin_id": pa.array(bin_ids),
                "offset_in_bin": pa.array(offsets),
            }
        )

    return ds.map_batches(fn, batch_format="pyarrow")


def connected_components(
    pairs: "ray.data.Dataset",
    max_iterations: int = 20,
) -> "ray.data.Dataset":
    """Distributed connected components over an undirected edge list —
    the scale path for the near-dup clusterers, replacing the driver-side
    union-find when verified pairs no longer fit one machine.

    Alternating large-star / small-star transformations (Kiveris et al.,
    "Connected Components in MapReduce and Beyond", SoCC'14): each round
    is two ``groupby(node)`` shuffles over the edge set; the edge set
    converges to a star forest in O(log^2 n) rounds (in practice a
    handful).  Input: dataset with int64 columns ``a``, ``b``; output:
    ``(doc_id, cluster_id)`` where cluster_id = min node of the component
    (matching the union-find convention).
    """

    def canon(t: pa.Table) -> pa.Table:
        a = t.column("a").to_numpy(zero_copy_only=False)
        b = t.column("b").to_numpy(zero_copy_only=False)
        lo = np.minimum(a, b)
        hi = np.maximum(a, b)
        keep = lo != hi
        return pa.table({"a": pa.array(hi[keep]), "b": pa.array(lo[keep])})

    def both_directions(t: pa.Table) -> pa.Table:
        a = t.column("a").to_numpy(zero_copy_only=False)
        b = t.column("b").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "node": pa.array(np.concatenate([a, b])),
                "nbr": pa.array(np.concatenate([b, a])),
            }
        )

    def large_star(group: pa.Table) -> pa.Table:
        node = group.column("node").to_numpy(zero_copy_only=False)
        nbr = group.column("nbr").to_numpy(zero_copy_only=False)
        # group may hold several nodes: segment by node
        order = np.argsort(node, kind="stable")
        node, nbr = node[order], nbr[order]
        outs_a, outs_b = [], []
        starts = np.flatnonzero(np.r_[True, node[1:] != node[:-1]])
        ends = np.r_[starts[1:], len(node)]
        for s, e in zip(starts, ends):
            u = node[s]
            nb = nbr[s:e]
            m = min(int(nb.min()), int(u))
            big = nb[nb > u]
            outs_a.append(big)
            outs_b.append(np.full(len(big), m, dtype=np.int64))
        if not outs_a:
            return pa.table({"a": pa.array([], pa.int64()), "b": pa.array([], pa.int64())})
        return pa.table(
            {"a": pa.array(np.concatenate(outs_a)), "b": pa.array(np.concatenate(outs_b))}
        )

    def small_star(group: pa.Table) -> pa.Table:
        node = group.column("node").to_numpy(zero_copy_only=False)
        nbr = group.column("nbr").to_numpy(zero_copy_only=False)
        order = np.argsort(node, kind="stable")
        node, nbr = node[order], nbr[order]
        outs_a, outs_b = [], []
        starts = np.flatnonzero(np.r_[True, node[1:] != node[:-1]])
        ends = np.r_[starts[1:], len(node)]
        for s, e in zip(starts, ends):
            u = int(node[s])
            nb = nbr[s:e]
            small = nb[nb <= u]
            if len(small) == 0:
                continue
            m = int(small.min())
            rest = small[small != m]
            link = np.r_[rest, [u]]
            outs_a.append(link)
            outs_b.append(np.full(len(link), m, dtype=np.int64))
        if not outs_a:
            return pa.table({"a": pa.array([], pa.int64()), "b": pa.array([], pa.int64())})
        return pa.table(
            {"a": pa.array(np.concatenate(outs_a)), "b": pa.array(np.concatenate(outs_b))}
        )

    def checksum(ds) -> tuple:
        def h(t: pa.Table) -> pa.Table:
            a = t.column("a").to_numpy(zero_copy_only=False).astype(np.uint64)
            b = t.column("b").to_numpy(zero_copy_only=False).astype(np.uint64)
            x = (a * np.uint64(0x9E3779B1) ^ b * np.uint64(0x85EBCA77))
            return pa.table({"h": pa.array(x.astype(np.int64)), "n": pa.array(np.ones(len(x), np.int64))})

        agg = ds.map_batches(h, batch_format="pyarrow")
        return (agg.sum("h"), agg.count())

    edges = pairs.map_batches(canon, batch_format="pyarrow").materialize()
    prev = None
    for _ in range(max_iterations):
        ls = (
            edges.map_batches(both_directions, batch_format="pyarrow")
            .groupby("node")
            .map_groups(large_star, batch_format="pyarrow")
        )
        combined = ls.union(edges).map_batches(canon, batch_format="pyarrow")
        ss = (
            combined.map_batches(both_directions, batch_format="pyarrow")
            .groupby("node")
            .map_groups(small_star, batch_format="pyarrow")
        )
        edges = (
            ss.map_batches(canon, batch_format="pyarrow")
            .groupby(["a", "b"])
            .map_groups(lambda g: g.slice(0, 1), batch_format="pyarrow")
            .materialize()
        )
        cur = checksum(edges)
        if cur == prev:
            break
        prev = cur

    # star forest → labels: every edge (a,b) has b = component root
    def emit_labels(t: pa.Table) -> pa.Table:
        a = t.column("a").to_numpy(zero_copy_only=False)
        b = t.column("b").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "doc_id": pa.array(np.concatenate([a, b])),
                "cluster_id": pa.array(np.concatenate([b, b])),
            }
        )

    def min_label(group: pa.Table) -> pa.Table:
        ids = group.column("doc_id").to_numpy(zero_copy_only=False)
        lab = group.column("cluster_id").to_numpy(zero_copy_only=False)
        order = np.argsort(ids, kind="stable")
        ids, lab = ids[order], lab[order]
        starts = np.flatnonzero(np.r_[True, ids[1:] != ids[:-1]])
        mins = np.minimum.reduceat(lab, starts)
        return pa.table(
            {"doc_id": pa.array(ids[starts]), "cluster_id": pa.array(mins)}
        )

    return (
        edges.map_batches(emit_labels, batch_format="pyarrow")
        .groupby("doc_id")
        .map_groups(min_label, batch_format="pyarrow")
    )
