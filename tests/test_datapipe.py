"""Text-analysis, dedup and similarity operators over the testdata tables."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from go_mysql_transfer_ray.functions import sketch, text as textfn
from go_mysql_transfer_ray.pipelines import datapipe

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs():
    return ray.data.read_parquet(f"{SF}/documents.parquet")


@pytest.fixture(scope="module")
def emb():
    return ray.data.read_parquet(f"{SF}/embeddings.parquet")


def test_token_count_matches_python():
    texts = pa.array(["a b  c", "", "  x ", "one"])
    out = textfn.token_count(texts).to_pylist()
    assert out == [len(t.split()) for t in ["a b  c", "", "  x ", "one"]]


def test_quality_score_bounds(docs):
    out = datapipe.text_stats(docs).take(20)
    for r in out:
        assert 0.0 <= r["quality"] <= 1.0
        assert r["n_tokens"] > 0
        assert r["n_chars"] == len(r["text"])


def test_lang_id_english_corpus(docs):
    out = datapipe.language_id(docs).take(100)
    preds = [r["pred_lang"] for r in out]
    assert preds.count("en") > 50  # corpus is english-ish


def test_fingerprint_stability_and_edit_robustness():
    base = "the quick brown fox jumps over the lazy dog " * 20
    edited = base.replace("lazy", "sleepy", 1)
    different = "completely other words entirely disjoint content " * 20
    fp = textfn.winnow_fingerprint(pa.array([base, base, edited, different])).to_pylist()
    assert fp[0] == fp[1]
    assert fp[0] != fp[3]


def test_shingle_hashes_short_docs():
    flat, off = textfn.hash_tokens(pa.array(["a b", "x y z w v u", ""]))
    sh, soff = textfn.shingle_hashes(flat, off, k=5)
    lens = np.diff(soff)
    assert lens[0] == 1  # short doc: one partial shingle
    assert lens[1] == 2  # 6 tokens, k=5 → 2 shingles
    assert lens[2] == 0


def test_minhash_similarity_tracks_jaccard():
    a = "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10 " * 10
    b = a.replace("w3", "zz")  # high overlap
    c = "q1 q2 q3 q4 q5 q6 q7 q8 q9 q10 " * 10
    flat, off = textfn.hash_tokens(pa.array([a, b, c]))
    sh, soff = textfn.shingle_hashes(flat, off, k=3)
    sig = sketch.minhash_signatures(sh, soff, num_perm=128)
    sim_ab = sketch.minhash_similarity(sig[0], sig[1])
    sim_ac = sketch.minhash_similarity(sig[0], sig[2])
    assert sim_ab > 0.5 > sim_ac
    assert sim_ac < 0.1


def test_simhash_hamming():
    a = np.array([0b1111, 0xFFFF_FFFF_FFFF_FFFF], dtype=np.uint64)
    b = np.array([0b0111, 0x0], dtype=np.uint64)
    assert sketch.hamming64(a, b).tolist() == [1, 64]


def test_exact_dedup(docs):
    # duplicate the corpus → dedup must return exactly the originals
    dup = docs.union(docs)
    out = datapipe.exact_dedup(dup).to_pandas()
    base = docs.to_pandas()
    assert len(out) == base["text"].nunique()
    assert set(out["doc_id"]) <= set(base["doc_id"])


def test_minhash_dedup_finds_planted_near_dups():
    rows = []
    for i in range(40):
        words = " ".join(f"tok{i}_{j}" for j in range(60))
        rows.append({"doc_id": i, "text": words})
    # plant near-dups of doc 0 and doc 1
    rows.append({"doc_id": 100, "text": rows[0]["text"].replace("tok0_5 ", "CHANGED ")})
    rows.append({"doc_id": 101, "text": rows[1]["text"]})
    ds = ray.data.from_items(rows)
    out = datapipe.minhash_dedup(ds, threshold=0.6).to_pandas()
    cl = dict(zip(out["doc_id"], out["cluster_id"]))
    assert cl[100] == cl[0] == 0
    assert cl[101] == cl[1] == 1
    assert cl[2] == 2  # unrelated doc stays alone


def test_simhash_dedup_clusters_exact_copies():
    rows = [{"doc_id": i, "text": " ".join(f"w{i}_{j}" for j in range(80))} for i in range(20)]
    rows.append({"doc_id": 50, "text": rows[3]["text"]})
    ds = ray.data.from_items(rows)
    out = datapipe.simhash_dedup(ds).to_pandas()
    cl = dict(zip(out["doc_id"], out["cluster_id"]))
    assert cl[50] == cl[3] == 3


def test_ann_topk_exact_vs_numpy(emb):
    tab = emb.to_pandas()
    mat = np.stack(tab["embedding"].to_numpy()).astype(np.float32)
    ids = tab["vec_id"].to_numpy()
    queries = mat[:3]
    out = datapipe.ann_topk(emb, queries, k=5).to_pandas()
    # reference numpy computation
    nm = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    nq = queries / np.linalg.norm(queries, axis=1, keepdims=True)
    sims = nq @ nm.T
    for q in range(3):
        got = out[out["query_id"] == q].sort_values("rank")["neighbor_id"].tolist()
        order = np.lexsort((ids, -sims[q]))
        expect = ids[order][:5].tolist()
        assert got == expect
    # top hit of query q is the vector itself (cosine 1)
    top1 = out[(out["query_id"] == 0) & (out["rank"] == 1)]
    assert np.isclose(top1["cosine"].iloc[0], 1.0, atol=1e-5)


def test_lsh_ann_recall(emb):
    tab = emb.to_pandas()
    mat = np.stack(tab["embedding"].to_numpy()).astype(np.float32)
    queries = mat[:5]
    exact = datapipe.ann_topk(emb, queries, k=10).to_pandas()
    approx = datapipe.lsh_bucketed_ann(emb, queries, k=10).to_pandas()
    recalls = []
    for q in range(5):
        e = set(exact[exact["query_id"] == q]["neighbor_id"])
        a = set(approx[approx["query_id"] == q]["neighbor_id"])
        recalls.append(len(e & a) / len(e))
    assert np.mean(recalls) > 0.3  # approximate, but must find a chunk


def test_embedding_dedup_pairs(emb):
    # planting an exact duplicate vector guarantees a pair at cosine 1
    tab = emb.to_pandas().head(50)
    dup = tab.iloc[[0]].assign(vec_id=999)
    import pandas as pd

    ds = ray.data.from_pandas(pd.concat([tab, dup], ignore_index=True))
    out = datapipe.embedding_dedup(ds, threshold=0.999).to_pandas()
    assert ((out["a"] == 0) & (out["b"] == 999)).any()


def test_ngram_jaccard_dedup_exact_jaccard():
    rows = []
    for i in range(30):
        rows.append({"doc_id": i, "text": " ".join(f"g{i}_{j}" for j in range(50))})
    # doc 200: one token changed from doc 0 → true Jaccard just under 1
    rows.append({"doc_id": 200, "text": rows[0]["text"].replace("g0_9 ", "ZZZ ")})
    # doc 201: exact copy of doc 5
    rows.append({"doc_id": 201, "text": rows[5]["text"]})
    ds = ray.data.from_items(rows)
    out = datapipe.ngram_jaccard_dedup(ds, threshold=0.8, n=3).to_pandas()
    cl = dict(zip(out["doc_id"], out["cluster_id"]))
    assert cl[200] == cl[0] == 0
    assert cl[201] == cl[5] == 5
    assert cl[1] == 1
    # threshold above the planted pair's true Jaccard → no merge
    out2 = datapipe.ngram_jaccard_dedup(ds, threshold=0.999, n=3).to_pandas()
    cl2 = dict(zip(out2["doc_id"], out2["cluster_id"]))
    assert cl2[200] == 200 and cl2[201] == 5


def test_ann_prune_split_equivalence(emb):
    """The prune/topk split (oracle-export support): passing a
    pre-materialized prune result must give the exact same table as
    letting lsh_bucketed_ann / ivf_ann prune internally."""
    tab = emb.to_pandas()
    mat = np.stack(tab["embedding"].to_numpy()).astype(np.float32)
    queries = mat[:3]

    whole = datapipe.lsh_bucketed_ann(emb, queries, k=5).to_pandas()
    pruned = datapipe.lsh_prune(emb, queries).materialize()
    split = datapipe.lsh_bucketed_ann(emb, queries, k=5, pruned=pruned).to_pandas()
    assert whole.equals(split)

    whole = datapipe.ivf_ann(emb, queries, k=5, nlist=8, nprobe=3).to_pandas()
    pruned = datapipe.ivf_prune(emb, queries, nlist=8, nprobe=3).materialize()
    split = datapipe.ivf_ann(
        emb, queries, k=5, nlist=8, nprobe=3, pruned=pruned
    ).to_pandas()
    assert whole.equals(split)


def test_ivf_ann_recalls_planted_queries(emb):
    tab = emb.to_pandas()
    mat = np.stack(tab["embedding"].to_numpy()).astype(np.float32)
    queries = mat[:3]
    out = datapipe.ivf_ann(emb, queries, k=5, nlist=8, nprobe=3).to_pandas()
    # the query vectors are corpus members: each must recall itself at rank 1
    for q in range(3):
        g = out[out["query_id"] == q].sort_values("rank")
        assert int(g.iloc[0]["neighbor_id"]) == int(tab["vec_id"].iloc[q])
        assert g.iloc[0]["cosine"] > 0.999


def test_train_test_split_deterministic(docs):
    out1 = datapipe.train_test_split(docs).to_pandas()
    out2 = datapipe.train_test_split(docs).to_pandas()
    assert out1.sort_values("doc_id").reset_index(drop=True).equals(
        out2.sort_values("doc_id").reset_index(drop=True)
    )
    frac = (out1["split"] == "train").mean()
    assert 0.7 < frac < 0.9  # ~800 permille
    # label matches bucket exactly
    for _, r in out1.head(50).iterrows():
        expected = "train" if r.bucket < 800 else ("val" if r.bucket < 900 else "test")
        assert r.split == expected


def test_pack_sequences_invariants(docs):
    out = datapipe.pack_sequences(docs, capacity=256).to_pandas()
    base = docs.to_pandas()
    assert len(out) == len(base)
    assert set(out["doc_id"]) == set(base["doc_id"])
    g = out.groupby("bin_id")
    for bin_id, grp in g:
        total = grp["n_tokens"].sum()
        assert total <= 256 or len(grp) == 1  # oversize doc gets its own bin
        # offsets are a prefix-sum of token counts within the bin
        grp = grp.sort_values("offset_in_bin")
        expect = 0
        for _, r in grp.iterrows():
            assert r.offset_in_bin == expect
            expect += r.n_tokens


@pytest.mark.parametrize("small_graph_edges", [0, 2_000_000])
def test_connected_components_matches_union_find(ray_session, small_graph_edges):
    """small_graph_edges=0 forces the distributed star rounds; the default
    takes the single-task vectorized path — both must match union-find."""
    rng = np.random.RandomState(3)
    # several random components: chain/star/cycle + singletons via id space
    edges = []
    base = 0
    for comp in range(12):
        size = rng.randint(2, 12)
        nodes = np.arange(base, base + size)
        base += size + 3  # gaps → nodes absent from edges stay out
        # random spanning structure + extra edges
        for i in range(1, size):
            edges.append((int(nodes[i]), int(nodes[rng.randint(0, i)])))
        for _ in range(rng.randint(0, 3)):
            a, b = rng.choice(nodes, 2, replace=False)
            edges.append((int(a), int(b)))
    t = pa.table(
        {
            "a": pa.array([e[0] for e in edges], pa.int64()),
            "b": pa.array([e[1] for e in edges], pa.int64()),
        }
    )
    out = datapipe.connected_components(
        ray.data.from_arrow(t), small_graph_edges=small_graph_edges
    ).to_pandas()
    got = dict(zip(out["doc_id"], out["cluster_id"]))

    # reference: driver union-find
    ids = sorted({x for e in edges for x in e})
    labels = datapipe._union_find_clusters(ids, edges)
    want = dict(zip(ids, labels))
    assert got == want


def test_minhash_dedup_many_small_blocks():
    """Distribution sanity (round-1 verdict item 1): the same planted
    near-dups are found when the corpus is split across MANY blocks —
    candidate gen, join verify and CC all run distributed; nothing
    depends on block boundaries."""
    rows = []
    for i in range(60):
        rows.append({"doc_id": i, "text": " ".join(f"mb{i}_{j}" for j in range(60))})
    rows.append({"doc_id": 300, "text": rows[7]["text"]})
    rows.append({"doc_id": 301, "text": rows[8]["text"].replace("mb8_3 ", "X ")})
    ds = ray.data.from_items(rows, override_num_blocks=31)
    out = datapipe.minhash_dedup(ds, threshold=0.6).to_pandas()
    cl = dict(zip(out["doc_id"], out["cluster_id"]))
    assert len(out) == len(rows)
    assert cl[300] == cl[7] == 7
    assert cl[301] == cl[8] == 8
    assert cl[9] == 9


def test_pack_sequences_partition_invariant():
    """Packing output is a pure function of the data: identical bins for
    1 block and for many blocks (round-1 verdict item 8)."""
    rows = [
        {"doc_id": i, "text": " ".join("w" for _ in range(5 + (i * 7) % 40))}
        for i in range(200)
    ]
    one = datapipe.pack_sequences(
        ray.data.from_items(rows, override_num_blocks=1), capacity=64
    ).to_pandas().sort_values("doc_id").reset_index(drop=True)
    many = datapipe.pack_sequences(
        ray.data.from_items(rows, override_num_blocks=17), capacity=64
    ).to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert one.equals(many)


def test_embedding_dedup_lsh_matches_planted(emb):
    """Bucketed (LSH) embedding dedup finds the planted exact duplicate
    (identical vectors collide in every table → recall 1 for them)."""
    import pandas as pd

    tab = emb.to_pandas().head(50)
    dup = tab.iloc[[0]].assign(vec_id=999)
    ds = ray.data.from_pandas(pd.concat([tab, dup], ignore_index=True))
    out = datapipe.embedding_dedup(ds, threshold=0.999).to_pandas()
    assert ((out["a"] == 0) & (out["b"] == 999)).any()
    assert (out["cosine"] >= 0.999).all()


def test_attach_payload_reduce_side_path(monkeypatch):
    """Force the >broadcast-limit reduce-side hash join (storage-shuffle
    exchange) by shrinking _BROADCAST_LIMIT_BYTES to zero: minhash and
    ngram dedup must still find the planted near-dups — the big-side
    path is exercised, not just the broadcast path CI normally hits."""
    monkeypatch.setattr(datapipe, "_BROADCAST_LIMIT_BYTES", 0)
    rows = []
    for i in range(30):
        rows.append({"doc_id": i, "text": " ".join(f"rj{i}_{j}" for j in range(60))})
    rows.append({"doc_id": 200, "text": rows[4]["text"]})
    ds = ray.data.from_items(rows, override_num_blocks=7)
    out = datapipe.minhash_dedup(ds, threshold=0.6).to_pandas()
    cl = dict(zip(out["doc_id"], out["cluster_id"]))
    assert cl[200] == cl[4] == 4 and cl[5] == 5

    out2 = datapipe.ngram_jaccard_dedup(ds, threshold=0.8, n=3).to_pandas()
    cl2 = dict(zip(out2["doc_id"], out2["cluster_id"]))
    assert cl2[200] == cl2[4] == 4 and cl2[5] == 5

    # embedding_dedup's vector attach takes the same big-side path
    import pandas as pd

    tab = ray.data.read_parquet(f"{SF}/embeddings.parquet").to_pandas().head(40)
    dup = tab.iloc[[0]].assign(vec_id=999)
    eds = ray.data.from_pandas(pd.concat([tab, dup], ignore_index=True))
    out3 = datapipe.embedding_dedup(eds, threshold=0.999).to_pandas()
    assert ((out3["a"] == 0) & (out3["b"] == 999)).any()
    assert (out3["cosine"] >= 0.999).all()


def test_short_doc_shingles_batch_independent():
    """A short doc's shingle hash must not depend on the following doc
    in the batch (review regression)."""
    a1, _ = textfn.hash_tokens(pa.array(["hi there", "completely different doc text"]))
    a2, _ = textfn.hash_tokens(pa.array(["hi there", "some other followup entirely"]))
    s1, o1 = textfn.shingle_hashes(a1, np.array([0, 2, 6]), k=5)
    s2, o2 = textfn.shingle_hashes(a2, np.array([0, 2, 6]), k=5)
    assert s1[o1[0]:o1[1]].tolist() == s2[o2[0]:o2[1]].tolist()


def test_line_repetition_matches_python_oracle():
    texts = [
        "a\nb\na\n",            # 'a' duplicated, trailing empty line
        "xx",                    # single line, no newline
        "",                      # empty doc -> one empty line
        "l1\nl1\nl1\nzz",        # 3x duplicate + unique
        "\n\n",                  # three empty lines (dup, zero chars)
    ]
    out = {k: v.to_pylist() for k, v in
           textfn.line_repetition(pa.array(texts)).items()}
    for i, t in enumerate(texts):
        lines = t.split("\n")
        from collections import Counter
        c = Counter(lines)
        assert out["n_lines"][i] == len(lines)
        assert out["n_distinct_lines"][i] == len(c)
        assert out["dup_line_chars"][i] == sum(
            len(l) for l in lines if c[l] >= 2
        )
        assert out["line_chars"][i] == sum(len(l) for l in lines)


def test_repetition_stats_flags_spammy_doc():
    spam = "buy now\n" * 50 + "unique closing line"
    clean = "\n".join(f"line number {i} is unlike the others" for i in range(50))
    ds = ray.data.from_items([
        {"doc_id": 0, "text": spam},
        {"doc_id": 1, "text": clean},
    ])
    rows = {r["doc_id"]: r for r in datapipe.repetition_stats(ds).take_all()}
    assert rows[0]["flagged"] == 1
    assert rows[1]["flagged"] == 0
    assert rows[1]["dup_line_chars"] == 0


def test_vocab_topk_counts_and_tiebreak():
    ds = ray.data.from_items(
        [{"text": "b b b a a c"}, {"text": "a  d\tb\nc"}]
    )
    got = [(r["token"], r["cnt"]) for r in
           datapipe.vocab_topk(ds, k=3).take_all()]
    # counts: a=3, b=4, c=2, d=1 -> top3 = b(4), a(3), c(2)
    assert got == [("b", 4), ("a", 3), ("c", 2)]


def test_decontaminate_flags_overlap_only(docs):
    out = {r["doc_id"]: r for r in datapipe.decontaminate(docs).take_all()}
    n = len(out)
    assert n == docs.count()
    # benchmark docs overlap themselves (when they have >=1 shingle)
    for did, r in out.items():
        if did % 37 == 0 and r["n_shingles"] > 0:
            assert r["contaminated"] == 1
            assert 0 < r["n_hits"] <= r["n_shingles"]
        if r["n_hits"] == 0:
            assert r["contaminated"] == 0


def test_decontaminate_planted_overlap():
    bench_text = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    ds = ray.data.from_items([
        {"doc_id": 0, "text": bench_text},                    # benchmark (0%37==0)
        {"doc_id": 1, "text": "totally unrelated words here dog cat tree"},
        {"doc_id": 2, "text": "prefix " + bench_text + " suffix"},  # contains bench 8-grams
    ])
    out = {r["doc_id"]: r for r in datapipe.decontaminate(ds).take_all()}
    assert out[0]["contaminated"] == 1
    assert out[1]["contaminated"] == 0
    assert out[2]["contaminated"] == 1


def test_chunk_documents_windows():
    docs = {
        0: "",                 # empty → one empty chunk
        1: "a" * 128,          # exactly one window
        2: "a" * 129,          # one char past → second (short) window
        3: "x" * 96 + "y" * 96 + "z" * 50,  # 242 chars → k=0,1,2
        4: "short",
    }
    ds = ray.data.from_items(
        [{"doc_id": i, "text": t} for i, t in docs.items()]
    )
    out = datapipe.chunk_documents(ds, size=128, stride=96).take_all()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], {})[r["chunk_id"]] = r["chunk"]
    assert by_doc[0] == {0: ""}
    assert by_doc[1] == {0: "a" * 128}
    assert by_doc[2] == {0: "a" * 128, 1: "a" * 33}
    assert set(by_doc[3]) == {0, 1, 2}
    # windows start at k*stride and cover every character
    for k, c in by_doc[3].items():
        assert c == (docs[3])[k * 96 : k * 96 + 128]
    covered = max(k * 96 + len(c) for k, c in by_doc[3].items())
    assert covered == len(docs[3])
    assert by_doc[4] == {0: "short"}


def test_chunk_documents_empty_block():
    import pyarrow as pa

    empty = pa.table({"doc_id": pa.array([], pa.int64()),
                      "text": pa.array([], pa.string())})
    ds = ray.data.from_arrow(empty)
    assert datapipe.chunk_documents(ds, size=128, stride=96).count() == 0


def test_group_topk_matches_pandas():
    import pandas as pd

    rows = []
    for i in range(200):
        rows.append({"doc_id": i, "grp": f"g{i % 5}", "score": (i * 37) % 101})
    # planted tie: two docs in g0 share the top score — id order breaks it
    rows.append({"doc_id": 500, "grp": "g0", "score": 1000})
    rows.append({"doc_id": 501, "grp": "g0", "score": 1000})
    ds = ray.data.from_items(rows).repartition(7)
    out = (
        datapipe.group_topk(
            ds, group_col="grp", order_col="score", id_col="doc_id", k=3
        )
        .to_pandas()
        .sort_values(["grp", "rank"])
        .reset_index(drop=True)
    )
    df = pd.DataFrame(rows)
    expect = (
        df.sort_values(["grp", "score", "doc_id"], ascending=[True, False, True])
        .groupby("grp")
        .head(3)
        .reset_index(drop=True)
    )
    assert len(out) == len(expect) == 15
    got0 = out[out["grp"] == "g0"]
    assert got0["doc_id"].tolist()[:2] == [500, 501]
    assert got0["rank"].tolist() == [1, 2, 3]
    for g, sub in out.groupby("grp"):
        esub = expect[expect["grp"] == g]
        assert sub.sort_values("rank")["doc_id"].tolist() == esub["doc_id"].tolist()


def test_group_topk_partition_invariant():
    rows = [
        {"doc_id": i, "grp": f"g{i % 3}", "score": (i * 13) % 50}
        for i in range(90)
    ]
    a = (
        datapipe.group_topk(
            ray.data.from_items(rows).repartition(2),
            group_col="grp", order_col="score", id_col="doc_id", k=4,
        )
        .to_pandas().sort_values(["grp", "rank"]).reset_index(drop=True)
    )
    b = (
        datapipe.group_topk(
            ray.data.from_items(rows).repartition(13),
            group_col="grp", order_col="score", id_col="doc_id", k=4,
        )
        .to_pandas().sort_values(["grp", "rank"]).reset_index(drop=True)
    )
    assert a.equals(b)


def test_deterministic_shard_is_pure_function_of_id_and_seed():
    rows = [{"doc_id": i} for i in range(333)]
    a = (
        datapipe.deterministic_shard(
            ray.data.from_items(rows).repartition(3), n_shards=4, seed=7
        )
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    b = (
        datapipe.deterministic_shard(
            ray.data.from_items(rows).repartition(11), n_shards=4, seed=7
        )
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    assert a.equals(b)  # partitioning-invariant
    # every shard's positions are 0..n-1 dense, ordered by (h, id)
    for s, sub in a.groupby("shard"):
        sub = sub.sort_values(["h", "doc_id"]).reset_index(drop=True)
        assert sub["pos"].tolist() == list(range(len(sub)))
    # a different seed produces a different order
    c = (
        datapipe.deterministic_shard(
            ray.data.from_items(rows), n_shards=4, seed=8
        )
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    assert not a["shard"].equals(c["shard"])
