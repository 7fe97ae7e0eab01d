"""Deterministic synthetic MySQL binlog / GTID event stream generator.

Replaces the reference's live canal replication source
(/root/reference/service/transfer_service.go:106-134) with a seeded,
reproducible change-event stream over a source-code-repos base table
(BASELINE.json input_hint shape).  Mirrors the semantics the reference's
handler produces:

* insert/update/delete row events; updates carry (before, after) image
  pairs exactly like canal's paired rows
  (/root/reference/service/handler.go:94-107);
* transaction boundaries (XID analogue,
  /root/reference/service/handler.go:73-80) become ``(gtid, seq_in_txn)``;
* one mid-stream DDL adding a column (``stars:int64``), the analogue of
  ``OnTableChanged`` (/root/reference/service/handler.go:56-62);
* a configurable permille of events with a wrong row-image arity, which
  every reference endpoint drops with a warning
  (/root/reference/service/endpoint/redis.go:106-109);
* Zipf-ish hot repos (skew knob for the salted-partitioning fixture).

Everything is a pure function of ``BinlogConfig`` — byte-identical output
for a given config.  Generation is vectorized numpy; per-key event chains
are valid (first op is insert; delete may be followed by re-insert; updates
reference the previous version as the BEFORE image).

Scale note: generation is *input prep*, cached to Parquet shards once
(``materialize_events``).  The per-key chain construction is shard-local
over key ranges, so at 10^10-event scale the same code runs inside
``map_batches`` over a ``ray.data.range(num_keys)`` dataset followed by a
sort on ``pos`` — the interleave rank of each event is a deterministic hash,
not a global counter.
"""

from __future__ import annotations

import hashlib
import json
import os
from dataclasses import asdict, dataclass, field

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from ..schema import DDL_TYPE, EVENT_SCHEMA, ROW_IMAGE_TYPE, TABLE_NAME

_U64 = np.uint64
_P1 = _U64(0x9E3779B97F4A7C15)
_P2 = _U64(0xBF58476D1CE4E5B9)
_P3 = _U64(0x94D049BB133111EB)

_EXTS = ["py", "go", "rs", "js", "md", "c", "ts", "java"]
_LANGS = ["python", "go", "rust", "javascript", "markdown", "c", "typescript", "java"]

# Deterministic pseudo-source corpus for content payloads.
_WORDS = (
    "fn def let const var return import package struct class impl trait "
    "match case switch for while range yield async await chan go select "
    "map filter reduce sort merge join group key value index table row "
    "batch stream shard partition replica commit log offset checkpoint "
).split()
_CORPUS = " ".join(_WORDS[(i * 7) % len(_WORDS)] for i in range(4096))
_CORPUS2 = _CORPUS + _CORPUS  # wrap-around slicing


def _mix(x: np.ndarray) -> np.ndarray:
    """splitmix64 finalizer — deterministic avalanche hash on uint64."""
    x = (x + _P1) & ~_U64(0)
    x ^= x >> _U64(30)
    x *= _P2
    x ^= x >> _U64(27)
    x *= _P3
    x ^= x >> _U64(31)
    return x


def _h(seed: int, salt: int, a: np.ndarray, b: np.ndarray | int = 0) -> np.ndarray:
    a = np.asarray(a, dtype=_U64)
    b = np.asarray(b, dtype=_U64)
    const = _U64((seed * 0x94D049BB133111EB + salt) & 0xFFFFFFFFFFFFFFFF)
    x = a * _U64(0x9E3779B1) + b * _U64(0x85EBCA77) + const
    return _mix(x)


@dataclass(frozen=True)
class BinlogConfig:
    seed: int = 42
    num_keys: int = 1000          # distinct (repo, path) keys
    avg_events_per_key: float = 4.0
    n_orgs: int = 7
    repos_per_org: int = 5
    hot_repos: int = 1            # first N repo ids get hot_multiplier x events
    hot_multiplier: int = 1       # 1 = no skew; skew fixture uses e.g. 20
    delete_pct: int = 12          # % of non-first events proposed as delete
    ddl_at: float = 0.5           # fraction of the stream before the DDL
    bad_arity_permille: int = 0   # events emitted with a wrong col_count
    txn_size: int = 8             # events per transaction (XID cadence)
    content_bytes: int = 256      # average content payload size
    base_ts: int = 1_700_000_000  # epoch seconds of the first event

    def fingerprint(self) -> str:
        return hashlib.sha256(
            json.dumps(asdict(self), sort_keys=True).encode()
        ).hexdigest()[:16]


@dataclass
class GeneratedStream:
    """In-memory generated stream + the facts tests need."""

    table: pa.Table
    config: BinlogConfig
    ddl_pos: int = 0
    ddl_gtid: int = 0
    num_change_events: int = 0
    num_bad_arity: int = 0


def _key_attrs(cfg: BinlogConfig, keys: np.ndarray):
    """repo_id / repo / path / lang for an array of key ids (shard-local)."""
    n_repos = cfg.n_orgs * cfg.repos_per_org
    u = _h(cfg.seed, 1, keys).astype(np.float64) / float(2**64)
    repo_id = np.minimum((n_repos * u * u).astype(np.int64), n_repos - 1)
    dir_h = (_h(cfg.seed, 2, keys) % _U64(97)).astype(np.int64)
    ext_i = (keys % len(_EXTS)).astype(np.int64)
    repo = np.array(
        [f"org{r % cfg.n_orgs}/repo{r // cfg.n_orgs}" for r in repo_id], dtype=object
    )
    path = np.array(
        [
            f"src/d{d:02d}/f{k}.{_EXTS[e]}"
            for d, k, e in zip(dir_h, keys, ext_i)
        ],
        dtype=object,
    )
    lang = np.array([_LANGS[e] for e in ext_i], dtype=object)
    return repo_id, repo, path, lang


def _commit_hex(cfg: BinlogConfig, keys: np.ndarray, vers: np.ndarray) -> np.ndarray:
    h1 = _h(cfg.seed, 11, keys, vers)
    h2 = _h(cfg.seed, 12, keys, vers)
    h3 = _h(cfg.seed, 13, keys, vers)
    return np.char.add(
        np.char.add(np.char.mod("%016x", h1), np.char.mod("%016x", h2)),
        np.char.mod("%08x", (h3 & _U64(0xFFFFFFFF)).astype(np.uint32)),
    ).astype(object)


def _content(cfg: BinlogConfig, repo, path, keys, vers) -> list[str]:
    ln = (
        cfg.content_bytes // 2
        + (_h(cfg.seed, 21, keys, vers) % _U64(max(cfg.content_bytes, 1)))
    ).astype(np.int64)
    off = (_h(cfg.seed, 22, keys, vers) % _U64(len(_CORPUS))).astype(np.int64)
    return [
        f"// {r}/{p}@v{v}\n" + _CORPUS2[o : o + l]
        for r, p, v, o, l in zip(repo, path, vers, off, ln)
    ]


def generate(cfg: BinlogConfig) -> GeneratedStream:
    """Build the full event stream in memory (driver-side; vectorized)."""
    K = cfg.num_keys
    keys = np.arange(K, dtype=np.int64)
    repo_id_k, repo_k, path_k, lang_k = _key_attrs(cfg, keys)

    # --- events per key (hot repos multiplied) ---------------------------
    avg_extra = max(cfg.avg_events_per_key - 1.0, 0.0)
    span = max(int(round(2 * avg_extra)), 0)
    extra = (
        (_h(cfg.seed, 31, keys) % _U64(span + 1)).astype(np.int64)
        if span
        else np.zeros(K, dtype=np.int64)
    )
    hot = repo_id_k < cfg.hot_repos
    extra = np.where(hot, extra * cfg.hot_multiplier, extra)
    c = 1 + extra
    n = int(c.sum())

    key_idx = np.repeat(keys, c)
    starts = np.concatenate([[0], np.cumsum(c)[:-1]])
    ordinal = np.arange(n, dtype=np.int64) - np.repeat(starts, c)

    # --- op chain: insert first; delete runs alternate delete/re-insert ---
    d = (_h(cfg.seed, 32, key_idx, ordinal) % _U64(100)).astype(np.int64) < cfg.delete_pct
    d &= ordinal > 0
    d_prev = np.concatenate([[False], d[:-1]]) & (ordinal > 0)
    runstart = d & ~d_prev
    idx = np.arange(n, dtype=np.int64)
    last_start = np.maximum.accumulate(np.where(runstart, idx, -1))
    runpos = idx - last_start
    f_del = d & (runpos % 2 == 0)
    prev_del = np.concatenate([[False], f_del[:-1]]) & (ordinal > 0)
    OP_INS, OP_UPD, OP_DEL = 0, 1, 2
    op = np.where(
        ordinal == 0, OP_INS, np.where(f_del, OP_DEL, np.where(prev_del, OP_INS, OP_UPD))
    ).astype(np.int8)

    # --- content versions -------------------------------------------------
    nondel = (op != OP_DEL).astype(np.int64)
    cs = np.cumsum(nondel)
    base = np.repeat(cs[starts] - nondel[starts], c)
    ver = cs - base - 1  # for DEL rows: version of the last alive image

    # --- interleave ranks → global order (gtid, seq) ----------------------
    draw = (_h(cfg.seed, 33, key_idx, ordinal) >> _U64(1)).astype(np.int64)
    order_in_key = np.lexsort((draw, key_idx))
    rank = draw[order_in_key]  # i-th smallest draw of each key → chain pos i
    global_order = np.argsort(rank, kind="stable")
    pos = np.empty(n, dtype=np.int64)
    pos[global_order] = np.arange(n, dtype=np.int64)

    p0 = int(n * cfg.ddl_at) // cfg.txn_size * cfg.txn_size  # DDL txn boundary
    post = pos >= p0
    gtid = pos // cfg.txn_size + post.astype(np.int64)
    seq = (pos % cfg.txn_size).astype(np.int32)
    ts = cfg.base_ts + pos

    # --- row images -------------------------------------------------------
    repo_e = np.repeat(repo_k, c)
    path_e = np.repeat(path_k, c)
    lang_e = np.repeat(lang_k, c)

    has_after = op != OP_DEL
    has_before = op != OP_INS

    after_ver = ver
    before_ver = np.where(op == OP_UPD, ver - 1, ver)

    commit_after = _commit_hex(cfg, key_idx, after_ver)
    commit_before = _commit_hex(cfg, key_idx, before_ver)
    content_after = _content(cfg, repo_e, path_e, key_idx, after_ver)
    content_before = _content(cfg, repo_e, path_e, key_idx, before_ver)

    # stars: raw string values, only present post-DDL (null before); a
    # permille of values are unparsable → NUMBER-coercion null
    # (/root/reference/service/endpoint/endpoint.go:180-197).
    stars_num = (_h(cfg.seed, 41, key_idx, after_ver) % _U64(100_000)).astype(np.int64)
    stars_bad = (_h(cfg.seed, 42, key_idx, after_ver) % _U64(1000)) < _U64(5)
    stars_after = np.where(stars_bad, "notanumber", stars_num.astype(str)).astype(object)
    stars_valid_after = post & has_after
    bstars_num = (_h(cfg.seed, 41, key_idx, before_ver) % _U64(100_000)).astype(np.int64)
    bstars_bad = (_h(cfg.seed, 42, key_idx, before_ver) % _U64(1000)) < _U64(5)
    stars_before = np.where(bstars_bad, "notanumber", bstars_num.astype(str)).astype(object)
    stars_valid_before = post & has_before

    # --- arity ------------------------------------------------------------
    col_count = np.where(post, 6, 5).astype(np.int32)
    bad = np.zeros(n, dtype=bool)
    if cfg.bad_arity_permille:
        bad = (_h(cfg.seed, 43, key_idx, ordinal) % _U64(1000)) < _U64(
            cfg.bad_arity_permille
        )
        col_count = np.where(bad, col_count + 1, col_count)

    # --- assemble in global stream order ---------------------------------
    g = global_order

    def _img(mask, commits, contents, stars, stars_valid):
        m = mask[g]
        fields = [
            pa.array(np.where(m, repo_e[g], None), type=pa.string()),
            pa.array(np.where(m, path_e[g], None), type=pa.string()),
            pa.array(np.where(m, commits[g], None), type=pa.string()),
            pa.array(np.where(m, lang_e[g], None), type=pa.string()),
            pa.array(
                [contents[i] if mask[i] else None for i in g], type=pa.string()
            ),
            pa.array(
                np.where(m & stars_valid[g], stars[g], None), type=pa.string()
            ),
        ]
        return pa.StructArray.from_arrays(
            fields,
            fields=list(ROW_IMAGE_TYPE),
            mask=pa.array(~m),
        )

    op_str = np.array(["insert", "update", "delete"], dtype=object)[op[g]]
    tbl = pa.table(
        {
            "gtid": pa.array(gtid[g], type=pa.int64()),
            "seq_in_txn": pa.array(seq[g], type=pa.int32()),
            "pos": pa.array(pos[g], type=pa.int64()),
            "op": pa.array(op_str, type=pa.string()),
            "table": pa.array(np.full(n, TABLE_NAME, dtype=object), type=pa.string()),
            "ts": pa.array(ts[g], type=pa.timestamp("s")),
            "col_count": pa.array(col_count[g], type=pa.int32()),
            "before": _img(has_before, commit_before, content_before, stars_before, stars_valid_before),
            "after": _img(has_after, commit_after, content_after, stars_after, stars_valid_after),
            "ddl": pa.array([None] * n, type=DDL_TYPE),
        },
        schema=EVENT_SCHEMA,
    )

    # --- the in-band DDL event (own transaction at the p0 boundary) -------
    ddl_gtid = p0 // cfg.txn_size
    ddl_row = pa.table(
        {
            "gtid": pa.array([ddl_gtid], type=pa.int64()),
            "seq_in_txn": pa.array([0], type=pa.int32()),
            "pos": pa.array([p0], type=pa.int64()),
            "op": pa.array(["ddl"], type=pa.string()),
            "table": pa.array([TABLE_NAME], type=pa.string()),
            "ts": pa.array([cfg.base_ts + p0], type=pa.timestamp("s")),
            "col_count": pa.array([0], type=pa.int32()),
            "before": pa.array([None], type=ROW_IMAGE_TYPE),
            "after": pa.array([None], type=ROW_IMAGE_TYPE),
            "ddl": pa.array(
                [{"add_column": "stars", "arrow_type": "int64"}], type=DDL_TYPE
            ),
        },
        schema=EVENT_SCHEMA,
    )

    # splice the DDL row at its stream position
    full = pa.concat_tables([tbl.slice(0, p0), ddl_row, tbl.slice(p0)])
    return GeneratedStream(
        table=full,
        config=cfg,
        ddl_pos=p0,
        ddl_gtid=ddl_gtid,
        num_change_events=n,
        num_bad_arity=int(bad.sum()),
    )


def materialize_events(
    cfg: BinlogConfig, root: str = "/tmp/gmt_ray_events", shards: int = 16
) -> str:
    """Generate (once) and cache the stream as ordered Parquet shards.

    Returns the shard directory.  Layout: ``events-{i:05d}.parquet`` in
    stream order plus a ``_meta.json`` with the config and DDL facts —
    the resumable-input contract (each shard is an ordered binlog segment).
    """
    out = os.path.join(root, cfg.fingerprint())
    meta_path = os.path.join(out, "_meta.json")
    if os.path.exists(meta_path):
        return out
    stream = generate(cfg)
    tmp = out + ".tmp"
    os.makedirs(tmp, exist_ok=True)
    t = stream.table
    n = t.num_rows
    shards = max(1, min(shards, n))
    step = (n + shards - 1) // shards
    for i in range(shards):
        pq.write_table(
            t.slice(i * step, step), os.path.join(tmp, f"events-{i:05d}.parquet")
        )
    with open(os.path.join(tmp, "_meta.json"), "w") as f:
        json.dump(
            {
                "config": asdict(cfg),
                "ddl_pos": stream.ddl_pos,
                "ddl_gtid": stream.ddl_gtid,
                "num_change_events": stream.num_change_events,
                "num_bad_arity": stream.num_bad_arity,
            },
            f,
        )
    os.replace(tmp, out)
    return out


def read_meta(events_dir: str) -> dict:
    with open(os.path.join(events_dir, "_meta.json")) as f:
        return json.load(f)
