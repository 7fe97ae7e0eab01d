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

import functools
import hashlib
import json
import os
from dataclasses import asdict, dataclass, field

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from ..schema import (
    DDL_TYPE,
    EVENT_SCHEMA,
    ROW_IMAGE_TYPE,
    TABLE_COLUMNS,
    TABLE_NAME,
    event_schema,
)

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
    ddl_at: float = 0.5           # fraction of the stream before the first DDL
    bad_arity_permille: int = 0   # events emitted with a wrong col_count
    txn_size: int = 8             # events per transaction (XID cadence)
    content_bytes: int = 256      # average content payload size
    base_ts: int = 1_700_000_000  # epoch seconds of the first event
    # additional mid-stream ALTERs: (column_name, arrow_type, at_fraction);
    # the first DDL is always ("stars", "int64", ddl_at)
    extra_ddls: "tuple[tuple[str, str, float], ...]" = ()

    def ddl_specs(self) -> "list[tuple[str, str, float]]":
        specs = [("stars", "int64", self.ddl_at), *self.extra_ddls]
        return sorted(specs, key=lambda s: s[2])

    def ddl_column_names(self) -> "tuple[str, ...]":
        return tuple(s[0] for s in self.ddl_specs())

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


_N_CHUNKS = 512


@functools.lru_cache(maxsize=8)
def _chunk_dict(content_bytes: int) -> pa.Array:
    """Deterministic corpus-chunk dictionary (per content size)."""
    j = np.arange(_N_CHUNKS, dtype=np.int64)
    ln = content_bytes // 2 + (
        _h(content_bytes, 21, j) % _U64(max(content_bytes, 1))
    ).astype(np.int64)
    off = (_h(content_bytes, 22, j) % _U64(len(_CORPUS))).astype(np.int64)
    return pa.array(
        [_CORPUS2[o : o + l] for o, l in zip(off, ln)], type=pa.string()
    )


def _content(
    cfg: BinlogConfig, repo: pa.Array, path: pa.Array, keys, vers
) -> pa.Array:
    """Vectorized content payload: unique header + corpus chunk.

    Fully Arrow-kernel built (no Python loop) — generation must keep up
    with the engine it feeds at millions of events."""
    j = pa.array(
        (_h(cfg.seed, 23, keys, vers) % _U64(_N_CHUNKS)).astype(np.int64)
    )
    chunk = pc.take(_chunk_dict(cfg.content_bytes), j)
    ver_s = pa.array(np.char.mod("%d", np.asarray(vers)), type=pa.string())
    return pc.binary_join_element_wise(
        pa.scalar("// "), repo, pa.scalar("/"), path, pa.scalar("@v"),
        ver_s, pa.scalar("\n"), chunk, "",
    )


def _key_counts(cfg: BinlogConfig, keys: np.ndarray) -> np.ndarray:
    """Events per key (hot repos multiplied) — shard-local computable."""
    repo_id_k = _key_attrs(cfg, keys)[0]
    avg_extra = max(cfg.avg_events_per_key - 1.0, 0.0)
    span = max(int(round(2 * avg_extra)), 0)
    extra = (
        (_h(cfg.seed, 31, keys) % _U64(span + 1)).astype(np.int64)
        if span
        else np.zeros(len(keys), dtype=np.int64)
    )
    hot = repo_id_k < cfg.hot_repos
    extra = np.where(hot, extra * cfg.hot_multiplier, extra)
    return 1 + extra


def stream_size(cfg: BinlogConfig) -> int:
    """Total change events for a config (cheap: int arrays only)."""
    return int(_key_counts(cfg, np.arange(cfg.num_keys, dtype=np.int64)).sum())


def _feistel(e: np.ndarray, n_total: int, seed: int) -> np.ndarray:
    """Deterministic bijection [0, n_total) → [0, n_total), vectorized.

    Cycle-walking balanced Feistel network — gives every event a unique
    global stream slot WITHOUT a global argsort, so shard generation is
    embarrassingly parallel (each key-range shard computes its own events'
    positions independently; the property 10^10-event generation needs)."""
    x = np.asarray(e, dtype=_U64)
    bits = max(int(n_total - 1).bit_length(), 2)
    half = (bits + 1) // 2
    mask = _U64((1 << half) - 1)
    hs = _U64(half)

    def rounds(v: np.ndarray) -> np.ndarray:
        left = v >> hs
        right = v & mask
        for r in range(4):
            f = _h(seed, 101 + r, right) & mask
            left, right = right, left ^ f
        return (left << hs) | right

    y = rounds(x)
    oob = y >= _U64(n_total)
    while oob.any():
        y[oob] = rounds(y[oob])
        oob = y >= _U64(n_total)
    return y.astype(np.int64)


OP_INS, OP_UPD, OP_DEL = 0, 1, 2


def _op_chain(seed: int, delete_pct: int, key_idx: np.ndarray,
              ordinal: np.ndarray, starts: np.ndarray, c: np.ndarray):
    """Per-key op chain + row-image versions, shared by all table
    generators: insert first; delete runs alternate delete/re-insert;
    updates reference the previous alive version as BEFORE."""
    n = len(key_idx)
    d = (_h(seed, 32, key_idx, ordinal) % _U64(100)).astype(np.int64) < delete_pct
    d &= ordinal > 0
    d_prev = np.concatenate([[False], d[:-1]]) & (ordinal > 0)
    runstart = d & ~d_prev
    idx = np.arange(n, dtype=np.int64)
    last_start = np.maximum.accumulate(np.where(runstart, idx, -1))
    runpos = idx - last_start
    f_del = d & (runpos % 2 == 0)
    prev_del = np.concatenate([[False], f_del[:-1]]) & (ordinal > 0)
    op = np.where(
        ordinal == 0, OP_INS, np.where(f_del, OP_DEL, np.where(prev_del, OP_INS, OP_UPD))
    ).astype(np.int8)
    nondel = (op != OP_DEL).astype(np.int64)
    cs = np.cumsum(nondel)
    base = np.repeat(cs[starts] - nondel[starts], c)
    ver = cs - base - 1  # for DEL rows: version of the last alive image
    before_ver = np.where(op == OP_UPD, ver - 1, ver)
    return op, ver, before_ver


def generate_shard(
    cfg: BinlogConfig,
    k0: int,
    k1: int,
    *,
    e_offset: int,
    n_total: int,
    p0: "int | None" = None,
    ddl_bounds: "list[tuple[int, str, str]] | None" = None,
    tables: "tuple[str, ...]" = ("repos",),
) -> "tuple[pa.Table, int]":
    """Events of keys [k0, k1) as one Arrow table (+ bad-arity count).

    ``e_offset``: global key-major index of key k0's first event;
    ``n_total``: global stream size; ``ddl_bounds``: [(pos, column,
    arrow_type), ...] sorted — each ALTER widens the arity by one and
    occupies its own transaction.  ``p0`` is the legacy single-DDL form.
    ``tables``: all tables sharing the stream's union row image (this
    shard emits only ``repos`` rows; other tables' fields ride as null).
    Output is sorted by ``pos`` within the shard; global order across
    shards is defined by ``pos`` alone.
    """
    if ddl_bounds is None:
        ddl_bounds = (
            [(p0, "stars", "int64")] if p0 is not None else _ddl_bounds(cfg, n_total)
        )
    bound_pos = np.array([b[0] for b in ddl_bounds], dtype=np.int64)
    keys = np.arange(k0, k1, dtype=np.int64)
    repo_id_k, repo_k, path_k, lang_k = _key_attrs(cfg, keys)
    c = _key_counts(cfg, keys)
    n = int(c.sum())

    key_idx = np.repeat(keys, c)
    starts = np.concatenate([[0], np.cumsum(c)[:-1]])
    ordinal = np.arange(n, dtype=np.int64) - np.repeat(starts, c)

    op, ver, _before_ver = _op_chain(
        cfg.seed, cfg.delete_pct, key_idx, ordinal, starts, c
    )

    # --- global stream slots via Feistel (shard-independent) --------------
    e = e_offset + np.arange(n, dtype=np.int64)
    pos_raw = _feistel(e, n_total, cfg.seed)
    # within each key, ordinal i takes the i-th smallest assigned slot so
    # the per-key chain respects stream order (lexsort reorders only inside
    # each contiguous key block)
    assign = np.lexsort((pos_raw, key_idx))
    pos = pos_raw[assign]

    # every ALTER before a position inserts one extra transaction
    n_ddls_before = np.searchsorted(bound_pos, pos, side="right").astype(np.int64)
    gtid = pos // cfg.txn_size + n_ddls_before
    seq = (pos % cfg.txn_size).astype(np.int32)
    ts = cfg.base_ts + pos

    # --- row images -------------------------------------------------------
    repo_e = np.repeat(repo_k, c)
    path_e = np.repeat(path_k, c)
    lang_e = np.repeat(lang_k, c)

    has_after = op != OP_DEL
    has_before = op != OP_INS

    after_ver = ver
    before_ver = _before_ver

    # --- arity ------------------------------------------------------------
    # base arity derives from the schema registry — a literal 5 here
    # desyncs silently if TABLE_COLUMNS['repos'] ever grows (the decoder
    # counts len(TABLE_COLUMNS), and a mismatch drops every row)
    col_count = (len(TABLE_COLUMNS[TABLE_NAME]) + n_ddls_before).astype(np.int32)
    bad = np.zeros(n, dtype=bool)
    if cfg.bad_arity_permille:
        bad = (_h(cfg.seed, 43, key_idx, ordinal) % _U64(1000)) < _U64(
            cfg.bad_arity_permille
        )
        col_count = np.where(bad, col_count + 1, col_count)

    # --- assemble in stream (pos) order (all Arrow kernels) ---------------
    g = np.argsort(pos, kind="stable")
    keys_g = key_idx[g]
    repo_g = pa.array(repo_e[g], type=pa.string())
    path_g = pa.array(path_e[g], type=pa.string())
    lang_g = pa.array(lang_e[g], type=pa.string())
    pos_g = pos[g]
    ddl_names = tuple(b[1] for b in ddl_bounds)
    schema = event_schema(ddl_names, tables)
    image_type = schema.field("after").type

    def _img(mask, vers):
        """Masked row image; DDL-added columns carry raw strings only for
        events after their ALTER; int64 columns get a permille of
        unparsable values → NUMBER-coercion null downstream
        (/root/reference/service/endpoint/endpoint.go:180-197)."""
        m = mask[g]
        m_pa = pa.array(m)
        v = vers[g]
        commit = pa.array(_commit_hex(cfg, keys_g, v), type=pa.string())
        content = _content(cfg, repo_g, path_g, keys_g, v)
        null_s = pa.scalar(None, pa.string())
        fields = [
            pc.if_else(m_pa, repo_g, null_s),
            pc.if_else(m_pa, path_g, null_s),
            pc.if_else(m_pa, commit, null_s),
            pc.if_else(m_pa, lang_g, null_s),
            pc.if_else(m_pa, content, null_s),
        ]
        for j, (bpos, name, atype) in enumerate(ddl_bounds):
            present = pa.array(m & (pos_g >= bpos))
            if atype == "int64":
                num = (_h(cfg.seed, 41 + 2 * j, keys_g, v) % _U64(100_000)).astype(np.int64)
                badv = (_h(cfg.seed, 42 + 2 * j, keys_g, v) % _U64(1000)) < _U64(5)
                vals = np.where(badv, "notanumber", np.char.mod("%d", num))
            else:
                code = (_h(cfg.seed, 41 + 2 * j, keys_g, v) % _U64(7)).astype(np.int64)
                vals = np.char.add(f"{name}-v", np.char.mod("%d", code))
            fields.append(
                pc.if_else(present, pa.array(vals, type=pa.string()), null_s)
            )
        # other tables' union-image fields: null for repos rows
        for f in list(image_type)[len(fields):]:
            fields.append(pa.nulls(len(m), f.type))
        return pa.StructArray.from_arrays(
            fields, fields=list(image_type), mask=pa.array(~m)
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
            "before": _img(has_before, before_ver),
            "after": _img(has_after, after_ver),
            "ddl": pa.array([None] * n, type=DDL_TYPE),
        },
        schema=schema,
    )
    return tbl, int(bad.sum())


def _ddl_row(
    cfg: BinlogConfig, bound: "tuple[int, str, str]", ddl_index: int,
    ddl_names: "tuple[str, ...]",
    tables: "tuple[str, ...]" = ("repos",),
) -> pa.Table:
    """One in-band DDL event (its own transaction at its boundary)."""
    p, name, atype = bound
    schema = event_schema(ddl_names, tables)
    image_type = schema.field("after").type
    return pa.table(
        {
            "gtid": pa.array([p // cfg.txn_size + ddl_index], type=pa.int64()),
            "seq_in_txn": pa.array([0], type=pa.int32()),
            "pos": pa.array([p], type=pa.int64()),
            "op": pa.array(["ddl"], type=pa.string()),
            "table": pa.array([TABLE_NAME], type=pa.string()),
            "ts": pa.array([cfg.base_ts + p], type=pa.timestamp("s")),
            "col_count": pa.array([0], type=pa.int32()),
            "before": pa.array([None], type=image_type),
            "after": pa.array([None], type=image_type),
            "ddl": pa.array(
                [{"add_column": name, "arrow_type": atype}], type=DDL_TYPE
            ),
        },
        schema=schema,
    )


def _ddl_bounds(cfg: BinlogConfig, n: int) -> "list[tuple[int, str, str]]":
    """ALTER boundaries: distinct txn-aligned positions, stream order."""
    bounds = []
    used = set()
    for name, atype, at in cfg.ddl_specs():
        p = int(n * at) // cfg.txn_size * cfg.txn_size
        while p in used:  # force distinct transactions
            p += cfg.txn_size
        used.add(p)
        bounds.append((p, name, atype))
    return sorted(bounds)


def generate(cfg: BinlogConfig) -> GeneratedStream:
    """Build the full event stream in memory (tests / small configs)."""
    n = stream_size(cfg)
    bounds = _ddl_bounds(cfg, n)
    tbl, n_bad = generate_shard(
        cfg, 0, cfg.num_keys, e_offset=0, n_total=n, ddl_bounds=bounds
    )
    # splice each DDL row at its stream position (tbl is pos-sorted
    # 0..n-1; i earlier splices shift the insertion index by i)
    ddl_names = tuple(b[1] for b in bounds)
    parts = []
    prev = 0
    for i, b in enumerate(bounds):
        parts.append(tbl.slice(prev, b[0] - prev))
        parts.append(_ddl_row(cfg, b, i, ddl_names))
        prev = b[0]
    parts.append(tbl.slice(prev))
    full = pa.concat_tables(parts)
    return GeneratedStream(
        table=full,
        config=cfg,
        ddl_pos=bounds[0][0],
        ddl_gtid=bounds[0][0] // cfg.txn_size,
        num_change_events=n,
        num_bad_arity=n_bad,
    )


def _shard_key_ranges(cfg: BinlogConfig, shards: int, counts_fn=None):
    """Split the key space into ≤``shards`` contiguous ranges of roughly
    equal EVENT count; returns [(k0, k1, e_offset), ...]."""
    c = (counts_fn or _key_counts)(cfg, np.arange(cfg.num_keys, dtype=np.int64))
    cum = np.cumsum(c)
    n = int(cum[-1])
    targets = (np.arange(1, shards) * n) // shards
    bounds = np.unique(np.searchsorted(cum, targets, side="left") + 1)
    edges = [0, *[int(b) for b in bounds if 0 < b < cfg.num_keys], cfg.num_keys]
    out = []
    for k0, k1 in zip(edges[:-1], edges[1:]):
        out.append((k0, k1, int(cum[k0 - 1]) if k0 else 0))
    return out, n


def _write_shard(
    cfg: BinlogConfig,
    k0: int,
    k1: int,
    e_offset: int,
    n_total: int,
    ddl_bounds: "list[tuple[int, str, str]]",
    path: str,
    include_ddl: bool,
) -> "tuple[int, int]":
    tbl, n_bad = generate_shard(
        cfg, k0, k1, e_offset=e_offset, n_total=n_total, ddl_bounds=ddl_bounds
    )
    if include_ddl:
        names = tuple(b[1] for b in ddl_bounds)
        tbl = pa.concat_tables(
            [*(_ddl_row(cfg, b, i, names) for i, b in enumerate(ddl_bounds)), tbl]
        )
    pq.write_table(tbl, path)
    return tbl.num_rows, n_bad


def materialize_events(
    cfg: BinlogConfig, root: str = "/tmp/gmt_ray_events", shards: int = 16
) -> str:
    """Generate (once) and cache the stream as Parquet shards.

    Each shard covers a contiguous key range; global stream order is
    defined by the ``pos`` column (Feistel slot), not by file order.  When
    Ray is initialised, shards are generated in PARALLEL Ray tasks — the
    same code path that would fan 10^10-event generation across a cluster
    (and, in this sandbox, the only way around the VM's slow first-touch
    page faults: they parallelize across worker processes).
    """
    out = os.path.join(root, f"{cfg.fingerprint()}-s{shards}")
    meta_path = os.path.join(out, "_meta.json")
    if os.path.exists(meta_path):
        return out
    ranges, n = _shard_key_ranges(cfg, shards)
    bounds = _ddl_bounds(cfg, n)
    # per-process tmp: a shared deterministic tmp dir lets a concurrent
    # generator (bench + pytest) write into the SAME directory; after the
    # winner os.replace()s it away, the loser's open shard handles keep
    # writing into the COMMITTED files (rename moves the inode, not the
    # fd) — transiently corrupting a published cache
    tmp = f"{out}.tmp.{os.getpid()}"
    os.makedirs(tmp, exist_ok=True)

    jobs = [
        (k0, k1, e_off, os.path.join(tmp, f"events-{i:05d}.parquet"), i == 0)
        for i, (k0, k1, e_off) in enumerate(ranges)
    ]
    import ray

    if ray.is_initialized() and len(jobs) > 1:
        task = ray.remote(num_cpus=1)(_write_shard)
        results = ray.get(
            [
                task.remote(cfg, k0, k1, e_off, n, bounds, path, ddl)
                for k0, k1, e_off, path, ddl in jobs
            ]
        )
    else:
        results = [
            _write_shard(cfg, k0, k1, e_off, n, bounds, path, ddl)
            for k0, k1, e_off, path, ddl in jobs
        ]
    n_bad = sum(r[1] for r in results)
    with open(os.path.join(tmp, "_meta.json"), "w") as f:
        json.dump(
            {
                "config": asdict(cfg),
                "ddl_pos": bounds[0][0],
                "ddl_gtid": bounds[0][0] // cfg.txn_size,
                "ddl_bounds": bounds,
                "num_change_events": n,
                "num_bad_arity": n_bad,
            },
            f,
        )
    try:
        os.replace(tmp, out)
    except OSError:
        # concurrent generator won the race and committed the same cache;
        # ours is byte-identical (pure function of cfg) — discard it
        if os.path.exists(meta_path):
            import shutil

            shutil.rmtree(tmp, ignore_errors=True)
        else:
            raise
    return out


def read_meta(events_dir: str) -> dict:
    with open(os.path.join(events_dir, "_meta.json")) as f:
        return json.load(f)


# ---------------------------------------------------------------------------
# multi-table stream: a second table ("users") interleaved in the SAME
# GTID stream.  The reference's normal operating mode is N tables riding
# one binlog, each event routed to its table's rule
# (/root/reference/service/transfer_service.go:206-276 builds a rule per
# concrete table; service/handler.go:83-86 routes by ruleKey).  The two
# tables share one global slot bijection (the Feistel over the COMBINED
# event count), so their transactions genuinely interleave — a gtid may
# contain both tables' rows, exactly like a real binlog.

USERS_TABLE = "users"
_PLANS = ["free", "pro", "team", "enterprise"]


def _user_key_counts(ucfg: BinlogConfig, keys: np.ndarray) -> np.ndarray:
    avg_extra = max(ucfg.avg_events_per_key - 1.0, 0.0)
    span = max(int(round(2 * avg_extra)), 0)
    extra = (
        (_h(ucfg.seed, 61, keys) % _U64(span + 1)).astype(np.int64)
        if span
        else np.zeros(len(keys), dtype=np.int64)
    )
    return 1 + extra


def users_stream_size(ucfg: BinlogConfig) -> int:
    return int(
        _user_key_counts(ucfg, np.arange(ucfg.num_keys, dtype=np.int64)).sum()
    )


def generate_users_shard(
    ucfg: BinlogConfig,
    k0: int,
    k1: int,
    *,
    e_offset: int,
    n_total: int,
    ddl_bounds: "list[tuple[int, str, str]]",
    stream: BinlogConfig,
    tables: "tuple[str, ...]" = ("repos", "users"),
) -> "tuple[pa.Table, int]":
    """users-table events for key range [k0, k1): union image schema with
    the users fields populated and all repos/DDL fields null.

    ``stream`` carries the GLOBAL stream parameters (Feistel seed, txn
    size, base ts) shared with the repos shards — one bijection over the
    combined slot range is what interleaves the two tables.  users has a
    fixed arity of 4 (no DDL ever widens it); the repos ALTERs still
    shift its gtids (they occupy global transactions)."""
    bound_pos = np.array([b[0] for b in ddl_bounds], dtype=np.int64)
    keys = np.arange(k0, k1, dtype=np.int64)
    c = _user_key_counts(ucfg, keys)
    n = int(c.sum())
    key_idx = np.repeat(keys, c)
    starts = np.concatenate([[0], np.cumsum(c)[:-1]])
    ordinal = np.arange(n, dtype=np.int64) - np.repeat(starts, c)
    op, ver, before_ver = _op_chain(
        ucfg.seed, ucfg.delete_pct, key_idx, ordinal, starts, c
    )

    e = e_offset + np.arange(n, dtype=np.int64)
    pos_raw = _feistel(e, n_total, stream.seed)
    assign = np.lexsort((pos_raw, key_idx))
    pos = pos_raw[assign]
    n_ddls_before = np.searchsorted(bound_pos, pos, side="right").astype(np.int64)
    gtid = pos // stream.txn_size + n_ddls_before
    seq = (pos % stream.txn_size).astype(np.int32)
    ts = stream.base_ts + pos

    width = len(TABLE_COLUMNS[USERS_TABLE])
    col_count = np.full(n, width, dtype=np.int32)
    bad = np.zeros(n, dtype=bool)
    if ucfg.bad_arity_permille:
        bad = (_h(ucfg.seed, 63, key_idx, ordinal) % _U64(1000)) < _U64(
            ucfg.bad_arity_permille
        )
        col_count = np.where(bad, col_count + 1, col_count)

    g = np.argsort(pos, kind="stable")
    keys_g = key_idx[g]
    ddl_names = tuple(b[1] for b in ddl_bounds)
    schema = event_schema(ddl_names, tables)
    image_type = schema.field("after").type
    n_prefix = len(TABLE_COLUMNS[tables[0]]) + len(ddl_bounds)
    uid_g = np.char.mod("u%06d", keys_g)
    name_g = np.char.add("user-", np.char.mod("%06d", keys_g))

    def _img(mask: np.ndarray, vers: np.ndarray) -> pa.StructArray:
        m = mask[g]
        m_pa = pa.array(m)
        v = vers[g]
        dom = (_h(ucfg.seed, 64, keys_g, v) % _U64(5)).astype(np.int64)
        email = np.char.add(
            np.char.add(np.char.mod("u%d", keys_g), np.char.mod(".v%d", v)),
            np.char.mod("@mail%d.example", dom),
        )
        plan_i = (_h(ucfg.seed, 65, keys_g, v) % _U64(len(_PLANS))).astype(np.int64)
        plan = np.array(_PLANS, dtype=object)[plan_i]
        null_s = pa.scalar(None, pa.string())
        fields: list = [
            pa.nulls(len(m), f.type) for f in list(image_type)[:n_prefix]
        ]
        for vals in (uid_g, name_g, email, plan):
            fields.append(
                pc.if_else(
                    m_pa, pa.array(vals.astype(object), type=pa.string()), null_s
                )
            )
        return pa.StructArray.from_arrays(
            fields, fields=list(image_type), mask=pa.array(~m)
        )

    op_str = np.array(["insert", "update", "delete"], dtype=object)[op[g]]
    tbl = pa.table(
        {
            "gtid": pa.array(gtid[g], type=pa.int64()),
            "seq_in_txn": pa.array(seq[g], type=pa.int32()),
            "pos": pa.array(pos[g], type=pa.int64()),
            "op": pa.array(op_str, type=pa.string()),
            "table": pa.array(np.full(n, USERS_TABLE, dtype=object), type=pa.string()),
            "ts": pa.array(ts[g], type=pa.timestamp("s")),
            "col_count": pa.array(col_count[g], type=pa.int32()),
            "before": _img(op != OP_INS, before_ver),
            "after": _img(op != OP_DEL, ver),
            "ddl": pa.array([None] * n, type=DDL_TYPE),
        },
        schema=schema,
    )
    return tbl, int(bad.sum())


def _write_multi_shard(
    kind: str,
    cfg: BinlogConfig,
    ucfg: BinlogConfig,
    k0: int,
    k1: int,
    e_offset: int,
    n_total: int,
    ddl_bounds: "list[tuple[int, str, str]]",
    path: str,
    include_ddl: bool,
    tables: "tuple[str, ...]",
) -> "tuple[int, int]":
    if kind == "repos":
        tbl, n_bad = generate_shard(
            cfg, k0, k1, e_offset=e_offset, n_total=n_total,
            ddl_bounds=ddl_bounds, tables=tables,
        )
    else:
        tbl, n_bad = generate_users_shard(
            ucfg, k0, k1, e_offset=e_offset, n_total=n_total,
            ddl_bounds=ddl_bounds, stream=cfg, tables=tables,
        )
    if include_ddl:
        names = tuple(b[1] for b in ddl_bounds)
        tbl = pa.concat_tables(
            [*(_ddl_row(cfg, b, i, names, tables) for i, b in enumerate(ddl_bounds)), tbl]
        )
    pq.write_table(tbl, path)
    return tbl.num_rows, n_bad


def materialize_multi_events(
    cfg: BinlogConfig,
    ucfg: BinlogConfig,
    root: str = "/tmp/gmt_ray_multi_events",
    shards: int = 16,
) -> str:
    """Generate (once) and cache a TWO-TABLE interleaved stream.

    ``cfg`` drives the repos table and the global stream parameters
    (seed, txn size, DDL fractions); ``ucfg`` drives the users table.
    Shard files mix freely in one directory — global order is the shared
    ``pos`` slot space, exactly as in ``materialize_events``."""
    out = os.path.join(
        root, f"{cfg.fingerprint()}-{ucfg.fingerprint()}-s{shards}"
    )
    meta_path = os.path.join(out, "_meta.json")
    if os.path.exists(meta_path):
        return out
    tables = ("repos", USERS_TABLE)
    n_a = stream_size(cfg)
    n_b = users_stream_size(ucfg)
    n_total = n_a + n_b
    bounds = _ddl_bounds(cfg, n_total)
    sh_a = max(1, min(shards - 1, round(shards * n_a / n_total))) if shards > 1 else 1
    sh_b = max(1, shards - sh_a)
    ranges_a, _ = _shard_key_ranges(cfg, sh_a)
    ranges_b, _ = _shard_key_ranges(ucfg, sh_b, _user_key_counts)
    # per-process tmp: a shared deterministic tmp dir lets a concurrent
    # generator (bench + pytest) write into the SAME directory; after the
    # winner os.replace()s it away, the loser's open shard handles keep
    # writing into the COMMITTED files (rename moves the inode, not the
    # fd) — transiently corrupting a published cache
    tmp = f"{out}.tmp.{os.getpid()}"
    os.makedirs(tmp, exist_ok=True)

    jobs = []
    i = 0
    for k0, k1, e_off in ranges_a:
        jobs.append(("repos", k0, k1, e_off,
                     os.path.join(tmp, f"events-{i:05d}.parquet"), i == 0))
        i += 1
    for k0, k1, e_off in ranges_b:
        # users slots live after the repos block in the combined index
        jobs.append(("users", k0, k1, n_a + e_off,
                     os.path.join(tmp, f"events-{i:05d}.parquet"), False))
        i += 1

    import ray

    if ray.is_initialized() and len(jobs) > 1:
        task = ray.remote(num_cpus=1)(_write_multi_shard)
        results = ray.get(
            [
                task.remote(kind, cfg, ucfg, k0, k1, e_off, n_total, bounds,
                            path, ddl, tables)
                for kind, k0, k1, e_off, path, ddl in jobs
            ]
        )
    else:
        results = [
            _write_multi_shard(kind, cfg, ucfg, k0, k1, e_off, n_total,
                               bounds, path, ddl, tables)
            for kind, k0, k1, e_off, path, ddl in jobs
        ]
    with open(os.path.join(tmp, "_meta.json"), "w") as f:
        json.dump(
            {
                "config": asdict(cfg),
                "users_config": asdict(ucfg),
                "tables": list(tables),
                "ddl_bounds": bounds,
                "num_change_events": n_total,
                "num_repos_events": n_a,
                "num_users_events": n_b,
                "num_bad_arity": sum(r[1] for r in results),
            },
            f,
        )
    try:
        os.replace(tmp, out)
    except OSError:
        if os.path.exists(meta_path):
            import shutil

            shutil.rmtree(tmp, ignore_errors=True)
        else:
            raise
    return out
