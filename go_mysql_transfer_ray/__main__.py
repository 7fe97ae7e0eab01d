"""CLI — the reference's main.go surface, Ray-Data-shaped.

Reference modes (/root/reference/main.go:92-189): default run =
incremental sync; ``-stock`` = full import; ``-position`` = overwrite the
saved binlog position; ``-status`` = print it.  Here the "position" is
the per-partition manifest watermark set (state/manifest.py).

    python -m go_mysql_transfer_ray generate --num-keys 20000 --out /tmp/ev
    python -m go_mysql_transfer_ray stock    --base t.parquet --out /tmp/lake
    python -m go_mysql_transfer_ray replay   --events /tmp/ev --out /tmp/lake
    python -m go_mysql_transfer_ray status   --out /tmp/lake
    python -m go_mysql_transfer_ray position --out /tmp/lake --force-watermark 0

This module owns its Ray session (the library never calls ray.init).
"""

from __future__ import annotations

import argparse
import json
import os


def _ray_session(num_cpus: int):
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=num_cpus,
            include_dashboard=False,
            ignore_reinit_error=True,
        )
    return ray


def cmd_generate(args) -> dict:
    from .sources.binlog import BinlogConfig, materialize_events, read_meta

    ray = _ray_session(args.num_cpus)
    cfg = BinlogConfig(
        num_keys=args.num_keys,
        avg_events_per_key=args.events_per_key,
        delete_pct=args.delete_pct,
        hot_repos=args.hot_repos,
        hot_multiplier=args.hot_multiplier,
        bad_arity_permille=args.bad_arity_permille,
        seed=args.seed,
    )
    d = materialize_events(cfg, root=args.out, shards=args.shards)
    ray.shutdown()
    return {"events_dir": d, **read_meta(d)}


def cmd_stock(args) -> dict:
    from .pipelines import cdc

    ray = _ray_session(args.num_cpus)
    m = cdc.stock_import(
        args.base, args.out, num_partitions=args.num_partitions
    )
    ray.shutdown()
    return m


def cmd_replay(args) -> dict:
    from .pipelines import cdc

    ray = _ray_session(args.num_cpus)
    m = cdc.replay(
        args.events,
        args.out,
        num_partitions=args.num_partitions,
        resume=not args.no_resume,
        base_dir=args.base_dir,
    )
    ray.shutdown()
    return m


def cmd_cluster(args) -> dict:
    """Cluster mode (main.go -stderr + cluster config path): contend on
    the lake's lease, replay as the elected leader, stand by otherwise
    (service/cluster_service.go:43-61)."""
    import socket

    from .pipelines.cluster import replay_as_cluster_node

    node = args.node or f"{socket.gethostname()}:{os.getpid()}"
    ray = _ray_session(args.num_cpus)
    m = replay_as_cluster_node(
        args.events,
        args.out,
        node,
        ttl=args.ttl,
        max_wait=args.max_wait,
        num_partitions=args.num_partitions,
    )
    ray.shutdown()
    return m


def cmd_tail(args) -> dict:
    """Default reference mode: incremental sync — apply a new event batch
    on top of the existing lake (main.go:92-136 steady state)."""
    from .pipelines import cdc

    ray = _ray_session(args.num_cpus)
    m = cdc.incremental_replay(
        args.events, args.out, num_partitions=args.num_partitions
    )
    ray.shutdown()
    return m


def cmd_status(args) -> dict:
    """-status: print the saved position (main.go:111-119)."""
    from .state import manifest as mstate

    ms = mstate.load_manifests(args.out)
    if not ms:
        return {"out": args.out, "partitions": 0, "watermark": None}
    wms = [m["gtid_watermark"] for m in ms.values()]
    return {
        "out": args.out,
        "partitions": len(ms),
        "rows": sum(m["rows"] for m in ms.values()),
        "watermark_min": min(wms),
        "watermark_max": max(wms),
    }


def cmd_position(args) -> dict:
    """-position: overwrite the saved position (main.go:156-189) — here:
    force every partition manifest's watermark so the next replay
    recomputes (or skips) accordingly.

    Input validation parity with the reference (main.go:171-181: the
    binlog File must look like 'mysql-bin.000001' and Position must be a
    number): the watermark must be a GTID ≥ -1 (-1 = 'replay
    everything'), and the target must actually be a lake with manifests
    — a typo'd --out silently touching nothing would be the analogue of
    saving a position to the wrong storage."""
    from .state import manifest as mstate

    if args.force_watermark < -1:
        raise SystemExit(
            "error: --force-watermark must be a GTID >= -1 "
            "(-1 replays everything)"
        )
    n = mstate.set_watermarks(args.out, args.force_watermark)
    if n == 0:
        raise SystemExit(
            f"error: no partition manifests under {args.out!r} "
            "(not a lake, or never replayed)"
        )
    return {"out": args.out, "partitions": n, "watermark": args.force_watermark}


def cmd_run(args) -> dict:
    """The reference's default mode: run the configured sync
    (main.go:92-136 — config file → target endpoint → consume).  Parses
    an app.yml, expands rules against the stream's tables and dispatches
    to the target pipeline (lake / messages / redis state / script)."""
    from .config import load_app, run_app

    ray = _ray_session(args.num_cpus)
    app = load_app(args.config)
    result = run_app(
        app, args.events, args.out, num_partitions=args.num_partitions
    )
    ray.shutdown()
    srv = result.pop("_admin_server", None)
    if srv is not None:  # enable_web_admin: serve alongside, like the
        print(json.dumps(result))  # reference's web.Start (router.go:23-62)
        try:
            import time as _t

            while True:
                _t.sleep(3600)
        except KeyboardInterrupt:
            srv.close()
        return None  # already printed — main() must not print twice
    return result


def _daemonize(log_file: str) -> bool:
    """Classic double-fork detach (the reference runs as a service via
    its packaging; ``-daemon`` is the CLI analogue).  Returns True in
    the parent (which should exit), False in the detached child whose
    stdio is redirected to ``log_file``."""
    if os.fork() > 0:
        return True
    os.setsid()
    if os.fork() > 0:
        os._exit(0)
    import sys as _sys

    _sys.stdout.flush()
    _sys.stderr.flush()
    fd = os.open(log_file, os.O_WRONLY | os.O_CREAT | os.O_APPEND, 0o644)
    null = os.open(os.devnull, os.O_RDONLY)
    os.dup2(null, 0)
    os.dup2(fd, 1)
    os.dup2(fd, 2)
    os.close(fd)
    os.close(null)
    return False


def cmd_live(args) -> dict:
    """Live delivery (the reference's daemon loop): app.yml rules →
    exact wire frames → a real socket, resuming from the per-table
    position files on sink failure.  target=redis speaks RESP v2;
    target=elasticsearch POSTs bulk NDJSON.  ``--loopback`` self-hosts
    the matching in-process sink (no external services in this
    sandbox); ``--addr`` points at any real one."""
    from .config import load_app, run_app_live

    app = load_app(args.config)
    server = None
    if args.loopback:
        from .functions.loopback import (
            LoopbackHttpBulkServer,
            LoopbackRespServer,
        )

        cls = (
            LoopbackHttpBulkServer
            if app.target == "elasticsearch"
            else LoopbackRespServer
        )
        server = cls().start()
        address = server.address
    elif args.addr:
        host, _, port = args.addr.rpartition(":")
        address = (host or "127.0.0.1", int(port))
    else:
        raise SystemExit("live needs --addr host:port or --loopback")

    # default position scope = this (config, events) pair — positions are
    # meaningful only against the stream they were saved from (the
    # reference keys positions by destination *name*, wildcard.go/bolt
    # bucket per config); a global default would let a stale position
    # from an unrelated run filter the whole new stream away silently
    position_dir = args.position_dir
    if position_dir is None:
        import hashlib

        scope = hashlib.sha256(
            f"{os.path.abspath(args.config)}\x00"
            f"{os.path.abspath(args.events)}".encode("utf-8")
        ).hexdigest()[:16]
        position_dir = f"/tmp/gmt_ray_live_pos/{scope}"

    ray = _ray_session(args.num_cpus)
    try:
        m = run_app_live(
            app, args.events, address,
            position_dir=position_dir, batch_size=args.batch_size,
            follow=args.follow, poll_interval=args.poll_interval,
            idle_polls=args.idle_polls,
        )
        m["position_dir"] = position_dir
        if server is not None:
            m["loopback_keys"] = len(server.snapshot())
    finally:
        ray.shutdown()
        if server is not None:
            server.stop()
    return m


def cmd_serve(args) -> dict:
    """Web admin (router.go:23-62 + the promhttp exporter): serve /,
    /metrics, /position over HTTP for an existing lake.  Blocks until
    interrupted; ``--daemon`` detaches and records {pid, port} in
    ``--state-file`` (the service-mode run the reference deploys as)."""
    from .web_admin import AdminServer

    if args.daemon:
        if _daemonize(args.log_file):
            print(json.dumps({"daemon": True, "state_file": args.state_file,
                              "log_file": args.log_file}))
            return None
    srv = AdminServer(args.out, port=args.port).start()
    info = {"listening": f"http://127.0.0.1:{srv.port}", "out": args.out,
            "pid": os.getpid()}
    if args.daemon:
        tmp = f"{args.state_file}.tmp"
        with open(tmp, "w", encoding="utf-8") as f:
            json.dump({"pid": os.getpid(), "port": srv.port,
                       "out": args.out}, f)
        os.replace(tmp, args.state_file)
    print(json.dumps(info), flush=True)
    try:
        import time as _t

        while True:
            _t.sleep(3600)
    except KeyboardInterrupt:
        srv.close()
    if args.daemon:
        os._exit(0)  # detached child: never fall back into main()
    return None  # already printed — main() must not print twice


def main(argv=None) -> None:
    ap = argparse.ArgumentParser(prog="go_mysql_transfer_ray")
    ap.add_argument("--num-cpus", type=int, default=int(os.environ.get("RAY_GRAFT_CPUS", "8")))
    sub = ap.add_subparsers(dest="cmd", required=True)

    g = sub.add_parser("generate", help="materialize a synthetic binlog stream")
    g.add_argument("--out", default="/tmp/gmt_ray_events")
    g.add_argument("--num-keys", type=int, default=10000)
    g.add_argument("--events-per-key", type=float, default=4.0)
    g.add_argument("--delete-pct", type=int, default=12)
    g.add_argument("--hot-repos", type=int, default=1)
    g.add_argument("--hot-multiplier", type=int, default=8)
    g.add_argument("--bad-arity-permille", type=int, default=5)
    g.add_argument("--seed", type=int, default=42)
    g.add_argument("--shards", type=int, default=16)
    g.set_defaults(fn=cmd_generate)

    s = sub.add_parser("stock", help="full (stock) import of a base table")
    s.add_argument("--base", required=True)
    s.add_argument("--out", required=True)
    s.add_argument("--num-partitions", type=int, default=64)
    s.set_defaults(fn=cmd_stock)

    r = sub.add_parser("replay", help="incremental replay → lake")
    r.add_argument("--events", required=True)
    r.add_argument("--out", required=True)
    r.add_argument("--num-partitions", type=int, default=64)
    r.add_argument("--no-resume", action="store_true")
    r.add_argument("--base-dir", default=None)
    r.set_defaults(fn=cmd_replay)

    cl = sub.add_parser(
        "cluster", help="replay as an elected cluster node (lease on the lake)"
    )
    cl.add_argument("--events", required=True)
    cl.add_argument("--out", required=True)
    cl.add_argument("--node", default=None)
    cl.add_argument("--ttl", type=float, default=10.0)
    cl.add_argument("--max-wait", type=float, default=300.0)
    cl.add_argument("--num-partitions", type=int, default=64)
    cl.set_defaults(fn=cmd_cluster)

    tl = sub.add_parser("tail", help="incremental sync: new batch onto the lake")
    tl.add_argument("--events", required=True)
    tl.add_argument("--out", required=True)
    tl.add_argument("--num-partitions", type=int, default=64)
    tl.set_defaults(fn=cmd_tail)

    st = sub.add_parser("status", help="print checkpoint state")
    st.add_argument("--out", required=True)
    st.set_defaults(fn=cmd_status)

    po = sub.add_parser("position", help="force the checkpoint watermark")
    po.add_argument("--out", required=True)
    po.add_argument("--force-watermark", type=int, required=True)
    po.set_defaults(fn=cmd_position)

    rn = sub.add_parser("run", help="run an app.yml-configured sync")
    rn.add_argument("--config", required=True)
    rn.add_argument("--events", required=True)
    rn.add_argument("--out", required=True)
    rn.add_argument("--num-partitions", type=int, default=16)
    rn.set_defaults(fn=cmd_run)

    lv = sub.add_parser(
        "live",
        help="live delivery: exact wire frames to a socket "
             "(redis RESP / ES bulk), pause/ping/resume from the "
             "position files",
    )
    lv.add_argument("--config", required=True)
    lv.add_argument("--events", required=True)
    lv.add_argument("--addr", default=None,
                    help="host:port of the real sink (RESP v2 server / "
                         "ES-compatible /_bulk endpoint)")
    lv.add_argument("--loopback", action="store_true",
                    help="self-host the matching in-process loopback sink")
    lv.add_argument("--position-dir", default=None,
                    help="position-file directory (default: a /tmp dir "
                         "scoped to this --config + --events pair, so a "
                         "prior run against a DIFFERENT stream can never "
                         "silently skip delivery)")
    lv.add_argument("--batch-size", type=int, default=2048)
    lv.add_argument("--follow", action="store_true",
                    help="daemon shape: after draining, poll --events "
                         "for new shards and deliver the tail (the "
                         "binlog the reference tails forever)")
    lv.add_argument("--poll-interval", type=float, default=1.0)
    lv.add_argument("--idle-polls", type=int, default=3,
                    help="stop after this many consecutive empty polls "
                         "(use a large value for a real daemon)")
    lv.set_defaults(fn=cmd_live)

    sv = sub.add_parser("serve", help="web admin: /, /metrics, /position")
    sv.add_argument("--out", required=True)
    sv.add_argument("--port", type=int, default=8060)
    sv.add_argument("--daemon", action="store_true",
                    help="detach; record {pid, port} in --state-file")
    sv.add_argument("--state-file", default="/tmp/gmt_ray_serve.json")
    sv.add_argument("--log-file", default="/tmp/gmt_ray_serve.log")
    sv.set_defaults(fn=cmd_serve)

    args = ap.parse_args(argv)
    out = args.fn(args)
    if out is not None:  # blocking commands print before they serve
        print(json.dumps(out))


if __name__ == "__main__":
    main()
