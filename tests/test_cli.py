"""CLI argument-validation parity (the full CLI happy path is smoked by
the verify recipe; unit tests here cover the reference's input guards)."""


def test_position_validates_inputs(tmp_path):
    """main.go:171-181 parity: bad watermark / non-lake target are
    rejected with a clear error instead of silently touching nothing."""
    import pytest

    from go_mysql_transfer_ray.__main__ import cmd_position

    class A:
        out = str(tmp_path / "nonexistent")
        force_watermark = -5

    with pytest.raises(SystemExit, match="force-watermark"):
        cmd_position(A())
    A.force_watermark = 0
    with pytest.raises(SystemExit, match="no partition manifests"):
        cmd_position(A())


def test_serve_daemon_mode(tmp_path):
    """--daemon detaches, records {pid, port} in the state file, serves
    HTTP from the detached process, and logs to the log file
    (service-mode parity: the reference deploys as a daemon with a
    configured log store, config.go:243-252)."""
    import json
    import os
    import signal
    import subprocess
    import sys
    import time
    import urllib.request

    out = str(tmp_path / "lake")
    os.makedirs(os.path.join(out, "_manifests"), exist_ok=True)
    state = str(tmp_path / "serve.json")
    log = str(tmp_path / "serve.log")
    r = subprocess.run(
        [sys.executable, "-m", "go_mysql_transfer_ray", "serve",
         "--out", out, "--port", "0", "--daemon",
         "--state-file", state, "--log-file", log],
        capture_output=True, text=True, timeout=60, cwd="/root/repo",
    )
    assert r.returncode == 0, r.stderr
    assert json.loads(r.stdout.strip().splitlines()[-1])["daemon"] is True
    deadline = time.time() + 30
    info = None
    while time.time() < deadline:
        if os.path.exists(state):
            info = json.loads(open(state).read())
            break
        time.sleep(0.1)
    assert info, "daemon never wrote its state file"
    try:
        with urllib.request.urlopen(
            f"http://127.0.0.1:{info['port']}/position", timeout=10
        ) as resp:
            pos = json.loads(resp.read())
        assert pos["out"] == out
        assert os.path.exists(log)  # stdio redirected to the log file
    finally:
        os.kill(info["pid"], signal.SIGTERM)


def test_app_yml_logger_store(tmp_path):
    """logger: store: in app.yml (default <data_dir>/log) wires the root
    logger to a file via config.setup_logging."""
    import logging

    from go_mysql_transfer_ray import config as cfgmod

    doc = f"""
target: redis
data_dir: {tmp_path}/data
rule:
  - table: repos
    redis_structure: string
    redis_key_prefix: "r:"
"""
    cfg = cfgmod.load_app(doc)
    assert cfg.logger_store == str(tmp_path / "data" / "log")
    path = cfgmod.setup_logging(cfg)
    try:
        logging.getLogger("gmt.test").warning("daemon-mode logging works")
        for h in logging.getLogger().handlers:
            h.flush()
        assert "daemon-mode logging works" in open(path).read()
    finally:
        root = logging.getLogger()
        for h in list(root.handlers):
            if getattr(h, "baseFilename", None) == path:
                root.removeHandler(h)
                h.close()
