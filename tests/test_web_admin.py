"""Web-admin REST surface (reference web/router.go:23-126 + the
promhttp exporter) — served stdlib-only on loopback, state read from the
lake's manifests on every request."""

import json
import urllib.request

import pyarrow as pa
import pytest

from go_mysql_transfer_ray.state import manifest as mstate
from go_mysql_transfer_ray.web_admin import AdminServer


@pytest.fixture()
def lake(tmp_path):
    out = str(tmp_path / "lake")
    t = pa.table({"repo": pa.array(["a", "b"]), "path": pa.array(["x", "y"])})
    mstate.write_partition(out, 0, t, gtid_watermark=100, plan="p")
    mstate.write_partition(out, 3, t.slice(0, 1), gtid_watermark=100, plan="p")
    return out


@pytest.fixture()
def server(lake):
    srv = AdminServer(
        lake,
        {("repos", "insert"): 7, ("repos", "update"): 2,
         ("users", "insert"): 3, ("users", "delete"): 1},
    ).start()
    yield srv
    srv.close()


def _get(srv, path):
    with urllib.request.urlopen(f"http://127.0.0.1:{srv.port}{path}") as r:
        return r.status, r.read().decode(), r.headers.get("Content-Type", "")


def test_dashboard_state(server):
    code, body, ctype = _get(server, "/")
    assert code == 200 and ctype.startswith("application/json")
    h = json.loads(body)
    # router.go:87-104 field parity
    assert h["binPos"] == 100
    assert h["tables"] == ["repos", "users"]
    assert h["insertAmounts"] == [7, 3]
    assert h["updateAmounts"] == [2, 0]
    assert h["deleteAmounts"] == [0, 1]
    assert h["insertAmount"] == 10 and h["deleteAmount"] == 1
    assert h["destState"] == 1 and h["isCluster"] is False


def test_metrics_exposition(server):
    code, body, ctype = _get(server, "/metrics")
    assert code == 200 and ctype.startswith("text/plain")
    assert "# TYPE transfer_inserted_num counter" in body
    assert 'transfer_inserted_num{table="repos"} 7' in body
    assert "transfer_leader_state 1" in body


def test_position_read_and_overwrite(server, lake):
    code, body, _ = _get(server, "/position")
    pos = json.loads(body)
    assert code == 200 and pos["partitions"] == 2
    assert pos["watermark_min"] == pos["watermark_max"] == 100

    req = urllib.request.Request(
        f"http://127.0.0.1:{server.port}/position",
        data=json.dumps({"watermark": -5}).encode(),
        method="POST",
    )
    with urllib.request.urlopen(req) as r:
        assert json.loads(r.read())["partitions"] == 2
    # the manifests on disk actually moved (main.go -position semantics)
    wms = {m["gtid_watermark"] for m in mstate.load_manifests(lake).values()}
    assert wms == {-5}
    _, body, _ = _get(server, "/position")
    assert json.loads(body)["watermark_max"] == -5


def test_unknown_path_404(server):
    try:
        _get(server, "/nosuch")
        assert False, "expected HTTP 404"
    except urllib.error.HTTPError as e:
        assert e.code == 404


def test_position_post_validation(server):
    req = urllib.request.Request(
        f"http://127.0.0.1:{server.port}/position",
        data=b"not json",
        method="POST",
    )
    try:
        urllib.request.urlopen(req)
        assert False, "expected HTTP 400"
    except urllib.error.HTTPError as e:
        assert e.code == 400
