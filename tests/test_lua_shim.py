"""Lua execution-protocol shim: ret-key encoding + host decode (T3)."""

import pytest

from go_mysql_transfer_ray.functions.lua_shim import (
    HAS_LUPA,
    LuaUdf,
    RetBuilder,
    decode_ret,
)


def test_ret_encoding_matches_reference_slices():
    b = RetBuilder()
    b.SET("k1", {"a": 1})
    b.DEL("k2")
    b.RPUSH("lst", "v")
    b.LREM("lst", "v0")
    b.SADD("s", "m")
    b.SREM("s", "m0")
    b.HSET("h", "f", 9)
    b.HDEL("h", "f0")
    b.ZADD("z", 1.5, "mem")
    b.ZREM("z", "mem0")
    ops = {(o.action, o.structure, o.key): o for o in decode_ret(b.ret)}

    assert ops[("insert", "string", "k1")].val == {"a": 1}
    assert ops[("delete", "string", "k2")].val is True
    assert ops[("insert", "list", "lst")].val == "v"
    assert ops[("delete", "list", "lst")].val == "v0"
    assert ops[("insert", "set", "s")].val == "m"
    assert ops[("delete", "set", "s")].val == "m0"
    h = [o for o in ops.values() if o.structure == "hash" and o.action == "insert"][0]
    assert (h.key, h.field, h.val) == ("h", "f", 9)
    hd = [o for o in ops.values() if o.structure == "hash" and o.action == "delete"][0]
    # reference HDel: the ret key is a uuid; the real key travels in the table
    assert hd.key.startswith("u") and hd.val == {"key": "h", "field": "f0", "val": 1}
    z = [o for o in ops.values() if o.structure == "sortedset" and o.action == "insert"][0]
    assert (z.key, z.score, z.val) == ("z", 1.5, "mem")
    assert ops[("delete", "sortedset", "z")].val == "mem0"


def test_action_slice_is_first_six_chars():
    # the reference slices kk[0:6]/kk[7:8]/kk[9:] — verify byte positions
    b = RetBuilder()
    b.SET("x_y_z", 1)
    (op,) = decode_ret(b.ret)
    assert op.action == "insert" and op.structure == "string" and op.key == "x_y_z"


@pytest.mark.skipif(not HAS_LUPA, reason="lupa not installed in this container")
def test_lua_script_end_to_end():
    script = """
    local row = ___ROW___
    redisOps.SET("k:" .. row.id, row)
    """
    udf = LuaUdf(script)
    out = udf({"id": 7, "v": "x"}, None, "insert", None)
    assert out and out[0]["id"] == 7


def test_lua_udf_without_lupa_raises_cleanly():
    if HAS_LUPA:
        pytest.skip("lupa installed")
    with pytest.raises(NotImplementedError):
        LuaUdf("return 1")
