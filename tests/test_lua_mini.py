"""Mini-Lua interpreter semantics (functions/lua_mini.py) — checked
against the Lua 5.1 manual behaviors rule scripts rely on."""

import pytest

from go_mysql_transfer_ray.functions.lua_mini import (
    Interpreter,
    LuaError,
    LuaTable,
    lua_tostring,
    to_python,
)


def run(src, **globals_):
    it = Interpreter(src, globals_=globals_)
    it.run()
    return it


def test_arithmetic_and_number_formatting():
    it = run(
        """
        a = 1 + 2 * 3
        b = 2 ^ 10
        c = 7 / 2
        d = -17 % 5
        e = 10 .. ""
        f = tostring(2.5)
        g = "3" + 4
        """
    )
    assert it.global_get("a") == 7.0
    assert it.global_get("b") == 1024.0
    assert it.global_get("c") == 3.5
    assert it.global_get("d") == 3.0  # Lua floored modulo
    assert it.global_get("e") == "10"
    assert it.global_get("f") == "2.5"
    assert it.global_get("g") == 7.0  # string arithmetic coercion


def test_control_flow():
    it = run(
        """
        s = 0
        for i = 1, 10 do s = s + i end
        r = 0
        for i = 10, 1, -2 do r = r + 1 end
        w = 0
        while w < 5 do w = w + 1 end
        u = 0
        repeat u = u + 3 until u > 7
        brk = 0
        for i = 1, 100 do brk = i if i == 4 then break end end
        cond = nil
        if s > 100 then cond = "big" elseif s == 55 then cond = "55" else cond = "no" end
        """
    )
    assert it.global_get("s") == 55.0
    assert it.global_get("r") == 5.0
    assert it.global_get("w") == 5.0
    assert it.global_get("u") == 9.0
    assert it.global_get("brk") == 4.0
    assert it.global_get("cond") == "55"


def test_tables_and_iteration():
    it = run(
        """
        t = {10, 20, 30, x = "a", ["y z"] = "b"}
        n = #t
        ipairs_sum = 0
        for i, v in ipairs(t) do ipairs_sum = ipairs_sum + v end
        keys = ""
        for k, v in pairs(t) do keys = keys .. tostring(k) .. ";" end
        t[4] = 40
        n2 = #t
        table.insert(t, 2, 15)
        second = t[2]
        removed = table.remove(t, 1)
        """
    )
    assert it.global_get("n") == 3.0
    assert it.global_get("ipairs_sum") == 60.0
    # deterministic order: array part first, then hash insertion order
    assert it.global_get("keys") == "1;2;3;x;y z;"
    assert it.global_get("n2") == 4.0
    assert it.global_get("second") == 15.0
    assert it.global_get("removed") == 10.0


def test_functions_closures_multiret():
    it = run(
        """
        local function two() return 1, 2 end
        a, b = two()
        local acc = 0
        local function counter()
          acc = acc + 1
          return acc
        end
        counter() counter()
        c = counter()
        local t = {}
        function t.m(x) return x * 2 end
        function t:meth(x) return self.base + x end
        t.base = 100
        d = t.m(21)
        e = t:meth(5)
        """
    )
    assert (it.global_get("a"), it.global_get("b")) == (1.0, 2.0)
    assert it.global_get("c") == 3.0
    assert it.global_get("d") == 42.0
    assert it.global_get("e") == 105.0


def test_string_library():
    it = run(
        """
        a = string.len("héllo")
        b = string.sub("hello world", 7)
        c = string.upper("abc") .. string.lower("DEF")
        d = string.format("%s=%d (%.2f) %x", "k", 42, 1.5, 255)
        e = ("xy"):rep(2)
        f = string.gsub("a1b22", "%d+", "#")
        """
    )
    assert it.global_get("a") == 5.0
    assert it.global_get("b") == "world"
    assert it.global_get("c") == "ABCdef"
    assert it.global_get("d") == "k=42 (1.50) ff"
    assert it.global_get("e") == "xyxy"
    assert it.global_get("f") == "a#b#"


def test_truthiness_and_equality():
    it = run(
        """
        a = nil and 1 or 2
        b = false or "x"
        c = (0 and "zero-is-truthy") or "no"
        d = (1 == 1.0)
        e = ("a" ~= "b")
        f = not nil
        """
    )
    assert it.global_get("a") == 2.0
    assert it.global_get("b") == "x"
    assert it.global_get("c") == "zero-is-truthy"  # 0 is truthy in Lua
    assert it.global_get("d") is True
    assert it.global_get("e") is True
    assert it.global_get("f") is True


def test_long_strings_and_comments():
    it = run(
        """
        -- line comment
        --[[ block
             comment ]]
        s = [[line1
line2]]
        """
    )
    assert it.global_get("s") == "line1\nline2"


def test_host_interop_and_errors():
    t = LuaTable.from_dict({"k": 1, "nested": {"a": [1, 2]}})
    assert to_python(t) == {"k": 1, "nested": {"a": [1.0, 2.0]}} or to_python(t) == {
        "k": 1,
        "nested": {"a": [1, 2]},
    }
    assert lua_tostring(3.0) == "3"
    assert lua_tostring(None) == "nil"
    with pytest.raises(LuaError):
        run("x = nil .. 'a'")
    with pytest.raises(LuaError):
        run("undefined_fn()")
    with pytest.raises(LuaError):
        run("error('boom')")


def test_compile_once_rerun_isolated_locals():
    it = Interpreter("local n = (n0 or 0) + 1\nn0 = n")
    it.run()
    it.run()
    it.run()
    # globals persist across runs (reference pools LStates without reset)
    assert it.global_get("n0") == 3.0


def test_varargs_select_unpack():
    it = run(
        """
        local function sum(...)
          local t, n = 0, select("#", ...)
          for i = 1, n do t = t + (select(i, ...)) end
          return t, n
        end
        local function tail(...) return select(2, ...) end
        s, n = sum(1, 2, 3, 4)
        t2, t3 = tail(10, 20, 30)
        packed = {sum(5, 6)}          -- expands to both returns
        last = {1, sum(5, 6)}         -- last position expands
        mid = {sum(5, 6), 1}          -- non-last truncates to one
        local function fwd(...) return {...} end
        fl = fwd("a", "b", "c")
        """
    )
    assert it.global_get("s") == 10.0 and it.global_get("n") == 4.0
    assert it.global_get("t2") == 20.0 and it.global_get("t3") == 30.0
    assert it.global_get("packed").length() == 2
    assert it.global_get("last").length() == 3
    assert it.global_get("mid").length() == 2
    assert to_python(it.global_get("fl")) == ["a", "b", "c"]


def test_paren_truncates_to_one_value():
    # Lua 5.1 §2.5: (f(x)) and (...) adjust to exactly one value
    it = run(
        """
        local function two() return 1, 2 end
        a = {two()}
        b = {(two())}
        local function count(...) return select("#", ...) end
        c = count((two()))
        """
    )
    assert it.global_get("a").length() == 2
    assert it.global_get("b").length() == 1
    assert it.global_get("c") == 1.0


def test_string_gmatch_match_byte_char():
    it = run(
        """
        words = {}
        for w in string.gmatch("one two  three", "%a+") do
          table.insert(words, w)
        end
        kvs = {}
        for k, v in string.gmatch("a=1, b=2", "(%w+)=(%w+)") do
          kvs[k] = v
        end
        m = string.match("file_42.py", "%.(%w+)$")
        none = string.match("x", "%d")
        b1, b2 = string.byte("AZ", 1, 2)
        neg = string.byte("abc", -1)
        c = string.char(76, 117, 97)
        f1, f2, cap = string.find("k=9", "(%d)")
        """
    )
    assert to_python(it.global_get("words")) == ["one", "two", "three"]
    assert to_python(it.global_get("kvs")) == {"a": "1", "b": "2"}
    assert it.global_get("m") == "py"
    assert it.global_get("none") is None
    assert it.global_get("b1") == 65.0 and it.global_get("b2") == 90.0
    assert it.global_get("neg") == float(ord("c"))
    assert it.global_get("c") == "Lua"
    assert (it.global_get("f1"), it.global_get("f2"), it.global_get("cap")) == (
        3.0, 3.0, "9",
    )


def test_metatable_index_class_idiom():
    # the canonical Lua 5.1 OOP pattern: Class.__index = Class
    it = run(
        """
        local Account = {}
        Account.__index = Account

        function Account.new(balance)
          local a = setmetatable({}, Account)
          a.balance = balance
          return a
        end

        function Account:deposit(v)
          self.balance = self.balance + v
        end

        function Account:get()
          return self.balance
        end

        -- single inheritance: Savings falls back to Account
        local Savings = setmetatable({}, {__index = Account})
        Savings.__index = Savings
        function Savings.new(balance)
          local s = Account.new(balance)
          return setmetatable(s, Savings)
        end
        function Savings:bonus() self.balance = self.balance + 1 end

        local acc = Account.new(100)
        acc:deposit(50)
        a = acc:get()

        local sv = Savings.new(10)
        sv:bonus()
        sv:deposit(5)          -- found via the __index chain
        b = sv:get()
        mt_ok = getmetatable(acc) == Account
        """
    )
    assert it.global_get("a") == 150.0
    assert it.global_get("b") == 16.0
    assert it.global_get("mt_ok") is True


def test_metatable_index_function_and_newindex():
    it = run(
        """
        local log = {}
        local t = setmetatable({}, {
          __index = function(tbl, key) return "default_" .. key end,
          __newindex = function(tbl, key, value)
            rawset(tbl, key, value)
            table.insert(log, key)
          end,
        })
        t.x = 1           -- routed through __newindex (key absent)
        t.x = 2           -- raw now (key present after rawset)
        missing = t.y     -- __index function
        present = rawget(t, "x")
        raw_missing = rawget(t, "y")
        n_logged = #log
        logged = log[1]
        """
    )
    assert it.global_get("missing") == "default_y"
    assert it.global_get("present") == 2.0
    assert it.global_get("raw_missing") is None
    assert it.global_get("n_logged") == 1.0
    assert it.global_get("logged") == "x"


def test_newindex_cycle_is_contained():
    # a __newindex handler cycle must raise a LuaError ('loop in
    # settable' in C Lua), not escape as a Python RecursionError
    with pytest.raises(LuaError, match="__newindex"):
        run(
            """
            local a, b = {}, {}
            setmetatable(a, {__newindex = b})
            setmetatable(b, {__newindex = a})
            a.x = 1
            """
        )


def test_operator_metamethods_arith_unm_concat():
    # the vector/class idiom from PiL 13.1-13.3: every binary operator
    # routes through the metatable when an operand is a table
    it = run(
        """
        local mt = {}
        mt.__add = function(a, b) return setmetatable({x = a.x + b.x}, mt) end
        mt.__sub = function(a, b) return setmetatable({x = a.x - b.x}, mt) end
        mt.__mul = function(a, b) return setmetatable({x = a.x * b.x}, mt) end
        mt.__div = function(a, b) return setmetatable({x = a.x / b.x}, mt) end
        mt.__mod = function(a, b) return setmetatable({x = a.x % b.x}, mt) end
        mt.__pow = function(a, b) return setmetatable({x = a.x ^ b.x}, mt) end
        mt.__unm = function(a) return setmetatable({x = -a.x}, mt) end
        mt.__concat = function(a, b)
            local ax = type(a) == "table" and a.x or a
            local bx = type(b) == "table" and b.x or b
            return ax .. "|" .. bx
        end
        mt.__len = function(a) return 42 end
        local v1 = setmetatable({x = 10}, mt)
        local v2 = setmetatable({x = 4}, mt)
        add = (v1 + v2).x
        sub = (v1 - v2).x
        mul = (v1 * v2).x
        div = (v1 / v2).x
        mod = (v1 % v2).x
        pow = (v1 ^ v2).x
        neg = (-v1).x
        cat1 = v1 .. "s"
        cat2 = "s" .. v1
        len = #v1
        """
    )
    assert it.global_get("add") == 14.0
    assert it.global_get("sub") == 6.0
    assert it.global_get("mul") == 40.0
    assert it.global_get("div") == 2.5
    assert it.global_get("mod") == 2.0
    assert it.global_get("pow") == 10000.0
    assert it.global_get("neg") == -10.0
    assert it.global_get("cat1") == "10|s"
    assert it.global_get("cat2") == "s|10"
    assert it.global_get("len") == 42.0


def test_operator_metamethods_eq_lt_le_call_tostring():
    it = run(
        """
        local mt = {}
        mt.__eq = function(a, b) return a.x == b.x end
        mt.__lt = function(a, b) return a.x < b.x end
        -- no __le: 'a <= b' must fall back to 'not (b < a)' via __lt
        mt.__call = function(self, k) return self.x + k end
        mt.__tostring = function(self) return "V(" .. self.x .. ")" end
        local a = setmetatable({x = 1}, mt)
        local b = setmetatable({x = 1}, mt)
        local c = setmetatable({x = 2}, mt)
        eq = a == b
        ne = a == c
        lt = a < c
        gt = c > a
        le = a <= b
        ge = c >= a
        called = a(41)
        s = tostring(c)
        -- __eq only fires when BOTH operands share the handler (5.1)
        plain = a == {x = 1}
        """
    )
    assert it.global_get("eq") is True
    assert it.global_get("ne") is False
    assert it.global_get("lt") is True
    assert it.global_get("gt") is True
    assert it.global_get("le") is True
    assert it.global_get("ge") is True
    assert it.global_get("called") == 42.0
    assert it.global_get("s") == "V(2)"
    assert it.global_get("plain") is False


def test_pcall_xpcall_preserve_error_values():
    it = run(
        """
        ok1, v1 = pcall(function() return 7, 8 end)
        ok2, v2 = pcall(function() error({code = 404}) end)
        ok3, v3 = pcall(function() error("boom") end)
        ok4, v4 = xpcall(
            function() error("x") end,
            function(e) return "handled:" .. e end
        )
        req = rawequal({}, {})
        """
    )
    assert it.global_get("ok1") is True and it.global_get("v1") == 7.0
    assert it.global_get("ok2") is False
    assert to_python(it.global_get("v2")) == {"code": 404.0}
    assert it.global_get("ok3") is False and it.global_get("v3") == "boom"
    assert it.global_get("ok4") is False
    assert it.global_get("v4") == "handled:x"
    assert it.global_get("req") is False


def test_coroutines_basic_producer_consumer():
    it = run(
        """
        local co = coroutine.create(function(a, b)
            local c = coroutine.yield(a + b)
            local d, e = coroutine.yield(c * 2)
            return d + e
        end)
        s0 = coroutine.status(co)
        ok1, r1 = coroutine.resume(co, 3, 4)
        s1 = coroutine.status(co)
        ok2, r2 = coroutine.resume(co, 10)
        ok3, r3 = coroutine.resume(co, 5, 6)
        s3 = coroutine.status(co)
        ok4, r4 = coroutine.resume(co)
        """
    )
    assert it.global_get("s0") == "suspended"
    assert it.global_get("ok1") is True and it.global_get("r1") == 7.0
    assert it.global_get("s1") == "suspended"
    assert it.global_get("ok2") is True and it.global_get("r2") == 20.0
    assert it.global_get("ok3") is True and it.global_get("r3") == 11.0
    assert it.global_get("s3") == "dead"
    assert it.global_get("ok4") is False
    assert "dead" in it.global_get("r4")


def test_coroutine_wrap_iterator_idiom():
    # PiL 9.3: generator via wrap; also errors propagate out of wrap
    it = run(
        """
        local gen = coroutine.wrap(function(n)
            for i = 1, n do coroutine.yield(i * i) end
            return -1
        end)
        acc = {}
        table.insert(acc, gen(3))
        table.insert(acc, gen())
        table.insert(acc, gen())
        table.insert(acc, gen())
        ok = pcall(function()
            local bad = coroutine.wrap(function() error("inner") end)
            bad()
        end)
        yields_outside = pcall(function() coroutine.yield(1) end)
        """
    )
    assert to_python(it.global_get("acc")) == [1.0, 4.0, 9.0, -1.0]
    assert it.global_get("ok") is False
    assert it.global_get("yields_outside") is False


def test_table_sort_string_reverse_math():
    it = run(
        """
        t = {5, 2, 9, 1}
        table.sort(t)
        u = {"pear", "apple", "fig"}
        table.sort(u, function(a, b) return a > b end)
        rev = string.reverse("abc")
        sq = math.sqrt(81)
        fm = math.fmod(-7, 3)
        ip, fp = math.modf(3.25)
        pi2 = math.pi * 2
        math.randomseed(42)
        r1 = math.random()
        r2 = math.random(6)
        r3 = math.random(10, 12)
        math.randomseed(42)
        r1b = math.random()
        """
    )
    assert to_python(it.global_get("t")) == [1.0, 2.0, 5.0, 9.0]
    assert to_python(it.global_get("u")) == ["pear", "fig", "apple"]
    assert it.global_get("rev") == "cba"
    assert it.global_get("sq") == 9.0
    assert it.global_get("fm") == -1.0  # C fmod keeps the dividend's sign
    assert it.global_get("ip") == 3.0 and abs(it.global_get("fp") - 0.25) < 1e-12
    assert abs(it.global_get("pi2") - 6.283185307179586) < 1e-12
    assert 0.0 <= it.global_get("r1") < 1.0
    assert 1.0 <= it.global_get("r2") <= 6.0
    assert 10.0 <= it.global_get("r3") <= 12.0
    # deterministic: same seed, same stream
    assert it.global_get("r1b") == it.global_get("r1")


def test_table_sort_with_metamethod_lt():
    it = run(
        """
        local mt = {__lt = function(a, b) return a.x < b.x end}
        local function V(x) return setmetatable({x = x}, mt) end
        t = {V(3), V(1), V(2)}
        table.sort(t)
        order = t[1].x .. t[2].x .. t[3].x
        """
    )
    assert it.global_get("order") == "123"


def test_pcall_catches_host_exceptions():
    # a stdlib misuse inside pcall must surface as (false, msg), never
    # crash the interpreter run (parity with the coroutine body path)
    i = Interpreter(
        "ok, err = pcall(string.rep, 'x')\n"
        "ok2, msg = xpcall(function() return string.rep('x') end,\n"
        "                  function(e) return 'H:' .. e end)"
    ).run()
    assert i.global_get("ok") is False
    assert isinstance(i.global_get("err"), str)
    assert i.global_get("ok2") is False
    assert i.global_get("msg").startswith("H:")


def test_math_modf_inf_nan():
    i = Interpreter(
        "a, b = math.modf(math.huge)\n"
        "c, d = math.modf(0/0)\n"
        "e, f = math.modf(-3.75)"
    ).run()
    assert i.global_get("a") == float("inf") and i.global_get("b") == 0.0
    assert i.global_get("c") != i.global_get("c")  # nan
    assert i.global_get("e") == -3.0 and i.global_get("f") == -0.75


def test_abandoned_coroutines_do_not_leak_threads():
    import threading

    src = (
        "local gen = coroutine.wrap(function()\n"
        "  for i = 1, 100 do coroutine.yield(i) end\n"
        "end)\n"
        "first = gen()"
    )
    interp = Interpreter(src)
    base = threading.active_count()
    for _ in range(25):
        interp.run()
    # suspended coroutines are reaped at the end of each run
    assert threading.active_count() - base <= 1
    assert interp.global_get("first") == 1.0


def test_reaped_coroutine_resumes_as_dead_across_runs():
    src = (
        "if g == nil then\n"
        "  g = coroutine.create(function() coroutine.yield(1); return 2 end)\n"
        "  ok1 = coroutine.resume(g)\n"
        "else\n"
        "  ok2, err2 = coroutine.resume(g)\n"
        "end"
    )
    i = Interpreter(src)
    i.run()
    i.run()
    assert i.global_get("ok2") is False
    assert i.global_get("err2") == "cannot resume dead coroutine"


def test_vararg_outside_vararg_function_is_compile_error():
    # Lua 5.1: "cannot use '...' outside a vararg function" — without
    # the check, env-chain lookup would resolve to the ENCLOSING
    # function's varargs and silently produce wrong data
    with pytest.raises(LuaError, match="outside a vararg function"):
        Interpreter(
            "local function outer(...)\n"
            "  local function inner() return ... end\n"
            "  return inner()\n"
            "end\n"
            "r = outer(1, 2)"
        )
    # top-level '...' is legal (the main chunk is a vararg function)
    Interpreter("local t = {...}").run()
    # and '...' inside a vararg function still works
    i = Interpreter(
        "local function f(...) return select('#', ...) end\nn = f(7, 8, 9)"
    ).run()
    assert i.global_get("n") == 3.0


def test_os_module_deterministic_and_math_log_table_getn():
    i = Interpreter(
        "t1 = os.time()\n"
        "t2 = os.time()\n"
        "d = os.date('%Y-%m-%d %H:%M:%S', 0)\n"
        "dt = os.date('*t', 86400)\n"
        "y, mo, dd = dt.year, dt.month, dt.day\n"
        "epoch = os.time({year=1970, month=1, day=2, hour=0})\n"
        "c1 = os.clock(); c2 = os.clock()\n"
        "lg = math.log(math.exp(1))\n"
        "n = table.getn({10, 20, 30})"
    ).run()
    # deterministic: identical across calls and across runs
    assert i.global_get("t1") == i.global_get("t2") == 1_600_000_000.0
    assert i.global_get("d") == "1970-01-01 00:00:00"
    assert (i.global_get("y"), i.global_get("mo"), i.global_get("dd")) == (1970.0, 1.0, 2.0)
    assert i.global_get("epoch") == 86400.0
    assert i.global_get("c2") > i.global_get("c1")
    assert abs(i.global_get("lg") - 1.0) < 1e-12
    assert i.global_get("n") == 3.0

    i.set_os_epoch(86400 * 2)
    i2 = Interpreter("d = os.date('!%Y-%m-%d', os.time())")
    i2.set_os_epoch(86400 * 2)
    i2.run()
    assert i2.global_get("d") == "1970-01-03"


def test_math_random_empty_interval_raises_like_lua51():
    """Lua 5.1 lmathlib.c validates the range before drawing —
    random(0) and random(5, 2) raise 'interval is empty', observable
    through pcall (gopher-lua matches)."""
    it = run(
        """
        ok1, e1 = pcall(function() return math.random(0) end)
        ok2, e2 = pcall(function() return math.random(5, 2) end)
        ok3, v3 = pcall(function() return math.random(3, 3) end)
        v4 = math.random(1)
        """
    )
    assert it.global_get("ok1") is False
    assert "interval is empty" in lua_tostring(it.global_get("e1"))
    assert it.global_get("ok2") is False
    assert "interval is empty" in lua_tostring(it.global_get("e2"))
    assert it.global_get("ok3") is True and it.global_get("v3") == 3.0
    assert it.global_get("v4") == 1.0
