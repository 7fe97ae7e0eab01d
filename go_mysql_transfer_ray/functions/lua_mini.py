"""A small pure-Python Lua 5.1 interpreter for rule scripts.

The reference's primary user-extension surface is a per-rule Lua script
executed by gopher-lua (/root/reference/global/rule.go:621-694,
/root/reference/service/luaengine/actuator.go:46-113).  The ``lupa``
binding is a C extension that is not installed in (and cannot be added
to) this environment, so this module implements the Lua subset those
rule scripts actually use, from the public Lua 5.1 reference manual:

* statements: ``local``, multi-assignment, ``if/elseif/else``,
  ``while``, ``repeat/until``, numeric and generic ``for``, ``do``
  blocks, ``function`` definitions (incl. ``local function`` and method
  sugar), calls, ``return``, ``break``;
* expressions: full operator set (``or and < > <= >= ~= == .. + - * /
  % ^ not # unary-``) with Lua precedence, table constructors (array
  part, ``k = v``, ``[expr] = v``), anonymous functions, method calls
  ``obj:m(...)``, string/number literals (incl. hex, exponents, long
  strings), varargs (``...`` with last-position expansion, ``select``,
  ``unpack``), metatables (``__index`` table-or-function chains,
  ``__newindex``, ``setmetatable`` / ``getmetatable`` / ``rawget`` /
  ``rawset`` / ``rawequal``) and the operator metamethods (``__add
  __sub __mul __div __mod __pow __unm __concat __len __eq __lt __le
  __call __tostring``, Lua 5.1 §2.8 handler-selection rules);
  coroutines (``create resume yield status wrap running``, §2.11,
  thread-backed strict hand-off); protected calls (``pcall`` /
  ``xpcall`` preserving non-string error values);
* semantics: ``nil``/``false`` falsy; numbers are float64 (printed via
  %.14g like gopher-lua's LNumber.String); ``..`` coerces numbers;
  arithmetic coerces numeric strings; ``#`` on strings and tables;
  1-based tables with separate hash part, deterministic iteration
  (array part in order, then hash keys in insertion order);
* stdlib: ``print type tostring tonumber pairs ipairs error assert
  require select unpack pcall xpcall rawequal`` plus ``string`` (len
  sub upper lower rep reverse format find match gmatch gsub byte
  char), ``table`` (insert remove concat sort), ``math`` (floor ceil
  abs max min sqrt pow fmod modf huge pi, and random/randomseed over a
  DETERMINISTIC fixed-seed xorshift64* — gopher-lua seeds from the OS,
  but a replayable pipeline needs script reproducibility), ``os``
  (time/date/clock/difftime over a pinned replay clock — deterministic
  for the same reason), and ``coroutine``.  ``io`` is deliberately
  absent: filesystem access would make a deterministic replay
  irreproducible (the reference's documented rule scripts never use
  it).

Host modules (redisOps, mongodbOps, esOps, mqOps, json, ...) are
injected through ``require`` and as pre-set globals, mirroring
``luaStatePool.New`` preloading (actuator.go:71-87).
"""

from __future__ import annotations

import re


class LuaError(Exception):
    """Raised Lua error.  ``lua_value`` preserves the original error
    value (Lua errors can be tables, Lua 5.1 §2.8) so ``pcall`` can
    return it unchanged; the exception message is its string form."""

    def __init__(self, msg, lua_value=None):
        super().__init__(msg)
        self.lua_value = lua_value if lua_value is not None else msg


# ---------------------------------------------------------------------------
# values


class LuaTable:
    """Lua table: 1-based array part + insertion-ordered hash part.
    ``metatable`` backs the __index/__newindex semantics (the class /
    inheritance idiom); raw access (.get/.set) ignores it, interpreter
    index paths honor it."""

    __slots__ = ("hash", "metatable")

    def __init__(self):
        self.hash: dict = {}
        self.metatable: "LuaTable | None" = None

    # -- host helpers -----------------------------------------------------
    @classmethod
    def from_dict(cls, d: dict) -> "LuaTable":
        t = cls()
        for k, v in d.items():
            t.set(k, _to_lua(v))
        return t

    @classmethod
    def from_list(cls, items) -> "LuaTable":
        t = cls()
        for i, v in enumerate(items, 1):
            t.set(float(i), _to_lua(v))
        return t

    @staticmethod
    def _norm(key):
        # Lua: t[1] and t[1.0] are the same slot; strings stay strings
        if isinstance(key, bool):
            return key
        if isinstance(key, (int, float)):
            f = float(key)
            return f
        return key

    def get(self, key):
        return self.hash.get(self._norm(key))

    def set(self, key, value):
        k = self._norm(key)
        if value is None:
            self.hash.pop(k, None)
        else:
            self.hash[k] = value

    def length(self) -> int:
        n = 0
        while float(n + 1) in self.hash:
            n += 1
        return n

    def lua_items(self):
        """Deterministic pairs(): array part 1..n first, then remaining
        keys in insertion order."""
        n = self.length()
        seen = set()
        for i in range(1, n + 1):
            seen.add(float(i))
            yield float(i), self.hash[float(i)]
        for k, v in self.hash.items():
            if k not in seen:
                yield k, v

    def maxn(self) -> int:
        return self.length()

    def __repr__(self):  # pragma: no cover - debug only
        return f"LuaTable({self.hash!r})"


def _to_lua(v):
    if isinstance(v, dict):
        return LuaTable.from_dict(v)
    if isinstance(v, (list, tuple)):
        return LuaTable.from_list(v)
    return v


def to_python(v):
    """Lua value → plain Python (tables → dict, or list when the table is
    a pure array — matching lvToInterface, actuator.go:196-231).

    Integral floats collapse to int: all Lua arithmetic yields float64,
    and Go renders float64 2.0 as ``2`` in JSON (json.Marshal shortest
    form) — keeping them as Python floats would serialize ``2.0`` and
    diverge from the reference's bodies."""
    if isinstance(v, LuaTable):
        n = v.length()
        if n and len(v.hash) == n:
            return [to_python(v.hash[float(i)]) for i in range(1, n + 1)]
        out = {}
        for k, val in v.lua_items():
            out[lua_tostring(k)] = to_python(val)
        return out
    if isinstance(v, float) and not isinstance(v, bool) and v.is_integer() and abs(v) < 2**53:
        return int(v)
    return v


def lua_tostring(v) -> str:
    if v is None:
        return "nil"
    if v is True:
        return "true"
    if v is False:
        return "false"
    if isinstance(v, float):
        if v != v:
            return "nan"
        if v == float("inf"):
            return "inf"
        if v == float("-inf"):
            return "-inf"
        s = "%.14g" % v
        return s
    if isinstance(v, int):  # host-injected ints
        return str(v)
    if isinstance(v, str):
        return v
    if isinstance(v, LuaTable):
        return f"table: 0x{id(v):012x}"
    if isinstance(v, LuaCoroutine):
        return f"thread: 0x{id(v):012x}"
    if callable(v):
        return f"function: 0x{id(v):012x}"
    return str(v)


def lua_tonumber(v):
    if isinstance(v, bool):
        return None
    if isinstance(v, (int, float)):
        return float(v)
    if isinstance(v, str):
        s = v.strip()
        try:
            if s.lower().startswith(("0x", "-0x")):
                return float(int(s, 16))
            return float(s)
        except ValueError:
            return None
    return None


def _truthy(v) -> bool:
    return v is not None and v is not False


# ---------------------------------------------------------------------------
# lexer

_KEYWORDS = {
    "and", "break", "do", "else", "elseif", "end", "false", "for",
    "function", "if", "in", "local", "nil", "not", "or", "repeat",
    "return", "then", "true", "until", "while",
}

_TOKEN_RE = re.compile(
    r"""
    (?P<ws>\s+)
  | (?P<longcomment>--\[(?P<lceq>=*)\[.*?\](?P=lceq)\])
  | (?P<comment>--[^\n]*)
  | (?P<longstr>\[(?P<lseq>=*)\[(?P<lsbody>.*?)\](?P=lseq)\])
  | (?P<number>0[xX][0-9a-fA-F]+|\d+\.?\d*(?:[eE][+-]?\d+)?|\.\d+(?:[eE][+-]?\d+)?)
  | (?P<name>[A-Za-z_]\w*)
  | (?P<string>'(?:\\.|[^'\\])*'|"(?:\\.|[^"\\])*")
  | (?P<op>\.\.\.|\.\.|==|~=|<=|>=|[-+*/%^\#<>=(){}\[\];:,.])
    """,
    re.VERBOSE | re.DOTALL,
)

_ESCAPES = {
    "n": "\n", "t": "\t", "r": "\r", "a": "\a", "b": "\b", "f": "\f",
    "v": "\v", "\\": "\\", '"': '"', "'": "'", "\n": "\n",
}


def _unescape(body: str) -> str:
    out = []
    i = 0
    while i < len(body):
        c = body[i]
        if c == "\\" and i + 1 < len(body):
            nxt = body[i + 1]
            if nxt.isdigit():
                j = i + 1
                while j < len(body) and j < i + 4 and body[j].isdigit():
                    j += 1
                out.append(chr(int(body[i + 1: j])))
                i = j
                continue
            out.append(_ESCAPES.get(nxt, nxt))
            i += 2
            continue
        out.append(c)
        i += 1
    return "".join(out)


def tokenize(src: str):
    tokens = []
    pos = 0
    line = 1
    while pos < len(src):
        m = _TOKEN_RE.match(src, pos)
        if m is None:
            raise LuaError(f"lex error at line {line}: {src[pos:pos+20]!r}")
        line += src[pos: m.end()].count("\n")
        pos = m.end()
        kind = m.lastgroup
        if kind in ("ws", "comment", "longcomment"):
            # find which named group matched
            pass
        if m.group("ws") or m.group("comment") or m.group("longcomment"):
            continue
        if m.group("number"):
            txt = m.group("number")
            val = float(int(txt, 16)) if txt.lower().startswith("0x") else float(txt)
            tokens.append(("number", val, line))
        elif m.group("name"):
            txt = m.group("name")
            tokens.append((txt if txt in _KEYWORDS else "name", txt, line))
        elif m.group("string"):
            tokens.append(("string", _unescape(m.group("string")[1:-1]), line))
        elif m.group("longstr"):
            body = m.group("lsbody")
            if body.startswith("\n"):
                body = body[1:]
            tokens.append(("string", body, line))
        else:
            tokens.append((m.group("op"), m.group("op"), line))
    tokens.append(("eof", None, line))
    return tokens


# ---------------------------------------------------------------------------
# parser → AST (tuples: (kind, ...))


class _Parser:
    def __init__(self, tokens):
        self.toks = tokens
        self.i = 0
        # the main chunk is itself a vararg function (Lua 5.1 §2.5.9)
        self._vararg_stack = [True]

    def peek(self):
        return self.toks[self.i][0]

    def next(self):
        t = self.toks[self.i]
        self.i += 1
        return t

    def expect(self, kind):
        t = self.next()
        if t[0] != kind:
            raise LuaError(f"line {t[2]}: expected {kind!r}, got {t[0]!r}")
        return t

    def accept(self, kind):
        if self.peek() == kind:
            return self.next()
        return None

    # -- blocks -----------------------------------------------------------
    def parse_chunk(self):
        body = self.block(("eof",))
        self.expect("eof")
        return ("block", body)

    def block(self, stoppers):
        stmts = []
        while self.peek() not in stoppers:
            if self.peek() == "return":
                self.next()
                exprs = []
                if self.peek() not in stoppers and self.peek() != ";":
                    exprs = self.exprlist()
                self.accept(";")
                stmts.append(("return", exprs))
                break
            s = self.statement()
            if s is not None:
                stmts.append(s)
        return stmts

    def statement(self):
        k = self.peek()
        if k == ";":
            self.next()
            return None
        if k == "break":
            self.next()
            return ("break",)
        if k == "do":
            self.next()
            body = self.block(("end",))
            self.expect("end")
            return ("do", body)
        if k == "while":
            self.next()
            cond = self.expr()
            self.expect("do")
            body = self.block(("end",))
            self.expect("end")
            return ("while", cond, body)
        if k == "repeat":
            self.next()
            body = self.block(("until",))
            self.expect("until")
            cond = self.expr()
            return ("repeat", body, cond)
        if k == "if":
            return self.if_stmt()
        if k == "for":
            return self.for_stmt()
        if k == "function":
            self.next()
            # function Name{.name}[:name] (params) body end
            name_tok = self.expect("name")
            target = ("name", name_tok[1])
            is_method = False
            while self.peek() in (".", ":"):
                sep = self.next()[0]
                field = self.expect("name")[1]
                target = ("index", target, ("const", field))
                if sep == ":":
                    is_method = True
                    break
            fn = self.funcbody(is_method)
            return ("assign", [target], [fn])
        if k == "local":
            self.next()
            if self.accept("function"):
                name = self.expect("name")[1]
                fn = self.funcbody(False)
                return ("localfunc", name, fn)
            names = [self.expect("name")[1]]
            while self.accept(","):
                names.append(self.expect("name")[1])
            exprs = []
            if self.accept("="):
                exprs = self.exprlist()
            return ("local", names, exprs)
        # expression statement: call or assignment
        e = self.suffixedexp()
        if self.peek() in ("=", ","):
            targets = [e]
            while self.accept(","):
                targets.append(self.suffixedexp())
            self.expect("=")
            exprs = self.exprlist()
            for t in targets:
                if t[0] not in ("name", "index"):
                    raise LuaError("cannot assign to this expression")
            return ("assign", targets, exprs)
        if e[0] not in ("call", "method"):
            raise LuaError(f"syntax error: unexpected expression statement {e[0]}")
        return ("exprstat", e)

    def if_stmt(self):
        self.expect("if")
        cond = self.expr()
        self.expect("then")
        body = self.block(("elseif", "else", "end"))
        clauses = [(cond, body)]
        while self.peek() == "elseif":
            self.next()
            c = self.expr()
            self.expect("then")
            b = self.block(("elseif", "else", "end"))
            clauses.append((c, b))
        els = []
        if self.accept("else"):
            els = self.block(("end",))
        self.expect("end")
        return ("if", clauses, els)

    def for_stmt(self):
        self.expect("for")
        name = self.expect("name")[1]
        if self.accept("="):
            start = self.expr()
            self.expect(",")
            stop = self.expr()
            step = ("const", 1.0)
            if self.accept(","):
                step = self.expr()
            self.expect("do")
            body = self.block(("end",))
            self.expect("end")
            return ("fornum", name, start, stop, step, body)
        names = [name]
        while self.accept(","):
            names.append(self.expect("name")[1])
        self.expect("in")
        exprs = self.exprlist()
        self.expect("do")
        body = self.block(("end",))
        self.expect("end")
        return ("forin", names, exprs, body)

    def funcbody(self, is_method):
        self.expect("(")
        params = ["self"] if is_method else []
        is_vararg = False
        if self.peek() != ")":
            while True:
                t = self.next()
                if t[0] == "name":
                    params.append(t[1])
                elif t[0] == "...":
                    is_vararg = True
                    break  # '...' must be the last parameter (Lua 5.1)
                else:
                    raise LuaError(f"bad parameter {t[0]!r}")
                if not self.accept(","):
                    break
        self.expect(")")
        self._vararg_stack.append(is_vararg)
        body = self.block(("end",))
        self.expect("end")
        self._vararg_stack.pop()
        return ("function", params, body, is_vararg)

    # -- expressions ------------------------------------------------------
    _BINPRI = {
        "or": (1, 1), "and": (2, 2),
        "<": (3, 3), ">": (3, 3), "<=": (3, 3), ">=": (3, 3),
        "~=": (3, 3), "==": (3, 3),
        "..": (9, 8),  # right assoc
        "+": (10, 10), "-": (10, 10),
        "*": (11, 11), "/": (11, 11), "%": (11, 11),
        "^": (14, 13),  # right assoc
    }
    _UNARY_PRI = 12

    def exprlist(self):
        out = [self.expr()]
        while self.accept(","):
            out.append(self.expr())
        return out

    def expr(self, limit=0):
        k = self.peek()
        if k in ("not", "-", "#"):
            op = self.next()[0]
            operand = self.expr(self._UNARY_PRI)
            left = ("unop", op, operand)
        else:
            left = self.simpleexp()
        while True:
            k = self.peek()
            pri = self._BINPRI.get(k)
            if pri is None or pri[0] <= limit:
                break
            op = self.next()[0]
            right = self.expr(pri[1])
            left = ("binop", op, left, right)
        return left

    def simpleexp(self):
        k, v, line = self.toks[self.i]
        if k == "number" or k == "string":
            self.next()
            return ("const", v)
        if k == "nil":
            self.next()
            return ("const", None)
        if k == "true":
            self.next()
            return ("const", True)
        if k == "false":
            self.next()
            return ("const", False)
        if k == "function":
            self.next()
            return self.funcbody(False)
        if k == "...":
            self.next()
            if not self._vararg_stack[-1]:
                # Lua 5.1 rejects this at compile time; without the check
                # the env parent-chain lookup would silently resolve to an
                # ENCLOSING function's varargs
                raise LuaError("cannot use '...' outside a vararg function")
            return ("vararg",)
        if k == "{":
            return self.tablector()
        return self.suffixedexp()

    def primaryexp(self):
        k, v, line = self.toks[self.i]
        if k == "(":
            self.next()
            e = self.expr()
            self.expect(")")
            # Lua 5.1 §2.5: a parenthesized expression is adjusted to
            # exactly ONE value — '(f(x))' and '(...)' truncate
            if e[0] in ("call", "method", "vararg"):
                return ("paren", e)
            return e
        if k == "name":
            self.next()
            return ("name", v)
        raise LuaError(f"line {line}: unexpected token {k!r}")

    def suffixedexp(self):
        e = self.primaryexp()
        while True:
            k = self.peek()
            if k == ".":
                self.next()
                field = self.expect("name")[1]
                e = ("index", e, ("const", field))
            elif k == "[":
                self.next()
                idx = self.expr()
                self.expect("]")
                e = ("index", e, idx)
            elif k == ":":
                self.next()
                meth = self.expect("name")[1]
                args = self.callargs()
                e = ("method", e, meth, args)
            elif k in ("(", "string", "{"):
                args = self.callargs()
                e = ("call", e, args)
            else:
                return e

    def callargs(self):
        k = self.peek()
        if k == "string":
            return [("const", self.next()[1])]
        if k == "{":
            return [self.tablector()]
        self.expect("(")
        args = []
        if self.peek() != ")":
            args = self.exprlist()
        self.expect(")")
        return args

    def tablector(self):
        self.expect("{")
        array_items = []
        kv_items = []
        while self.peek() != "}":
            if self.peek() == "[":
                self.next()
                key = self.expr()
                self.expect("]")
                self.expect("=")
                kv_items.append((key, self.expr()))
            elif (
                self.peek() == "name"
                and self.toks[self.i + 1][0] == "="
            ):
                key = ("const", self.next()[1])
                self.expect("=")
                kv_items.append((key, self.expr()))
            else:
                array_items.append(self.expr())
            if not (self.accept(",") or self.accept(";")):
                break
        self.expect("}")
        return ("table", array_items, kv_items)


def parse(src: str):
    return _Parser(tokenize(src)).parse_chunk()


# ---------------------------------------------------------------------------
# interpreter


class _Break(Exception):
    pass


class _CoroutineKill(BaseException):
    """Raised inside an abandoned coroutine's thread to unwind it.

    BaseException on purpose: a killed coroutine must unwind even
    through a script's own pcall (which catches Exception)."""


class _Return(Exception):
    def __init__(self, values):
        self.values = values


class _Env:
    __slots__ = ("vars", "parent")

    def __init__(self, parent=None):
        self.vars: dict = {}
        self.parent = parent

    def lookup(self, name):
        env = self
        while env is not None:
            if name in env.vars:
                return env.vars[name]
            env = env.parent
        return None

    def assign(self, name, value):
        env = self
        while env is not None:
            if name in env.vars:
                env.vars[name] = value
                return
            env = env.parent
        # new global
        root = self
        while root.parent is not None:
            root = root.parent
        root.vars[name] = value

    def declare(self, name, value):
        self.vars[name] = value


class LuaFunction:
    __slots__ = ("params", "body", "env", "interp", "is_vararg")

    def __init__(self, params, body, env, interp, is_vararg=False):
        self.params, self.body, self.env, self.interp = params, body, env, interp
        self.is_vararg = is_vararg

    def __call__(self, *args):
        env = _Env(self.env)
        for i, p in enumerate(self.params):
            env.declare(p, args[i] if i < len(args) else None)
        if self.is_vararg:
            # '...' lives in the env under a name no identifier can take
            env.declare("...", tuple(args[len(self.params):]))
        try:
            self.interp.exec_block(self.body, env)
        except _Return as r:
            return tuple(r.values)
        return ()


class LuaCoroutine:
    """Lua 5.1 coroutine (§2.11) backed by a daemon thread with strict
    hand-off: exactly one of (resumer, coroutine body) runs at any
    moment — ``resume`` blocks on ``_yield_evt`` until the body yields,
    returns, or errors; ``yield`` blocks on ``_resume_evt``.  The
    interpreter is therefore never entered concurrently, matching the
    cooperative semantics of the C implementation (and gopher-lua's
    channel-based one)."""

    def __init__(self, fn, interp):
        self.fn, self.interp = fn, interp
        self.status = "suspended"
        self._thread = None
        self._xfer = None          # values crossing the hand-off
        self._done = False
        self._error = None
        import threading

        self._resume_evt = threading.Event()
        self._yield_evt = threading.Event()
        self._threading = threading
        self._killed = False

    def resume(self, *args):
        if self.status == "dead":
            return (False, "cannot resume dead coroutine")
        if self.status != "suspended":
            return (False, "cannot resume non-suspended coroutine")
        prev = self.interp.current_coroutine
        self.interp.current_coroutine = self
        self.status = "running"
        self._xfer = args
        if self._thread is None:
            self._thread = self._threading.Thread(
                target=self._main, daemon=True
            )
            self._thread.start()
        else:
            self._resume_evt.set()
        self._yield_evt.wait()
        self._yield_evt.clear()
        self.interp.current_coroutine = prev
        if self._error is not None:
            self.status = "dead"
            err, self._error = self._error, None
            return (False, err.lua_value)
        if self._done:
            self.status = "dead"
        else:
            self.status = "suspended"
        return (True,) + tuple(self._xfer)

    def _main(self):
        try:
            self._xfer = tuple(self.interp.call(self.fn, list(self._xfer)))
        except _CoroutineKill:
            # abandoned-coroutine reap: exit silently, nobody is waiting
            self.status = "dead"
            self._done = True
            return
        except LuaError as e:
            self._error = e
        except Exception as e:  # host error surfaces as a Lua error value
            self._error = LuaError(str(e))
        except BaseException as e:
            # even SystemExit/KeyboardInterrupt on this daemon thread
            # must signal the resumer — dying without setting _yield_evt
            # would block resume() forever
            self._error = LuaError(str(e) or type(e).__name__)
        self._done = True
        self._yield_evt.set()

    def do_yield(self, *args):
        self._xfer = args
        self._yield_evt.set()
        self._resume_evt.wait()
        self._resume_evt.clear()
        if self._killed:
            raise _CoroutineKill()
        return tuple(self._xfer)

    def kill(self):
        """Unwind a suspended coroutine's thread (abandoned at the end
        of a script run — without this, every suspended-and-dropped
        coroutine leaks a thread blocked in ``_resume_evt.wait``)."""
        if self.status == "suspended" and self._thread is not None:
            self._killed = True
            self.status = "dead"
            self._resume_evt.set()
            self._thread.join(timeout=5)


def _mt_handler(v, name):
    """Metamethod lookup: ``v``'s metatable entry ``name`` or None."""
    if isinstance(v, LuaTable) and v.metatable is not None:
        return v.metatable.get(name)
    return None


_ARITH_MM = {"+": "__add", "-": "__sub", "*": "__mul", "/": "__div",
             "%": "__mod", "^": "__pow"}


def _arith(op, a, b):
    x, y = lua_tonumber(a), lua_tonumber(b)
    if x is None or y is None:
        raise LuaError(f"attempt to perform arithmetic on a {type(a).__name__}/{type(b).__name__}")
    if op == "+":
        return x + y
    if op == "-":
        return x - y
    if op == "*":
        return x * y
    if op == "/":
        if y == 0:
            return float("inf") if x > 0 else (float("-inf") if x < 0 else float("nan"))
        return x / y
    if op == "%":
        if y == 0:
            return float("nan")
        return x - (x // y) * y  # Lua: floored modulo
    if op == "^":
        return x ** y
    raise LuaError(f"bad arith op {op}")


def _compare(op, a, b):
    if isinstance(a, (int, float)) and not isinstance(a, bool) and isinstance(
        b, (int, float)
    ) and not isinstance(b, bool):
        pass
    elif isinstance(a, str) and isinstance(b, str):
        pass
    else:
        raise LuaError(f"attempt to compare {type(a).__name__} with {type(b).__name__}")
    if op == "<":
        return a < b
    if op == ">":
        return a > b
    if op == "<=":
        return a <= b
    return a >= b


class Interpreter:
    """One compiled chunk + its globals — compile once, run many
    (the reference's NewFunctionFromProto reuse,
    /root/reference/service/luaengine/redis_actuator.go:186-191)."""

    def __init__(self, src: str, modules: "dict | None" = None,
                 globals_: "dict | None" = None):
        self.ast = parse(src)
        self.modules = dict(modules or {})
        self.current_coroutine = None
        self._live_coroutines: list = []
        self.root = _Env()
        self._install_stdlib()
        for k, v in (globals_ or {}).items():
            self.root.declare(k, v)

    # -- public -----------------------------------------------------------
    def run(self, extra_globals: "dict | None" = None):
        for k, v in (extra_globals or {}).items():
            self.root.declare(k, v)
        try:
            self.exec_block(self.ast[1], _Env(self.root))
        except _Return:
            pass
        finally:
            # reap coroutines left suspended by this run: each holds a
            # blocked daemon thread; per-row execution (lua_shim
            # LuaScriptRunner) would otherwise leak one OS thread per
            # abandoned coroutine.  A reaped coroutine becomes 'dead' —
            # a later resume gets (false, "cannot resume dead
            # coroutine"), plain Lua semantics.
            for co in self._live_coroutines:
                co.kill()
            self._live_coroutines.clear()
        return self

    def global_get(self, name):
        return self.root.lookup(name)

    def global_set(self, name, value):
        self.root.declare(name, value)

    def set_os_epoch(self, epoch: float):
        """Pin the value os.time() returns (deterministic replay clock)."""
        self._os_epoch = float(epoch)

    # -- stdlib -----------------------------------------------------------
    def _install_stdlib(self):
        prints: list[str] = []
        self.printed = prints

        def lua_print(*args):
            prints.append("\t".join(self.tostring_value(a) for a in args))
            return ()

        def lua_type(v=None):
            if v is None:
                return ("nil",)
            if isinstance(v, bool):
                return ("boolean",)
            if isinstance(v, (int, float)):
                return ("number",)
            if isinstance(v, str):
                return ("string",)
            if isinstance(v, LuaTable):
                return ("table",)
            if isinstance(v, LuaCoroutine):
                return ("thread",)
            return ("function",)

        def lua_pairs(t):
            items = list(t.lua_items())
            idx = [0]

            def nxt(*_):
                if idx[0] >= len(items):
                    return (None,)
                k, v = items[idx[0]]
                idx[0] += 1
                return (k, v)

            return (nxt, t, None)

        def lua_ipairs(t):
            idx = [0]

            def nxt(*_):
                idx[0] += 1
                v = t.get(float(idx[0]))
                if v is None:
                    return (None,)
                return (float(idx[0]), v)

            return (nxt, t, 0.0)

        def lua_require(name):
            if name in self.modules:
                return (self.modules[name],)
            raise LuaError(f"module '{name}' not found")

        def lua_error(msg=None, _level=None):
            raise LuaError(lua_tostring(msg), lua_value=msg)

        def lua_assert(v=None, msg=None):
            if not _truthy(v):
                raise LuaError(lua_tostring(msg) if msg is not None else "assertion failed!")
            return (v,)

        def _fmt(spec: str, args: list):
            out = []
            ai = 0
            i = 0
            while i < len(spec):
                c = spec[i]
                if c == "%" and i + 1 < len(spec):
                    m = re.match(r"%[-+ #0]*\d*(?:\.\d+)?[diouxXeEfgGqsc%]", spec[i:])
                    if not m:
                        raise LuaError(f"bad format {spec[i:]!r}")
                    f = m.group(0)
                    i += len(f)
                    if f == "%%":
                        out.append("%")
                        continue
                    conv = f[-1]
                    a = args[ai]
                    ai += 1
                    if conv in "diouxX":
                        spec_f = f.replace("i", "d") if conv == "i" else f
                        out.append(spec_f % int(lua_tonumber(a)))
                    elif conv in "eEfgG":
                        out.append(f % lua_tonumber(a))
                    elif conv == "q":
                        out.append('"%s"' % lua_tostring(a).replace("\\", "\\\\").replace('"', '\\"').replace("\n", "\\n"))
                    elif conv == "c":
                        out.append(chr(int(lua_tonumber(a))))
                    else:
                        out.append(f % lua_tostring(a))
                    continue
                out.append(c)
                i += 1
            return "".join(out)

        string_mod = LuaTable.from_dict({})
        string_mod.set("len", lambda s: (float(len(s)),))
        string_mod.set(
            "sub",
            lambda s, i, j=None: (_str_sub(s, int(i), None if j is None else int(j)),),
        )
        string_mod.set("upper", lambda s: (s.upper(),))
        string_mod.set("lower", lambda s: (s.lower(),))
        string_mod.set("reverse", lambda s: (s[::-1],))
        string_mod.set("rep", lambda s, n: (s * int(n),))
        string_mod.set("format", lambda spec, *a: (_fmt(spec, list(a)),))
        string_mod.set(
            "find",
            lambda s, pat, init=1.0, plain=None: _str_find(s, pat, int(init)),
        )
        string_mod.set(
            "gsub",
            lambda s, pat, repl, n=None: _str_gsub(s, pat, repl, n),
        )
        string_mod.set(
            "match",
            lambda s, pat, init=1.0: _str_match(s, pat, int(init)),
        )
        string_mod.set("gmatch", lambda s, pat: (_str_gmatch(s, pat),))

        def s_byte(s, i=1.0, j=None):
            i = int(i)
            j = i if j is None else int(j)
            n = len(s)
            if i < 0:
                i = max(n + i + 1, 1)
            if j < 0:
                j = n + j + 1
            j = min(j, n)
            return tuple(float(ord(c)) for c in s[max(i, 1) - 1 : j])

        string_mod.set("byte", s_byte)
        string_mod.set(
            "char", lambda *a: ("".join(chr(int(lua_tonumber(x))) for x in a),)
        )

        table_mod = LuaTable.from_dict({})

        def t_insert(t, a, b=None):
            if b is None:
                t.set(float(t.length() + 1), a)
            else:
                pos = int(a)
                n = t.length()
                for i in range(n, pos - 1, -1):
                    t.set(float(i + 1), t.get(float(i)))
                t.set(float(pos), b)
            return ()

        def t_remove(t, pos=None):
            n = t.length()
            if n == 0:
                return (None,)
            p = n if pos is None else int(pos)
            v = t.get(float(p))
            for i in range(p, n):
                t.set(float(i), t.get(float(i + 1)))
            t.set(float(n), None)
            return (v,)

        def t_concat(t, sep="", i=1.0, j=None):
            n = t.length() if j is None else int(j)
            return (sep.join(lua_tostring(t.get(float(x))) for x in range(int(i), n + 1)),)

        def t_sort(t, comp=None):
            """table.sort (5.1 §5.5): in-place array-part sort; an
            optional comparator returns true when a must come BEFORE b.
            Python's sort is stable + comparator-based via cmp_to_key."""
            n = t.length()
            items = [t.get(float(i)) for i in range(1, n + 1)]
            if comp is None:
                import functools

                def c(a, b):
                    lt = self._order("<", a, b)
                    if lt:
                        return -1
                    return 1 if self._order("<", b, a) else 0

                items.sort(key=functools.cmp_to_key(c))
            else:
                import functools

                def c(a, b):
                    res = self.call(comp, [a, b])
                    if _truthy(res[0] if res else None):
                        return -1
                    res = self.call(comp, [b, a])
                    return 1 if _truthy(res[0] if res else None) else 0

                items.sort(key=functools.cmp_to_key(c))
            for i, v in enumerate(items):
                t.set(float(i + 1), v)
            return ()

        table_mod.set("insert", t_insert)
        table_mod.set("remove", t_remove)
        table_mod.set("concat", t_concat)
        table_mod.set("sort", t_sort)
        # Lua 5.0 legacy kept by 5.1 (and gopher-lua): getn == #t
        table_mod.set("getn", lambda t: (float(t.length()),))

        math_mod = LuaTable.from_dict({})
        math_mod.set("floor", lambda x: (float(int(lua_tonumber(x) // 1)),))
        math_mod.set("ceil", lambda x: (float(-int(-lua_tonumber(x) // 1)),))
        math_mod.set("abs", lambda x: (abs(lua_tonumber(x)),))
        math_mod.set("max", lambda *a: (max(lua_tonumber(x) for x in a),))
        math_mod.set("min", lambda *a: (min(lua_tonumber(x) for x in a),))
        math_mod.set("sqrt", lambda x: (lua_tonumber(x) ** 0.5,))
        math_mod.set("pow", lambda x, y: (lua_tonumber(x) ** lua_tonumber(y),))

        def m_fmod(x, y):
            # C fmod (truncated), unlike the % operator's floored modulo
            import math as _m

            return (_m.fmod(lua_tonumber(x), lua_tonumber(y)),)

        def m_modf(x):
            v = lua_tonumber(x)
            if v != v or v in (float("inf"), float("-inf")):
                # C modf: modf(±inf) = (±inf, ±0), modf(nan) = (nan, nan)
                return (v, 0.0 if v == v else v)
            ip = float(int(v)) if v >= 0 else -float(int(-v))
            return (ip, v - ip)

        math_mod.set("fmod", m_fmod)
        math_mod.set("modf", m_modf)
        math_mod.set("huge", None)
        math_mod.hash["huge"] = float("inf")
        math_mod.hash["pi"] = 3.141592653589793

        # math.random: gopher-lua seeds from the OS; a REPLAYABLE pipeline
        # needs determinism, so this is Lua 5.1's semantics over a per-
        # interpreter xorshift64* stream with a fixed default seed —
        # randomseed() makes script behavior reproducible across runs
        self._rand_state = 88172645463325252

        def _next_rand() -> float:
            x = self._rand_state & 0xFFFFFFFFFFFFFFFF
            x ^= (x << 13) & 0xFFFFFFFFFFFFFFFF
            x ^= x >> 7
            x ^= (x << 17) & 0xFFFFFFFFFFFFFFFF
            self._rand_state = x
            return ((x * 2685821657736338717) & 0xFFFFFFFFFFFFFFFF) / 2**64

        def m_random(m=None, n=None):
            # Lua 5.1 validates the interval BEFORE drawing (lmathlib.c
            # math_random: luaL_argcheck(1<=u / m<=u, "interval is empty"))
            # — gopher-lua raises the same error, observable via pcall.
            r = _next_rand()
            if m is None:
                return (r,)
            if n is None:
                hi = int(lua_tonumber(m))
                if hi < 1:
                    raise LuaError(
                        "bad argument #1 to 'random' (interval is empty)"
                    )
                return (float(1 + int(r * hi)),)
            lo, hi = int(lua_tonumber(m)), int(lua_tonumber(n))
            if hi < lo:
                raise LuaError(
                    "bad argument #2 to 'random' (interval is empty)"
                )
            return (float(lo + int(r * (hi - lo + 1))),)

        def m_randomseed(x=None):
            self._rand_state = (int(lua_tonumber(x) or 0) or 1) & 0xFFFFFFFFFFFFFFFF
            return ()

        import math as _math_host

        for _name in ("exp", "sin", "cos", "tan", "asin", "acos", "atan"):
            _f = getattr(_math_host, _name)
            math_mod.set(
                _name, (lambda f: lambda x: (f(lua_tonumber(x)),))(_f)
            )

        def m_log(x, base=None):
            v = lua_tonumber(x)
            if base is None:
                return (_math_host.log(v),)
            return (_math_host.log(v) / _math_host.log(lua_tonumber(base)),)

        math_mod.set("log", m_log)
        math_mod.set("random", m_random)
        math_mod.set("randomseed", m_randomseed)

        def lua_pcall(fn=None, *args):
            """pcall (Lua 5.1 §5.1): protected call — (true, results...)
            or (false, error value); the original error VALUE is
            preserved (tables commonly carry structured errors)."""
            try:
                return (True,) + tuple(self.call(fn, list(args)))
            except LuaError as e:
                return (False, e.lua_value)
            except (_Break, _Return):
                raise  # interpreter control flow, not an error
            except Exception as e:
                # host-level errors (bad stdlib args etc.) are ordinary
                # Lua errors to the script, exactly as in the coroutine
                # body path (_main) — a protected call must never crash
                # the interpreter run
                return (False, str(e))

        def lua_xpcall(fn=None, handler=None):
            try:
                return (True,) + tuple(self.call(fn, []))
            except LuaError as e:
                res = self.call(handler, [e.lua_value])
                return (False,) + tuple(res)
            except (_Break, _Return):
                raise
            except Exception as e:
                res = self.call(handler, [str(e)])
                return (False,) + tuple(res)

        def lua_rawequal(a=None, b=None):
            if isinstance(a, LuaTable) or isinstance(b, LuaTable):
                return (a is b,)
            return (_lua_eq(a, b),)

        g = self.root
        g.declare("print", lua_print)
        g.declare("type", lua_type)
        g.declare("tostring", lambda v=None: (self.tostring_value(v),))
        g.declare("pcall", lua_pcall)
        g.declare("xpcall", lua_xpcall)
        g.declare("rawequal", lua_rawequal)
        g.declare("tonumber", lambda v=None, base=None: (
            (float(int(v, int(base))) if isinstance(v, str) and base is not None else lua_tonumber(v)),
        ))
        g.declare("pairs", lua_pairs)
        g.declare("ipairs", lua_ipairs)

        def lua_select(n, *rest):
            if n == "#":
                return (float(len(rest)),)
            k = int(lua_tonumber(n))
            if k < 0:
                k = len(rest) + k + 1
            if k < 1:
                raise LuaError("bad argument #1 to 'select' (index out of range)")
            return tuple(rest[k - 1 :])

        def lua_unpack(t, i=1.0, j=None):
            n = t.length() if j is None else int(j)
            return tuple(t.get(float(x)) for x in range(int(i), n + 1))

        g.declare("select", lua_select)
        g.declare("unpack", lua_unpack)

        def lua_setmetatable(t=None, mt=None):
            if not isinstance(t, LuaTable):
                raise LuaError("bad argument #1 to 'setmetatable' (table expected)")
            if mt is not None and not isinstance(mt, LuaTable):
                raise LuaError("bad argument #2 to 'setmetatable' (nil or table expected)")
            t.metatable = mt
            return (t,)

        def lua_rawset(t, k, v=None):
            if not isinstance(t, LuaTable):
                raise LuaError("bad argument #1 to 'rawset' (table expected)")
            t.set(k, v)
            return (t,)

        g.declare("setmetatable", lua_setmetatable)
        g.declare(
            "getmetatable",
            lambda t=None: (t.metatable if isinstance(t, LuaTable) else None,),
        )
        g.declare(
            "rawget",
            lambda t, k=None: (t.get(k) if isinstance(t, LuaTable) else None,),
        )
        g.declare("rawset", lua_rawset)
        # coroutine library (Lua 5.1 §5.2) — create/resume/yield/status/
        # wrap/running, thread-backed strict hand-off (LuaCoroutine)
        co_mod = LuaTable.from_dict({})

        def co_create(fn=None):
            if not (isinstance(fn, LuaFunction) or callable(fn)):
                raise LuaError("bad argument #1 to 'create' (function expected)")
            co = LuaCoroutine(fn, self)
            self._live_coroutines.append(co)
            return (co,)

        def co_resume(co=None, *args):
            if not isinstance(co, LuaCoroutine):
                raise LuaError("bad argument #1 to 'resume' (coroutine expected)")
            return co.resume(*args)

        def co_yield(*args):
            co = self.current_coroutine
            if co is None:
                raise LuaError("attempt to yield from outside a coroutine")
            return co.do_yield(*args)

        def co_status(co=None):
            if not isinstance(co, LuaCoroutine):
                raise LuaError("bad argument #1 to 'status' (coroutine expected)")
            if co is self.current_coroutine:
                return ("running",)
            # a coroutine that resumed another is 'normal' (5.1 §5.2)
            return ("normal" if co.status == "running" else co.status,)

        def co_wrap(fn=None):
            co = co_create(fn)[0]

            def wrapped(*args):
                res = co.resume(*args)
                if not res[0]:
                    raise LuaError(lua_tostring(res[1]), lua_value=res[1])
                return tuple(res[1:])

            return (wrapped,)

        co_mod.set("create", co_create)
        co_mod.set("resume", co_resume)
        co_mod.set("yield", co_yield)
        co_mod.set("status", co_status)
        co_mod.set("wrap", co_wrap)
        co_mod.set("running", lambda: (self.current_coroutine,))

        g.declare("require", lua_require)
        g.declare("error", lua_error)
        g.declare("assert", lua_assert)
        g.declare("coroutine", co_mod)
        g.declare("string", string_mod)
        g.declare("table", table_mod)
        g.declare("math", math_mod)

        # os module — DETERMINISTIC by design: a replayable pipeline must
        # produce identical output on re-run, so os.time() returns a
        # fixed per-interpreter epoch (override with
        # interp.set_os_epoch(...) or by passing a date table, the 5.1
        # os.time(t) form) and os.clock() a monotone counter.  os.date
        # formats in UTC (a worker's local TZ is nondeterministic across
        # a cluster); '*t'/'!*t' return the 5.1 date table.
        import calendar as _cal
        import time as _time_host

        self._os_epoch = 1_600_000_000.0
        self._os_clock = [0.0]
        os_mod = LuaTable.from_dict({})

        def os_time(t=None):
            if isinstance(t, LuaTable):
                def fld(name, default):
                    v = t.get(name)
                    # 5.1 defaults hour to 12 (min/sec to 0) only when
                    # ABSENT — `or` would misread an explicit 0
                    return default if v is None else int(lua_tonumber(v))

                tm = (
                    fld("year", 0),
                    fld("month", 1),
                    fld("day", 1),
                    fld("hour", 12),
                    fld("min", 0),
                    fld("sec", 0),
                    0,
                    0,
                )
                return (float(_cal.timegm(tm)),)
            return (self._os_epoch,)

        def os_date(fmt=None, t=None):
            fmt = fmt if isinstance(fmt, str) else "%c"
            epoch = lua_tonumber(t) if t is not None else self._os_epoch
            if fmt.startswith("!"):
                fmt = fmt[1:]  # '!' selects UTC; we are always UTC
            st = _time_host.gmtime(epoch)
            if fmt.startswith("*t"):
                return (
                    LuaTable.from_dict(
                        {
                            "year": float(st.tm_year),
                            "month": float(st.tm_mon),
                            "day": float(st.tm_mday),
                            "hour": float(st.tm_hour),
                            "min": float(st.tm_min),
                            "sec": float(st.tm_sec),
                            "wday": float(st.tm_wday == 6 and 1 or st.tm_wday + 2),
                            "yday": float(st.tm_yday),
                            "isdst": False,
                        }
                    ),
                )
            return (_time_host.strftime(fmt, st),)

        def os_clock():
            self._os_clock[0] += 0.001
            return (self._os_clock[0],)

        os_mod.set("time", os_time)
        os_mod.set("date", os_date)
        os_mod.set("clock", os_clock)
        os_mod.set("difftime", lambda a, b=0.0: (
            lua_tonumber(a) - lua_tonumber(b),
        ))
        os_mod.set("getenv", lambda *_: (None,))
        g.declare("os", os_mod)

    # -- execution --------------------------------------------------------
    def exec_block(self, stmts, env):
        for s in stmts:
            self.exec_stmt(s, env)

    def exec_stmt(self, s, env):
        kind = s[0]
        if kind == "local":
            _, names, exprs = s
            vals = self.eval_list(exprs, env, len(names))
            for n, v in zip(names, vals):
                env.declare(n, v)
        elif kind == "localfunc":
            _, name, fnexpr = s
            env.declare(name, None)
            env.vars[name] = self.eval(fnexpr, env)
        elif kind == "assign":
            _, targets, exprs = s
            vals = self.eval_list(exprs, env, len(targets))
            for t, v in zip(targets, vals):
                if t[0] == "name":
                    env.assign(t[1], v)
                else:  # index
                    obj = self.eval(t[1], env)
                    key = self.eval(t[2], env)
                    if not isinstance(obj, LuaTable):
                        raise LuaError("attempt to index a non-table value")
                    self.mt_newindex(obj, key, v)
        elif kind == "exprstat":
            self.eval_multi(s[1], env)
        elif kind == "do":
            self.exec_block(s[1], _Env(env))
        elif kind == "if":
            _, clauses, els = s
            for cond, body in clauses:
                if _truthy(self.eval(cond, env)):
                    self.exec_block(body, _Env(env))
                    return
            if els:
                self.exec_block(els, _Env(env))
        elif kind == "while":
            _, cond, body = s
            while _truthy(self.eval(cond, env)):
                try:
                    self.exec_block(body, _Env(env))
                except _Break:
                    break
        elif kind == "repeat":
            _, body, cond = s
            while True:
                inner = _Env(env)
                try:
                    self.exec_block(body, inner)
                except _Break:
                    break
                if _truthy(self.eval(cond, inner)):
                    break
        elif kind == "fornum":
            _, name, start, stop, step, body = s
            i = lua_tonumber(self.eval(start, env))
            stop_v = lua_tonumber(self.eval(stop, env))
            step_v = lua_tonumber(self.eval(step, env))
            if i is None or stop_v is None or step_v is None or step_v == 0:
                raise LuaError("'for' initial value must be a number")
            while (step_v > 0 and i <= stop_v) or (step_v < 0 and i >= stop_v):
                inner = _Env(env)
                inner.declare(name, i)
                try:
                    self.exec_block(body, inner)
                except _Break:
                    break
                i += step_v
        elif kind == "forin":
            _, names, exprs, body = s
            vals = self.eval_list(exprs, env, 3)
            fn, state, ctrl = vals[0], vals[1], vals[2]
            while True:
                res = self.call(fn, [state, ctrl])
                if not res or res[0] is None:
                    break
                ctrl = res[0]
                inner = _Env(env)
                for i, n in enumerate(names):
                    inner.declare(n, res[i] if i < len(res) else None)
                try:
                    self.exec_block(body, inner)
                except _Break:
                    break
        elif kind == "return":
            vals = []
            exprs = s[1]
            for i, e in enumerate(exprs):
                if i == len(exprs) - 1:
                    vals.extend(self.eval_multi(e, env))
                else:
                    vals.append(self.eval(e, env))
            raise _Return(vals)
        elif kind == "break":
            raise _Break()
        else:
            raise LuaError(f"unknown statement {kind}")

    def eval_list(self, exprs, env, want):
        vals = []
        for i, e in enumerate(exprs):
            if i == len(exprs) - 1:
                vals.extend(self.eval_multi(e, env))
            else:
                vals.append(self.eval(e, env))
        while len(vals) < want:
            vals.append(None)
        return vals

    def eval_multi(self, e, env):
        """Evaluate, preserving multiple results for calls."""
        if e[0] == "vararg":
            return list(env.lookup("...") or ())
        if e[0] == "call":
            fn = self.eval(e[1], env)
            args = self._args(e[2], env)
            return list(self.call(fn, args))
        if e[0] == "method":
            obj = self.eval(e[1], env)
            if isinstance(obj, LuaTable):
                fn = self.mt_index(obj, e[2])
            elif isinstance(obj, str):
                smod = self.root.lookup("string")
                fn = smod.get(e[2]) if smod else None
            else:
                raise LuaError("attempt to index a non-table value (method call)")
            args = [obj] + self._args(e[3], env)
            return list(self.call(fn, args))
        return [self.eval(e, env)]

    def _args(self, arg_exprs, env):
        args = []
        for i, a in enumerate(arg_exprs):
            if i == len(arg_exprs) - 1:
                args.extend(self.eval_multi(a, env))
            else:
                args.append(self.eval(a, env))
        return args

    def mt_index(self, obj: "LuaTable", key):
        """Table read honoring the __index chain (Lua 5.1 §2.8): raw
        value if present, else a table handler is searched recursively,
        a function handler is called with (table, key)."""
        val = obj.get(key)
        if val is not None:
            return val
        seen = 0
        cur = obj
        while cur.metatable is not None:
            handler = cur.metatable.get("__index")
            if handler is None:
                return None
            if isinstance(handler, LuaTable):
                val = handler.get(key)
                if val is not None:
                    return val
                cur = handler
                seen += 1
                if seen > 100:  # the C limit for __index chains
                    raise LuaError("'__index' chain too long; possible loop")
                continue
            res = self.call(handler, [cur, key])
            return res[0] if res else None
        return None

    def mt_newindex(self, obj: "LuaTable", key, value, _depth: int = 0):
        """Table write honoring __newindex: raw set when the key already
        exists or no handler; table handler recurses, function handler
        is called with (table, key, value).  Handler cycles raise a
        contained LuaError (Lua 5.1's 'loop in settable'), same cap as
        the __index chain."""
        if _depth > 100:
            raise LuaError("'__newindex' chain too long; possible loop")
        if obj.get(key) is not None or obj.metatable is None:
            obj.set(key, value)
            return
        handler = obj.metatable.get("__newindex")
        if handler is None:
            obj.set(key, value)
            return
        if isinstance(handler, LuaTable):
            self.mt_newindex(handler, key, value, _depth + 1)
            return
        self.call(handler, [obj, key, value])

    def call(self, fn, args):
        if fn is None:
            raise LuaError("attempt to call a nil value")
        if isinstance(fn, LuaFunction):
            return fn(*args)
        if isinstance(fn, LuaTable):
            h = _mt_handler(fn, "__call")
            if h is not None:
                return self.call(h, [fn] + list(args))
            raise LuaError("attempt to call a table value")
        if callable(fn):
            res = fn(*args)
            if res is None:
                return ()
            if isinstance(res, tuple):
                return res
            return (res,)
        raise LuaError(f"attempt to call a {type(fn).__name__} value")

    def tostring_value(self, v):
        """``tostring``/``print`` path honoring ``__tostring``."""
        h = _mt_handler(v, "__tostring")
        if h is not None:
            return lua_tostring(self._first(self.call(h, [v])))
        return lua_tostring(v)

    def eval(self, e, env):
        kind = e[0]
        if kind == "const":
            return e[1]
        if kind == "name":
            return env.lookup(e[1])
        if kind == "index":
            obj = self.eval(e[1], env)
            key = self.eval(e[2], env)
            if isinstance(obj, LuaTable):
                return self.mt_index(obj, key)
            if isinstance(obj, str):
                # string methods via the string module
                smod = self.root.lookup("string")
                return smod.get(key) if smod else None
            if obj is None:
                raise LuaError(f"attempt to index a nil value ({e[1]})")
            raise LuaError("attempt to index a non-table value")
        if kind in ("call", "method", "vararg"):
            res = self.eval_multi(e, env)
            return res[0] if res else None
        if kind == "paren":
            return self.eval(e[1], env)
        if kind == "function":
            return LuaFunction(e[1], e[2], env, self,
                               e[3] if len(e) > 3 else False)
        if kind == "table":
            t = LuaTable()
            _, arr, kv = e
            i = 1
            for j, item in enumerate(arr):
                if j == len(arr) - 1:
                    for v in self.eval_multi(item, env):
                        t.set(float(i), v)
                        i += 1
                else:
                    t.set(float(i), self.eval(item, env))
                    i += 1
            for k_expr, v_expr in kv:
                t.set(self.eval(k_expr, env), self.eval(v_expr, env))
            return t
        if kind == "unop":
            op = e[1]
            if op == "not":
                return not _truthy(self.eval(e[2], env))
            if op == "-":
                raw = self.eval(e[2], env)
                v = lua_tonumber(raw)
                if v is None:
                    h = _mt_handler(raw, "__unm")
                    if h is not None:
                        return self._first(self.call(h, [raw, raw]))
                    raise LuaError("attempt to perform arithmetic on a non-number")
                return -v
            if op == "#":
                v = self.eval(e[2], env)
                if isinstance(v, str):
                    return float(len(v))
                if isinstance(v, LuaTable):
                    # gopher-lua consults __len for tables before the raw
                    # border (a superset of strict 5.1, identical when no
                    # metatable is set)
                    h = _mt_handler(v, "__len")
                    if h is not None:
                        return self._first(self.call(h, [v]))
                    return float(v.length())
                raise LuaError("attempt to get length of a non-table/string")
        if kind == "binop":
            op = e[1]
            if op == "and":
                left = self.eval(e[2], env)
                return self.eval(e[3], env) if _truthy(left) else left
            if op == "or":
                left = self.eval(e[2], env)
                return left if _truthy(left) else self.eval(e[3], env)
            a = self.eval(e[2], env)
            b = self.eval(e[3], env)
            if op == "==":
                return self._eq(a, b)
            if op == "~=":
                return not self._eq(a, b)
            if op in ("<", ">", "<=", ">="):
                return self._order(op, a, b)
            if op == "..":
                if _concatable(a) and _concatable(b):
                    return _concat(a) + _concat(b)
                h = _mt_handler(a, "__concat") or _mt_handler(b, "__concat")
                if h is not None:
                    return self._first(self.call(h, [a, b]))
                return _concat(a) + _concat(b)  # raises the precise error
            if lua_tonumber(a) is None or lua_tonumber(b) is None:
                h = _mt_handler(a, _ARITH_MM[op]) or _mt_handler(b, _ARITH_MM[op])
                if h is not None:
                    return self._first(self.call(h, [a, b]))
            return _arith(op, a, b)
        raise LuaError(f"unknown expression {kind}")

    # -- metamethod-aware operator semantics (Lua 5.1 §2.8) ----------------
    @staticmethod
    def _first(res):
        return res[0] if res else None

    def _eq(self, a, b):
        """``==``: raw equality, then ``__eq`` — consulted only when both
        operands are tables sharing the SAME handler (5.1 getcomphandler)."""
        if _lua_eq(a, b):
            return True
        if isinstance(a, LuaTable) and isinstance(b, LuaTable):
            h1, h2 = _mt_handler(a, "__eq"), _mt_handler(b, "__eq")
            if h1 is not None and h1 is h2:
                return _truthy(self._first(self.call(h1, [a, b])))
        return False

    def _order(self, op, a, b):
        """``< > <= >=``: primitive for number/number and string/string,
        else ``__lt``/``__le``; a missing ``__le`` falls back to
        ``not (b < a)`` via ``__lt`` (5.1 §2.8 'le' event)."""
        num = (isinstance(a, (int, float)) and not isinstance(a, bool)
               and isinstance(b, (int, float)) and not isinstance(b, bool))
        if num or (isinstance(a, str) and isinstance(b, str)):
            return _compare(op, a, b)
        if op == ">":
            return self._order("<", b, a)
        if op == ">=":
            return self._order("<=", b, a)
        mm = "__lt" if op == "<" else "__le"
        h = _mt_handler(a, mm) or _mt_handler(b, mm)
        if h is not None:
            return _truthy(self._first(self.call(h, [a, b])))
        if op == "<=":
            h = _mt_handler(a, "__lt") or _mt_handler(b, "__lt")
            if h is not None:
                return not _truthy(self._first(self.call(h, [b, a])))
        return _compare(op, a, b)  # raises the precise error


def _lua_eq(a, b):
    if isinstance(a, bool) or isinstance(b, bool):
        return a is b
    if isinstance(a, (int, float)) and isinstance(b, (int, float)):
        return float(a) == float(b)
    if type(a) is not type(b) and not (
        isinstance(a, str) and isinstance(b, str)
    ):
        return a is b
    if isinstance(a, (LuaTable,)) or callable(a):
        return a is b
    return a == b


def _concatable(v) -> bool:
    return isinstance(v, str) or (
        isinstance(v, (int, float)) and not isinstance(v, bool)
    )


def _concat(v) -> str:
    if isinstance(v, (int, float)) and not isinstance(v, bool):
        return lua_tostring(float(v) if isinstance(v, int) else v)
    if isinstance(v, str):
        return v
    raise LuaError(f"attempt to concatenate a {type(v).__name__} value")


def _str_sub(s: str, i: int, j: "int | None") -> str:
    n = len(s)
    if j is None:
        j = -1
    if i < 0:
        i = max(n + i + 1, 1)
    elif i == 0:
        i = 1
    if j < 0:
        j = n + j + 1
    elif j > n:
        j = n
    if i > j:
        return ""
    return s[i - 1: j]


def _lua_pat_to_re(pat: str) -> str:
    """Tiny Lua-pattern → Python-regex translation (the classes rule
    scripts use: %d %a %s %w %p and their uppercase negations, anchors,
    ``.``, ``*``, ``+``, ``-`` (lazy), ``?``, sets)."""
    out = []
    i = 0
    classes = {"d": r"\d", "a": "[a-zA-Z]", "s": r"\s", "w": r"\w",
               "p": r"[\!-\/\:-\@\[-\`\{-\~]", "l": "[a-z]", "u": "[A-Z]"}
    while i < len(pat):
        c = pat[i]
        if c == "%":
            nxt = pat[i + 1] if i + 1 < len(pat) else ""
            low = nxt.lower()
            if low in classes:
                cls = classes[low]
                if nxt.isupper():
                    # negate the CLASS, not its last letter: %D → [^\d]
                    if cls.startswith("["):
                        cls = "[^" + cls[1:-1] + "]"
                    else:
                        cls = f"[^{cls}]"  # "\d" → "[^\d]"
                out.append(cls)
            else:
                out.append(re.escape(nxt))
            i += 2
            continue
        if c == "-":
            # lazy quantifier only when something repeatable precedes it
            # (Lua treats a leading '-' as a literal)
            if out and out[-1] not in ("^", "(", "*", "+", "?", "*?") and not out[-1].endswith(("*", "+", "?")):
                out.append("*?")
            else:
                out.append(re.escape("-"))
            i += 1
            continue
        if c in ".*+?^$()[]":
            out.append(c)
            i += 1
            continue
        out.append(re.escape(c))
        i += 1
    return "".join(out)


def _str_find(s: str, pat: str, init: int = 1):
    m = re.compile(_lua_pat_to_re(pat)).search(s, init - 1)
    if not m:
        return (None,)
    # Lua: captures follow the positions (5.1 manual §5.4 string.find)
    return (float(m.start() + 1), float(m.end())) + m.groups()


def _match_values(m: "re.Match"):
    """Lua match semantics: captures if the pattern has any, else the
    whole match."""
    return m.groups() if m.groups() else (m.group(0),)


def _str_match(s: str, pat: str, init: int = 1):
    m = re.compile(_lua_pat_to_re(pat)).search(s, init - 1)
    if not m:
        return (None,)
    return _match_values(m)


def _str_gmatch(s: str, pat: str):
    """string.gmatch: returns an iterator function over non-overlapping
    matches (Lua 5.1 manual §5.4); empty matches advance one position so
    the iteration terminates, like the C implementation."""
    rx = re.compile(_lua_pat_to_re(pat))
    state = {"pos": 0}

    def it(*_):
        while state["pos"] <= len(s):
            m = rx.search(s, state["pos"])
            if m is None:
                return (None,)
            state["pos"] = m.end() + 1 if m.end() == m.start() else m.end()
            return _match_values(m)
        return (None,)

    return it


def _str_gsub(s: str, pat: str, repl, n=None):
    count = 0 if n is None else int(n)
    if isinstance(repl, str):
        py_repl = repl.replace("\\", "\\\\").replace("%1", r"\1").replace("%0", r"\g<0>")
        out, cnt = re.subn(_lua_pat_to_re(pat), py_repl, s, count=count)
    else:
        def f(m):
            r = repl(m.group(0)) if callable(repl) else m.group(0)
            if isinstance(r, tuple):
                r = r[0] if r else None
            return lua_tostring(r) if r is not None else m.group(0)

        out, cnt = re.subn(_lua_pat_to_re(pat), f, s, count=count)
    return (out, float(cnt))
