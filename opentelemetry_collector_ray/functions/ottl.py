"""Mini-OTTL statement layer — parse transformprocessor-style statement
STRINGS and compile them into ONE vectorized batch function.

The reference config surface this mirrors is the transform processor's
statement lists (contrib ``pkg/ottl`` grammar; the core repo consumes
them through ``processor/transformprocessor`` configs):

    - set(attributes["env"], "prod") where severity_text == "ERROR"
    - set(body, ConvertCase(body, "lower"))
    - replace_pattern(body, "user=\\w+", "user=***")
    - delete_key(attributes, "secret") / keep_keys / rename_key

Grammar subset::

    statement := editor [ "where" boolexpr ]
    editor    := set(target, expr)
               | replace_pattern(target, "re", "repl")
               | delete_key(MAP, "k") | rename_key(MAP, "a", "b")
               | keep_keys(MAP, ["a", ...])
    target    := column | MAP["key"]
    expr      := literal | target | Converter(expr, ...)
    Converter := ConvertCase | Substring | SHA256 | MD5 | Concat
               | JSONPath
    boolexpr  := or-chain of and-chains of [not] comparisons
                 (== != < <= > >=), IsMatch(expr, "re"), parentheses

``column`` is a plain table column; ``MAP["key"]`` addresses the
string-map attributes column (default name ``attrs``, the
``functions/mapattrs`` layout). Compilation is whole-column Arrow
kernels with a row mask for ``where`` (``pc.if_else``) — one pass per
statement list, no per-row Python.

Scope notes (loud, not silent): conditional ``set`` on a MAP key
materializes the key for every row (non-matching rows keep their
previous value, or null when the key was absent — Arrow string maps
have no per-row absence under a vectorized put); the structural
editors (delete/keep/rename) are whole-column and reject ``where``.
"""

from __future__ import annotations

import re

import pyarrow as pa
import pyarrow.compute as pc

from . import mapattrs
from .text import convert_case, md5_hex, sha256_hex, substring

__all__ = ["parse_statement", "compile_statements"]

_TOKEN_RE = re.compile(r"""
    (?P<ws>\s+)
  | (?P<string>"(?:[^"\\]|\\.)*"|'(?:[^'\\]|\\.)*')
  | (?P<number>-?\d+\.\d+|-?\d+)
  | (?P<op>==|!=|<=|>=|<|>)
  | (?P<sym>[()\[\],])
  | (?P<ident>[A-Za-z_][A-Za-z0-9_.]*)
""", re.VERBOSE)

_EDITORS = ("set", "replace_pattern", "delete_key", "rename_key",
            "keep_keys")
_CONVERTERS = ("ConvertCase", "Substring", "SHA256", "MD5", "Concat",
               "IsMatch", "JSONPath")


def _tokenize(s: str) -> list[tuple[str, str]]:
    out, i = [], 0
    while i < len(s):
        m = _TOKEN_RE.match(s, i)
        if not m:
            raise ValueError(f"OTTL: cannot tokenize at {s[i:i+20]!r}")
        i = m.end()
        kind = m.lastgroup
        if kind == "ws":
            continue
        out.append((kind, m.group()))
    out.append(("eof", ""))
    return out


class _Parser:
    def __init__(self, s: str):
        self.toks = _tokenize(s)
        self.pos = 0
        self.src = s

    def peek(self):
        return self.toks[self.pos]

    def next(self):
        t = self.toks[self.pos]
        self.pos += 1
        return t

    def expect(self, val: str):
        k, v = self.next()
        if v != val:
            raise ValueError(f"OTTL: expected {val!r}, got {v!r} in "
                             f"{self.src!r}")

    # ---- expressions -------------------------------------------------
    def expr(self):
        k, v = self.peek()
        if k == "string":
            self.next()
            return ("lit", _unquote(v))
        if k == "number":
            self.next()
            return ("lit", float(v) if "." in v else int(v))
        if k == "sym" and v == "[":
            self.next()
            items = []
            while self.peek()[1] != "]":
                node = self.expr()
                if node[0] != "lit":
                    raise ValueError("OTTL: list literals may only "
                                     "contain literals")
                items.append(node[1])
                if self.peek()[1] == ",":
                    self.next()
            self.expect("]")
            return ("lit", items)
        if k == "ident":
            self.next()
            if v in ("true", "false"):
                return ("lit", v == "true")
            if v == "nil":
                return ("lit", None)
            if self.peek()[1] == "(":
                if v not in _CONVERTERS:
                    raise ValueError(f"OTTL: unknown converter {v!r} "
                                     f"(supported: {_CONVERTERS})")
                self.next()
                args = []
                while self.peek()[1] != ")":
                    args.append(self.expr())
                    if self.peek()[1] == ",":
                        self.next()
                self.expect(")")
                return ("call", v, args)
            if self.peek()[1] == "[":
                self.next()
                kk, kv = self.next()
                if kk != "string":
                    raise ValueError("OTTL: map key must be a string "
                                     "literal")
                self.expect("]")
                return ("mappath", v, _unquote(kv))
            return ("path", v)
        raise ValueError(f"OTTL: unexpected token {v!r} in {self.src!r}")

    # ---- conditions --------------------------------------------------
    def boolexpr(self):
        node = self.andexpr()
        while self.peek() == ("ident", "or"):
            self.next()
            node = ("or", node, self.andexpr())
        return node

    def andexpr(self):
        node = self.cmp()
        while self.peek() == ("ident", "and"):
            self.next()
            node = ("and", node, self.cmp())
        return node

    def cmp(self):
        if self.peek() == ("ident", "not"):
            self.next()
            return ("not", self.cmp())
        if self.peek()[1] == "(":
            self.next()
            node = self.boolexpr()
            self.expect(")")
            return node
        left = self.expr()
        k, v = self.peek()
        if k == "op":
            self.next()
            return ("cmp", v, left, self.expr())
        # bare boolean expression (IsMatch(...))
        return ("truthy", left)

    # ---- statement ---------------------------------------------------
    def statement(self):
        k, name = self.next()
        if k != "ident" or name not in _EDITORS:
            raise ValueError(f"OTTL: unknown editor {name!r} "
                             f"(supported: {_EDITORS})")
        self.expect("(")
        args = []
        while self.peek()[1] != ")":
            args.append(self.expr())
            if self.peek()[1] == ",":
                self.next()
        self.expect(")")
        where = None
        if self.peek() == ("ident", "where"):
            self.next()
            where = self.boolexpr()
        if self.peek()[0] != "eof":
            raise ValueError(f"OTTL: trailing tokens in {self.src!r}")
        return {"editor": name, "args": args, "where": where}


def _unquote(v: str) -> str:
    body = v[1:-1]
    return re.sub(r"\\(.)", r"\1", body)


def parse_statement(s: str) -> dict:
    """One statement string → AST dict {editor, args, where}."""
    return _Parser(s).statement()


# ---------------------------------------------------------------- compile

def _eval(node, t: pa.Table, map_col: str):
    kind = node[0]
    if kind == "lit":
        return node[1]
    if kind == "path":
        name = node[1]
        if name not in t.column_names:
            raise KeyError(f"OTTL: no column {name!r} in batch "
                           f"(have {t.column_names})")
        return t.column(name)
    if kind == "mappath":
        col, key = node[1], node[2]
        col = map_col if col == "attributes" else col
        return mapattrs.map_get(t.column(col), key)
    if kind == "call":
        name, args = node[1], node[2]
        ev = [_eval(a, t, map_col) for a in args]
        if name == "ConvertCase":
            return convert_case(_as_str(ev[0]), str(ev[1]))
        if name == "Substring":
            return substring(_as_str(ev[0]), int(ev[1]), int(ev[2]))
        if name == "SHA256":
            return sha256_hex(_as_str(ev[0]))
        if name == "MD5":
            return md5_hex(_as_str(ev[0]))
        if name == "Concat":
            sep = str(ev[-1])
            parts = [_as_str(x) for x in ev[:-1]]
            return pc.binary_join_element_wise(*parts, sep)
        if name == "JSONPath":
            from .text import json_path_str

            return json_path_str(_as_str(ev[0]), str(ev[1]))
        if name == "IsMatch":
            return pc.match_substring_regex(_as_str(ev[0]), str(ev[1]))
        raise ValueError(f"OTTL: unhandled converter {name}")
    raise ValueError(f"OTTL: cannot evaluate node {node!r}")


def _as_str(v):
    if isinstance(v, (pa.Array, pa.ChunkedArray)):
        return pc.cast(v, pa.string())
    return pa.scalar(str(v), pa.string())


def _eval_bool(node, t: pa.Table, map_col: str):
    kind = node[0]
    if kind == "or":
        return pc.or_kleene(_eval_bool(node[1], t, map_col),
                            _eval_bool(node[2], t, map_col))
    if kind == "and":
        return pc.and_kleene(_eval_bool(node[1], t, map_col),
                             _eval_bool(node[2], t, map_col))
    if kind == "not":
        return pc.invert(_eval_bool(node[1], t, map_col))
    if kind == "truthy":
        return _eval(node[1], t, map_col)
    if kind == "cmp":
        op, l, r = node[1], node[2], node[3]
        lv, rv = _eval(l, t, map_col), _eval(r, t, map_col)
        fn = {"==": pc.equal, "!=": pc.not_equal, "<": pc.less,
              "<=": pc.less_equal, ">": pc.greater,
              ">=": pc.greater_equal}[op]
        return fn(lv, rv)
    raise ValueError(f"OTTL: cannot evaluate condition {node!r}")


def _apply(stmt: dict, t: pa.Table, map_col: str) -> pa.Table:
    editor, args, where = stmt["editor"], stmt["args"], stmt["where"]
    mask = None
    if where is not None:
        mask = pc.fill_null(pc.cast(_eval_bool(where, t, map_col),
                                    pa.bool_()), False)
    if editor == "set":
        target = args[0]
        new = _eval(args[1], t, map_col)
        if target[0] == "path":
            name = target[1]
            if not isinstance(new, (pa.Array, pa.ChunkedArray)):
                if new is None:
                    new = pa.nulls(t.num_rows)
                else:
                    s = pa.scalar(new)
                    new = pa.nulls(t.num_rows, s.type).fill_null(s)
            if name in t.column_names:
                old = t.column(name)
                if mask is not None:
                    new = pc.if_else(mask, pc.cast(new, old.type), old)
                return t.set_column(t.column_names.index(name), name,
                                    pc.cast(new, old.type)
                                    if mask is None else new)
            if mask is not None:
                new = pc.if_else(mask, new, pa.scalar(None, new.type))
            return t.append_column(name, new)
        if target[0] == "mappath":
            colname = map_col if target[1] == "attributes" else target[1]
            vals = _as_str(new) if not isinstance(
                new, (pa.Array, pa.ChunkedArray)) else pc.cast(
                new, pa.string())
            if mask is not None:
                old = mapattrs.map_get(t.column(colname), target[2])
                vals = pc.if_else(mask, vals, old)
            return t.set_column(
                t.column_names.index(colname), colname,
                mapattrs.map_put(t.column(colname), target[2], vals))
        raise ValueError("OTTL: set target must be a column or "
                         "attributes[\"key\"]")
    if editor == "replace_pattern":
        target = args[0]
        pattern, repl = str(args[1][1]), str(args[2][1])
        if target[0] == "path":
            name = target[1]
            old = t.column(name)
            new = pc.replace_substring_regex(old, pattern,
                                             replacement=repl)
            if mask is not None:
                new = pc.if_else(mask, new, old)
            return t.set_column(t.column_names.index(name), name, new)
        if target[0] == "mappath":
            colname = map_col if target[1] == "attributes" else target[1]
            old = mapattrs.map_get(t.column(colname), target[2])
            new = pc.replace_substring_regex(old, pattern,
                                             replacement=repl)
            if mask is not None:
                new = pc.if_else(mask, new, old)
            return t.set_column(
                t.column_names.index(colname), colname,
                mapattrs.map_put(t.column(colname), target[2], new))
        raise ValueError("OTTL: replace_pattern target must be a column "
                         "or attributes[\"key\"]")
    # structural editors: whole-column, where unsupported (loud)
    if mask is not None:
        raise ValueError(f"OTTL: {editor} is structural (whole column) "
                         "and does not support `where`")
    if args[0][0] != "path":
        raise ValueError(f"OTTL: {editor} first arg must be the map "
                         "column (e.g. attributes)")
    colname = map_col if args[0][1] == "attributes" else args[0][1]
    m = t.column(colname)
    if editor == "delete_key":
        out = mapattrs.map_delete(m, str(args[1][1]))
    elif editor == "rename_key":
        out = mapattrs.map_rename(m, str(args[1][1]), str(args[2][1]))
    else:  # keep_keys
        out = mapattrs.map_keep_keys(m, list(args[1][1]))
    return t.set_column(t.column_names.index(colname), colname, out)


def compile_statements(statements: list[str], map_col: str = "attrs"):
    """Statement strings → one ``fn(pa.Table) -> pa.Table`` applying
    them in order (the transformprocessor contract: statements run
    sequentially, later ones see earlier edits)."""
    asts = [parse_statement(s) for s in statements]

    def fn(t: pa.Table) -> pa.Table:
        for stmt in asts:
            t = _apply(stmt, t, map_col)
        return t

    return fn
