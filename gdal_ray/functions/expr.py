"""SQL expression engine over Arrow compute — the engine's analog of the
reference's OGR SQL evaluator (``ogr/swq_op_registrar.cpp:28-62`` operator
table, ``ogr/swq_op_general.cpp`` semantics): a user passes
``-where "pop > 1000 AND name LIKE 'A%'"`` to a pipeline and the engine
evaluates it VECTORIZED per batch with pyarrow.compute kernels — never a
Python loop over rows.

Grammar (Pratt parser, precedence low→high):

    expr     := or
    or       := and (OR and)*
    and      := not (AND not)*
    not      := NOT not | cmp
    cmp      := add ((= | <> | != | < | <= | > | >=) add
                 | [NOT] LIKE add | [NOT] IN (list) | IS [NOT] NULL
                 | [NOT] BETWEEN add AND add)?
    add      := mul ((+ | -) mul)*
    mul      := unary ((* | / | %) unary)*
    unary    := - unary | primary
    primary  := NUMBER | 'string' | TRUE | FALSE | NULL | ident
               | ident(args) | CAST(expr AS type) | (expr)

Functions: UPPER LOWER LENGTH SUBSTR(s,start[,len]) TRIM CONCAT ABS ROUND
FLOOR CEIL COALESCE.  SUBSTR is 1-based (swq_op_general.cpp SUBSTR).
LIKE implements SQL %/_ wildcards (pc.match_like).
AND/OR use Kleene three-valued logic; a NULL WHERE result filters the row
out (SQL semantics).
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

# ---------- tokenizer ----------

_TOKEN_RE = re.compile(r"""
    \s*(?:
      (?P<number>\d+\.\d*(?:[eE][+-]?\d+)?|\.\d+(?:[eE][+-]?\d+)?|\d+(?:[eE][+-]?\d+)?)
    | (?P<string>'(?:[^']|'')*')
    | (?P<qident>"(?:[^"]|"")*")
    | (?P<ident>[A-Za-z_][A-Za-z_0-9]*)
    | (?P<op><>|<=|>=|!=|[=<>(),+\-*/%])
    )""", re.VERBOSE)

_KEYWORDS = {"AND", "OR", "NOT", "LIKE", "IN", "IS", "NULL", "BETWEEN",
             "TRUE", "FALSE", "CAST", "AS"}


def _tokenize(text: str) -> list[tuple[str, object]]:
    toks, pos = [], 0
    while pos < len(text):
        m = _TOKEN_RE.match(text, pos)
        if not m or m.end() == pos:
            if text[pos:].strip():
                raise ValueError(f"cannot tokenize expression at: {text[pos:]!r}")
            break
        pos = m.end()
        if m.group("number") is not None:
            s = m.group("number")
            toks.append(("num", float(s) if ("." in s or "e" in s.lower()) else int(s)))
        elif m.group("string") is not None:
            toks.append(("str", m.group("string")[1:-1].replace("''", "'")))
        elif m.group("qident") is not None:
            toks.append(("ident", m.group("qident")[1:-1].replace('""', '"')))
        elif m.group("ident") is not None:
            s = m.group("ident")
            if s.upper() in _KEYWORDS:
                toks.append(("kw", s.upper()))
            else:
                toks.append(("ident", s))
        else:
            toks.append(("op", m.group("op")))
    toks.append(("end", None))
    return toks


# ---------- parser (AST = nested tuples) ----------

class _Parser:
    def __init__(self, text: str):
        self.toks = _tokenize(text)
        self.i = 0

    def peek(self):
        return self.toks[self.i]

    def next(self):
        t = self.toks[self.i]
        self.i += 1
        return t

    def expect(self, kind, val=None):
        k, v = self.next()
        if k != kind or (val is not None and v != val):
            raise ValueError(f"expected {val or kind}, got {v!r}")
        return v

    def accept(self, kind, val) -> bool:
        k, v = self.peek()
        if k == kind and v == val:
            self.i += 1
            return True
        return False

    def parse(self):
        node = self.p_or()
        if self.peek()[0] != "end":
            raise ValueError(f"trailing tokens: {self.toks[self.i:]}")
        return node

    def p_or(self):
        node = self.p_and()
        while self.accept("kw", "OR"):
            node = ("or", node, self.p_and())
        return node

    def p_and(self):
        node = self.p_not()
        while self.accept("kw", "AND"):
            node = ("and", node, self.p_not())
        return node

    def p_not(self):
        if self.accept("kw", "NOT"):
            return ("not", self.p_not())
        return self.p_cmp()

    def p_cmp(self):
        node = self.p_add()
        k, v = self.peek()
        neg = False
        if k == "kw" and v == "NOT":
            nk, nv = self.toks[self.i + 1]
            if nk == "kw" and nv in ("LIKE", "IN", "BETWEEN"):
                self.i += 1
                neg = True
                k, v = self.peek()
        if k == "op" and v in ("=", "<>", "!=", "<", "<=", ">", ">="):
            self.i += 1
            node = ({"=": "eq", "<>": "ne", "!=": "ne", "<": "lt", "<=": "le",
                     ">": "gt", ">=": "ge"}[v], node, self.p_add())
        elif k == "kw" and v == "LIKE":
            self.i += 1
            node = ("like", node, self.p_add())
        elif k == "kw" and v == "IN":
            self.i += 1
            self.expect("op", "(")
            items = [self.p_or()]
            while self.accept("op", ","):
                items.append(self.p_or())
            self.expect("op", ")")
            node = ("in", node, items)
        elif k == "kw" and v == "IS":
            self.i += 1
            isnot = self.accept("kw", "NOT")
            self.expect("kw", "NULL")
            node = ("isnull", node)
            if isnot:
                node = ("not", node)
            return node
        elif k == "kw" and v == "BETWEEN":
            self.i += 1
            lo = self.p_add()
            self.expect("kw", "AND")
            hi = self.p_add()
            node = ("and", ("ge", node, lo), ("le", node, hi))
        else:
            return node
        return ("not", node) if neg else node

    def p_add(self):
        node = self.p_mul()
        while True:
            k, v = self.peek()
            if k == "op" and v in ("+", "-"):
                self.i += 1
                node = ({"+": "add", "-": "sub"}[v], node, self.p_mul())
            else:
                return node

    def p_mul(self):
        node = self.p_unary()
        while True:
            k, v = self.peek()
            if k == "op" and v in ("*", "/", "%"):
                self.i += 1
                node = ({"*": "mul", "/": "div", "%": "mod"}[v], node, self.p_unary())
            else:
                return node

    def p_unary(self):
        if self.accept("op", "-"):
            return ("neg", self.p_unary())
        return self.p_primary()

    def p_primary(self):
        k, v = self.next()
        if k == "num" or k == "str":
            return ("lit", v)
        if k == "kw":
            if v == "NULL":
                return ("lit", None)
            if v == "TRUE":
                return ("lit", True)
            if v == "FALSE":
                return ("lit", False)
            if v == "CAST":
                self.expect("op", "(")
                inner = self.p_or()
                self.expect("kw", "AS")
                typ = self.expect("ident").upper()
                self.expect("op", ")")
                return ("cast", inner, typ)
            raise ValueError(f"unexpected keyword {v}")
        if k == "ident":
            if self.accept("op", "("):
                args = []
                if not self.accept("op", ")"):
                    args.append(self.p_or())
                    while self.accept("op", ","):
                        args.append(self.p_or())
                    self.expect("op", ")")
                return ("call", v.upper(), args)
            return ("col", v)
        if k == "op" and v == "(":
            node = self.p_or()
            self.expect("op", ")")
            return node
        raise ValueError(f"unexpected token {v!r}")


def parse_expr(text: str):
    return _Parser(text).parse()


# ---------- evaluator ----------

def _is_arr(x) -> bool:
    return isinstance(x, (pa.Array, pa.ChunkedArray))


def _mod(a, b):
    # pyarrow.compute has no modulo kernel — numpy fallback.  SQL % takes
    # the DIVIDEND's sign (C semantics, like DuckDB/swq): np.fmod, not
    # np.mod (python-style divisor sign differs for negative inputs).
    if _is_arr(a) or _is_arr(b):
        av = np.asarray(a.combine_chunks() if isinstance(a, pa.ChunkedArray) else a) \
            if _is_arr(a) else a
        bv = np.asarray(b.combine_chunks() if isinstance(b, pa.ChunkedArray) else b) \
            if _is_arr(b) else b
        return pa.array(np.fmod(av, bv))
    import math
    return (math.fmod(a, b) if isinstance(a, float) or isinstance(b, float)
            else int(math.fmod(a, b)))


_CAST_TYPES = {"INTEGER": pa.int64(), "BIGINT": pa.int64(), "INT": pa.int64(),
               "DOUBLE": pa.float64(), "FLOAT": pa.float64(),
               "VARCHAR": pa.string(), "TEXT": pa.string(),
               "CHARACTER": pa.string(), "BOOLEAN": pa.bool_()}


def _call(name: str, args: list):
    A = args
    if name == "UPPER":
        return pc.utf8_upper(A[0])
    if name == "LOWER":
        return pc.utf8_lower(A[0])
    if name in ("LENGTH", "CHAR_LENGTH"):
        return pc.utf8_length(A[0])
    if name == "TRIM":
        return pc.utf8_trim_whitespace(A[0])
    if name in ("SUBSTR", "SUBSTRING"):
        # swq SUBSTR: 1-based start, optional length
        start = (A[1] if not _is_arr(A[1]) else None)
        if start is None:
            raise ValueError("SUBSTR start must be a literal")
        start = int(start) - 1
        if len(A) > 2:
            return pc.utf8_slice_codeunits(A[0], start, start + int(A[2]))
        return pc.utf8_slice_codeunits(A[0], start)
    if name == "CONCAT":
        parts = [a if _is_arr(a) else pa.scalar(str(a)) for a in A]
        return pc.binary_join_element_wise(*parts, "")
    if name == "ABS":
        return pc.abs(A[0])
    if name == "ROUND":
        nd = int(A[1]) if len(A) > 1 else 0
        return pc.round(A[0], ndigits=nd, round_mode="half_towards_infinity")
    if name == "FLOOR":
        return pc.floor(A[0])
    if name == "CEIL":
        return pc.ceil(A[0])
    if name == "COALESCE":
        out = A[0]
        for nxt in A[1:]:
            if not _is_arr(out):
                return out if out is not None else nxt
            out = pc.if_else(pc.is_valid(out), out,
                             nxt if _is_arr(nxt) else pa.scalar(nxt))
        return out
    raise ValueError(f"unknown function {name}")


def eval_expr(node, table: pa.Table):
    """Evaluate an AST (or expression string) against a pyarrow Table.
    Returns a pa.ChunkedArray/Array (vectorized) or a python scalar."""
    if isinstance(node, str):
        node = parse_expr(node)
    op = node[0]
    if op == "lit":
        return node[1]
    if op == "col":
        name = node[1]
        if name not in table.column_names:
            raise KeyError(f"unknown column {name!r}; have {table.column_names}")
        return table.column(name)
    if op == "call":
        return _call(node[1], [eval_expr(a, table) for a in node[2]])
    if op == "cast":
        v = eval_expr(node[1], table)
        typ = _CAST_TYPES.get(node[2])
        if typ is None:
            raise ValueError(f"unsupported CAST type {node[2]}")
        if not _is_arr(v):
            return pa.scalar(v).cast(typ).as_py()
        if pa.types.is_integer(typ) and pa.types.is_floating(v.type):
            # SQL CAST(double AS INT) rounds (half-even, like DuckDB);
            # Arrow's raw cast refuses non-integral floats
            v = pc.round(v, round_mode="half_to_even")
        return pc.cast(v, typ)
    if op == "not":
        v = eval_expr(node[1], table)
        return pc.invert(v) if _is_arr(v) else (None if v is None else not v)
    if op == "neg":
        v = eval_expr(node[1], table)
        return pc.negate(v) if _is_arr(v) else -v
    if op == "isnull":
        v = eval_expr(node[1], table)
        return pc.is_null(v) if _is_arr(v) else (v is None)
    if op == "in":
        v = eval_expr(node[1], table)
        vals = [eval_expr(a, table) for a in node[2]]
        if any(_is_arr(x) for x in vals):
            raise ValueError("IN list items must be literals")
        return pc.is_in(v, value_set=pa.array(vals))
    if op == "like":
        v = eval_expr(node[1], table)
        pat = eval_expr(node[2], table)
        if _is_arr(pat):
            raise ValueError("LIKE pattern must be a literal")
        return pc.match_like(v, pat)

    a = eval_expr(node[1], table)
    b = eval_expr(node[2], table)
    both_scalar = not (_is_arr(a) or _is_arr(b))
    if op in ("and", "or"):
        if both_scalar:
            return (a and b) if op == "and" else (a or b)
        fa = a if _is_arr(a) else pa.scalar(a, pa.bool_())
        fb = b if _is_arr(b) else pa.scalar(b, pa.bool_())
        return pc.and_kleene(fa, fb) if op == "and" else pc.or_kleene(fa, fb)
    if both_scalar:
        import operator as _o
        return {"eq": _o.eq, "ne": _o.ne, "lt": _o.lt, "le": _o.le,
                "gt": _o.gt, "ge": _o.ge, "add": _o.add, "sub": _o.sub,
                "mul": _o.mul, "div": _o.truediv, "mod": _o.mod}[op](a, b)
    kern = {"eq": pc.equal, "ne": pc.not_equal, "lt": pc.less,
            "le": pc.less_equal, "gt": pc.greater, "ge": pc.greater_equal,
            "add": pc.add, "sub": pc.subtract, "mul": pc.multiply,
            "div": pc.divide, "mod": _mod}[op]
    return kern(a, b)


# ---------- table-level helpers ----------

def filter_table(table: pa.Table, where) -> pa.Table:
    """SQL WHERE over a batch: NULL results drop the row (SQL semantics)."""
    mask = eval_expr(where, table)
    if not _is_arr(mask):
        return table if mask else table.slice(0, 0)
    mask = pc.fill_null(pc.cast(mask, pa.bool_()), False)
    return table.filter(mask)


_AS_RE = re.compile(r"\s+AS\s+([A-Za-z_][A-Za-z_0-9]*)\s*$", re.IGNORECASE)


def _split_select(select: str) -> list[str]:
    """Split a select list on top-level commas (respecting parens/quotes)."""
    parts, depth, cur, i = [], 0, [], 0
    while i < len(select):
        c = select[i]
        if c == "'":
            j = i + 1
            while j < len(select):
                if select[j] == "'" and select[j:j + 2] != "''":
                    break
                j += 2 if select[j] == "'" else 1
            cur.append(select[i:j + 1])
            i = j + 1
            continue
        if c == "(":
            depth += 1
        elif c == ")":
            depth -= 1
        elif c == "," and depth == 0:
            parts.append("".join(cur).strip())
            cur = []
            i += 1
            continue
        cur.append(c)
        i += 1
    if "".join(cur).strip():
        parts.append("".join(cur).strip())
    return parts


def project_table(table: pa.Table, select: str) -> pa.Table:
    """SQL select list over a batch: ``"a, b*2 AS b2, UPPER(name) AS nm"``.
    ``*`` keeps all existing columns."""
    cols, names = [], []
    for part in _split_select(select):
        if part == "*":
            for c in table.column_names:
                names.append(c)
                cols.append(table.column(c))
            continue
        m = _AS_RE.search(part)
        if m:
            expr_text, name = part[:m.start()], m.group(1)
        else:
            expr_text, name = part, part.strip().strip('"')
        v = eval_expr(expr_text, table)
        if not _is_arr(v):
            v = pa.array([v] * table.num_rows)
        names.append(name)
        cols.append(v)
    return pa.table(dict(zip(names, cols)))
