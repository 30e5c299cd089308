"""Single-statement SQL over Ray Datasets — the engine's analog of the
reference's OGR SQL SELECT evaluator (``ogr/swq_select.cpp:930-1111``
parse, ``ogr/ogr_gensql.cpp`` execution): one ``run_sql`` call executes

    SELECT <exprs & aggregates> FROM t
      [INNER|LEFT JOIN t2 ON k1 = k2]     -- single equi-key
      [WHERE <expr>] [GROUP BY <exprs>] [HAVING <expr>]
      [ORDER BY col [ASC|DESC], ...] [LIMIT n]

Ray-Data-first execution: WHERE/select evaluate VECTORIZED per batch with
the expression engine (functions/expr.py); JOIN uses ``Dataset.join`` with
cluster-sized partitions; GROUP BY pre-aggregates per batch (arrow
``TableGroupBy`` map-side combine) before the distributed groupby, so only
partial rows shuffle — the same partial/final shape as the hand-built
pipelines in pipelines/relational.py.

Aggregates: COUNT(*) COUNT(x) SUM MIN MAX AVG (sum/count partials).
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .expr import eval_expr, filter_table, project_table, _split_select, _AS_RE

_CLAUSE_RE = re.compile(
    r"^\s*SELECT\s+(?P<select>.*?)\s+FROM\s+(?P<from>[A-Za-z_][\w]*)"
    r"(?:\s+(?P<jtype>INNER|LEFT)?\s*JOIN\s+(?P<join>[A-Za-z_][\w]*)\s+ON\s+"
    r"(?P<jl>[A-Za-z_][\w]*)\s*=\s*(?P<jr>[A-Za-z_][\w]*))?"
    r"(?:\s+WHERE\s+(?P<where>.*?))?"
    r"(?:\s+GROUP\s+BY\s+(?P<group>.*?))?"
    r"(?:\s+HAVING\s+(?P<having>.*?))?"
    r"(?:\s+ORDER\s+BY\s+(?P<order>.*?))?"
    r"(?:\s+LIMIT\s+(?P<limit>\d+))?\s*;?\s*$",
    re.IGNORECASE | re.DOTALL)

_AGG_RE = re.compile(r"^(COUNT|SUM|AVG|MIN|MAX)\s*\((.*)\)$",
                     re.IGNORECASE | re.DOTALL)


def _norm(s: str) -> str:
    return re.sub(r"\s+", " ", s.strip()).upper()


def _parse_select_items(select: str, group_exprs: list[str]):
    """Split the select list into (name, kind, payload) items.
    kind: 'expr' (plain / group-key expr) | agg func name."""
    items = []
    gnorm = [_norm(g) for g in group_exprs]
    for part in _split_select(select):
        m = _AS_RE.search(part)
        if m:
            text, name = part[:m.start()].strip(), m.group(1)
        else:
            text, name = part.strip(), part.strip().strip('"')
        am = _AGG_RE.match(text)
        if am:
            fn = am.group(1).upper()
            arg = am.group(2).strip()
            items.append((name, fn, arg))
        else:
            if group_exprs and _norm(text) not in gnorm:
                raise ValueError(
                    f"non-aggregate select item {text!r} must appear in "
                    "GROUP BY")
            items.append((name, "expr", text))
    return items


def run_sql(tables, sql: str):
    """Execute one SQL SELECT over named Ray Datasets.

    ``tables``: {name: ray.data.Dataset}.  Returns a Dataset.
    """
    import ray.data  # noqa: F401  (Dataset methods only)

    m = _CLAUSE_RE.match(sql)
    if not m:
        raise ValueError(f"unsupported SQL shape: {sql!r}")
    g = m.groupdict()
    ds = tables[g["from"]]
    if g["join"]:
        from ..pipelines.relational import _join_partitions
        right = tables[g["join"]]
        jt = "left_outer" if (g["jtype"] or "").upper() == "LEFT" else "inner"
        ds = ds.join(right, join_type=jt,
                     num_partitions=_join_partitions(),
                     on=(g["jl"],), right_on=(g["jr"],))
    if g["where"]:
        where = g["where"]
        ds = ds.map_batches(lambda b: filter_table(b, where),
                            batch_format="pyarrow")

    group_exprs = ([p for p in _split_select(g["group"])] if g["group"]
                   else [])
    items = _parse_select_items(g["select"], group_exprs)
    has_agg = any(kind not in ("expr",) for _, kind, _ in items)

    if has_agg or group_exprs:
        ds = _aggregate(ds, items, group_exprs)
    else:
        select = g["select"]
        ds = ds.map_batches(lambda b: project_table(b, select),
                            batch_format="pyarrow")

    if g["having"]:
        having = g["having"]
        # rewrite aggregate calls to their select aliases (SQL requires a
        # HAVING aggregate to appear in the select list here)
        for name, fn, arg in items:
            if fn == "expr":
                continue
            pat = re.compile(fn + r"\s*\(\s*" + re.escape(arg) + r"\s*\)",
                             re.IGNORECASE)
            having = pat.sub(f'"{name}"', having)
        ds = ds.map_batches(lambda b: filter_table(b, having),
                            batch_format="pyarrow")
    if g["order"]:
        keys, desc = [], []
        for part in _split_select(g["order"]):
            toks = part.split()
            keys.append(toks[0].strip('"'))
            desc.append(len(toks) > 1 and toks[1].upper() == "DESC")
        ds = ds.sort(keys, descending=desc)
    if g["limit"]:
        ds = ds.limit(int(g["limit"]))
    return ds


def _aggregate(ds, items, group_exprs):
    """Map-side partial aggregation (arrow TableGroupBy per batch) + one
    distributed groupby over the partial rows.  AVG carries (sum, count)
    partials; a global aggregate (no GROUP BY) uses a constant key."""
    aggs = [(i, name, fn, arg) for i, (name, fn, arg) in enumerate(items)
            if fn != "expr"]
    gkeys = [f"__g{i}" for i in range(len(group_exprs))]

    def partial(b: pa.Table) -> pa.Table:
        cols, names = [], []
        for i, gexpr in enumerate(group_exprs):
            v = eval_expr(gexpr, b)
            if not isinstance(v, (pa.Array, pa.ChunkedArray)):
                v = pa.array([v] * b.num_rows)
            cols.append(v)
            names.append(f"__g{i}")
        if not group_exprs:
            cols.append(pa.array(np.zeros(b.num_rows, np.int8)))
            names.append("__g_all")
        specs = []
        for idx, _name, fn, arg in aggs:
            if fn == "COUNT" and arg == "*":
                cols.append(pa.array(np.ones(b.num_rows, np.int64)))
                names.append(f"__a{idx}")
                specs.append((f"__a{idx}", "sum", f"__a{idx}_p"))
                continue
            v = eval_expr(arg, b)
            if not isinstance(v, (pa.Array, pa.ChunkedArray)):
                v = pa.array([v] * b.num_rows)
            cols.append(v)
            names.append(f"__a{idx}")
            if fn == "COUNT":
                specs.append((f"__a{idx}", "count", f"__a{idx}_p"))
            elif fn == "SUM":
                specs.append((f"__a{idx}", "sum", f"__a{idx}_p"))
            elif fn == "MIN":
                specs.append((f"__a{idx}", "min", f"__a{idx}_p"))
            elif fn == "MAX":
                specs.append((f"__a{idx}", "max", f"__a{idx}_p"))
            else:                              # AVG -> sum + count partials
                specs.append((f"__a{idx}", "sum", f"__a{idx}_ps"))
                specs.append((f"__a{idx}", "count", f"__a{idx}_pc"))
        t = pa.table(dict(zip(names, cols)))
        keys = gkeys if group_exprs else ["__g_all"]
        gb = t.group_by(keys)
        arrow_aggs = [(c, op) for c, op, _out in specs]
        res = gb.aggregate(arrow_aggs)
        # rename arrow's "col_op" outputs to our stable partial names
        ren = {}
        for c, op, out in specs:
            ren[f"{c}_{op}"] = out
        return res.rename_columns(
            [ren.get(n, n) for n in res.column_names])

    def final(grp: pa.Table) -> pa.Table:
        out_names, out_cols = [], []
        for name, fn, arg in items:
            if fn == "expr":
                i = next(i for i, ge in enumerate(group_exprs)
                         if _norm(ge) == _norm(arg))
                out_names.append(name)
                out_cols.append(grp.column(f"__g{i}").slice(0, 1))
            elif fn == "AVG":
                idx = next(idx for idx, n2, _f, _a in aggs if n2 == name)
                s = pc.sum(grp.column(f"__a{idx}_ps")).as_py()
                c = pc.sum(grp.column(f"__a{idx}_pc")).as_py()
                out_names.append(name)
                out_cols.append(pa.array(
                    [None if not c else s / c], pa.float64()))
            else:
                idx = next(idx for idx, n2, _f, _a in aggs if n2 == name)
                col = grp.column(f"__a{idx}_p")
                if fn in ("SUM", "COUNT"):
                    v = pc.sum(col).as_py()
                    if fn == "COUNT":
                        v = int(v or 0)
                elif fn == "MIN":
                    v = pc.min(col).as_py()
                else:
                    v = pc.max(col).as_py()
                out_names.append(name)
                out_cols.append(pa.array([v], col.type if fn != "COUNT"
                                         else pa.int64()))
        return pa.table(dict(zip(out_names, out_cols)))

    keys = gkeys if group_exprs else ["__g_all"]
    return ds.map_batches(partial, batch_format="pyarrow") \
             .groupby(keys if len(keys) > 1 else keys[0]) \
             .map_groups(final, batch_format="pyarrow")
