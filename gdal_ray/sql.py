"""Parsed OGR-SQL entry point: ``execute_sql(sql, sf_dir)`` -> Dataset.

The reference's ``GDALDataset::ExecuteSQL`` OGR SQL dialect
(``ogr/swq.cpp`` expression compiler + ``ogr/ogrsf_frmts/generic/
ogr_gensql.cpp`` executor). Supported subset — the dialect's documented
core (single input layer):

  SELECT [DISTINCT] <expr [AS alias], ... | aggregates> FROM <table>
  [WHERE <expr>] [GROUP BY <cols>] [ORDER BY <col> [ASC|DESC], ...]
  [LIMIT n]

Expressions: column refs (optionally table-qualified), numeric/string
literals, + - * / % and unary -, comparisons (= != <> < <= > >=),
AND / OR / NOT, LIKE (OGR's %/_ wildcards), IN (...), BETWEEN a AND b,
IS [NOT] NULL, parentheses, CAST(x AS integer/float/character) — float->
integer TRUNCATES like swq's C cast (DuckDB rounds) — and the swq string
functions CONCAT / SUBSTR (1-based) / UPPER / LOWER / LENGTH / TRIM.
Aggregates: COUNT(*) / COUNT(x), SUM, AVG, MIN, MAX (swq_op registry,
ogr/swq_parser.y). One secondary-table [LEFT] JOIN ... ON t1.a = t2.b
(the dialect's join is a left join). Not implemented: HAVING, subqueries,
UNION (each raises with a clear message).

Compilation is Ray-Data-native: WHERE/projections become ONE vectorized
pandas ``map_batches`` (fused with the parquet read), aggregates go
through ``Dataset.groupby().aggregate()`` (distributed partial+final),
ORDER BY is ``Dataset.sort`` and LIMIT streams. Nothing materializes on
the driver.
"""

from __future__ import annotations

import os
import re

import numpy as np
import pandas as pd

__all__ = ["execute_sql", "parse", "SQLError"]

_TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


class SQLError(ValueError):
    pass


# --------------------------------------------------------------------------
# tokenizer
# --------------------------------------------------------------------------

_TOKEN_RE = re.compile(
    r"\s*(?:(?P<num>\d+\.\d*|\.\d+|\d+)"
    r"|(?P<str>'(?:[^']|'')*')"
    r"|(?P<id>[A-Za-z_][A-Za-z_0-9]*)"
    r"|(?P<op><>|<=|>=|!=|[(),.*+\-/%<>=]))"
)

_KEYWORDS = {
    "select", "distinct", "from", "where", "group", "by", "order", "limit",
    "as", "and", "or", "not", "like", "in", "between", "is", "null", "asc",
    "desc", "count", "sum", "avg", "min", "max", "having", "join", "union",
    "left", "on", "cast",
}

# OGR SQL scalar string functions (swq_op_registrar, ogr/swq_op_general.cpp)
_STR_FUNCS = {"concat", "substr", "upper", "lower", "length", "trim"}


def _tokenize(sql: str):
    out, pos = [], 0
    while pos < len(sql):
        m = _TOKEN_RE.match(sql, pos)
        if m is None:
            rest = sql[pos:].strip()
            if not rest:
                break
            raise SQLError(f"unexpected character at: {rest[:20]!r}")
        pos = m.end()
        if m.group("num") is not None:
            v = m.group("num")
            out.append(("num", float(v) if "." in v else int(v)))
        elif m.group("str") is not None:
            out.append(("str", m.group("str")[1:-1].replace("''", "'")))
        elif m.group("id") is not None:
            w = m.group("id")
            out.append(("kw", w.lower()) if w.lower() in _KEYWORDS else ("id", w.lower()))
        else:
            out.append(("op", m.group("op")))
    return out


# --------------------------------------------------------------------------
# recursive-descent parser -> expression trees (tuples)
# --------------------------------------------------------------------------

class _Parser:
    def __init__(self, tokens):
        self.t = tokens
        self.i = 0

    def peek(self, k=0):
        return self.t[self.i + k] if self.i + k < len(self.t) else ("eof", None)

    def next(self):
        tok = self.peek()
        self.i += 1
        return tok

    def expect(self, kind, val=None):
        tok = self.next()
        if tok[0] != kind or (val is not None and tok[1] != val):
            raise SQLError(f"expected {val or kind}, got {tok}")
        return tok

    def accept(self, kind, val=None):
        tok = self.peek()
        if tok[0] == kind and (val is None or tok[1] == val):
            self.i += 1
            return True
        return False

    # expression grammar: or_expr
    def expr(self):
        return self._or()

    def _or(self):
        node = self._and()
        while self.accept("kw", "or"):
            node = ("or", node, self._and())
        return node

    def _and(self):
        node = self._not()
        while self.accept("kw", "and"):
            node = ("and", node, self._not())
        return node

    def _not(self):
        if self.accept("kw", "not"):
            return ("not", self._not())
        return self._predicate()

    def _predicate(self):
        node = self._arith()
        tok = self.peek()
        if tok == ("kw", "is"):
            self.next()
            neg = self.accept("kw", "not")
            self.expect("kw", "null")
            node = ("isnull", node)
            return ("not", node) if neg else node
        neg = False
        if tok == ("kw", "not"):
            if self.peek(1)[1] in ("like", "in", "between"):
                self.next()
                neg = True
                tok = self.peek()
        if tok == ("kw", "like"):
            self.next()
            node = ("like", node, self._arith())
        elif tok == ("kw", "in"):
            self.next()
            self.expect("op", "(")
            vals = [self._arith()]
            while self.accept("op", ","):
                vals.append(self._arith())
            self.expect("op", ")")
            node = ("in", node, vals)
        elif tok == ("kw", "between"):
            self.next()
            lo = self._arith()
            self.expect("kw", "and")
            hi = self._arith()
            node = ("between", node, lo, hi)
        elif tok[0] == "op" and tok[1] in ("=", "!=", "<>", "<", "<=", ">", ">="):
            op = self.next()[1]
            node = ("cmp", "!=" if op == "<>" else op, node, self._arith())
        else:
            return node
        return ("not", node) if neg else node

    def _arith(self):
        node = self._term()
        while self.peek()[0] == "op" and self.peek()[1] in ("+", "-"):
            op = self.next()[1]
            node = ("bin", op, node, self._term())
        return node

    def _term(self):
        node = self._factor()
        while self.peek()[0] == "op" and self.peek()[1] in ("*", "/", "%"):
            op = self.next()[1]
            node = ("bin", op, node, self._factor())
        return node

    def _factor(self):
        tok = self.next()
        if tok[0] == "num":
            return ("lit", tok[1])
        if tok[0] == "str":
            return ("lit", tok[1])
        if tok == ("kw", "null"):
            return ("lit", None)
        if tok == ("op", "-"):
            return ("neg", self._factor())
        if tok == ("op", "("):
            node = self.expr()
            self.expect("op", ")")
            return node
        if tok[0] == "kw" and tok[1] in ("count", "sum", "avg", "min", "max"):
            self.expect("op", "(")
            if tok[1] == "count" and self.accept("op", "*"):
                self.expect("op", ")")
                return ("agg", "count", ("lit", 1))
            arg = self.expr()
            self.expect("op", ")")
            return ("agg", tok[1], arg)
        if tok == ("kw", "cast"):
            # CAST(expr AS type[(n)]) — swq CAST (ogr/swq_op_general.cpp)
            self.expect("op", "(")
            arg = self.expr()
            self.expect("kw", "as")
            ty = self.next()
            if ty[0] not in ("id", "kw"):
                raise SQLError(f"bad CAST type {ty}")
            if self.accept("op", "("):  # character(n) width — parsed, ignored
                self.expect("num")
                self.expect("op", ")")
            self.expect("op", ")")
            return ("cast", arg, ty[1])
        if tok[0] == "id":
            if tok[1] in _STR_FUNCS and self.peek() == ("op", "("):
                self.next()
                args = []
                if self.peek() != ("op", ")"):
                    args.append(self.expr())
                    while self.accept("op", ","):
                        args.append(self.expr())
                self.expect("op", ")")
                return ("fn", tok[1], args)
            if self.peek() == ("op", ".") and self.peek(1)[0] == "id":
                self.next()
                col = self.next()[1]
                return ("qcol", tok[1], col)
            return ("col", tok[1])
        if tok[0] == "kw" and tok[1] in ("union", "having"):
            raise SQLError(f"OGR SQL subset: {tok[1].upper()} is not supported")
        raise SQLError(f"unexpected token {tok}")


def parse(sql: str) -> dict:
    """Parse a SELECT into {select, distinct, table, where, group_by,
    order_by, limit}."""
    p = _Parser(_tokenize(sql))
    p.expect("kw", "select")
    distinct = p.accept("kw", "distinct")
    select = []
    star = False
    if p.peek() == ("op", "*") and p.peek(1) == ("kw", "from"):
        p.next()
        star = True
    else:
        while True:
            e = p.expr()
            alias = None
            if p.accept("kw", "as"):
                alias = p.expect("id")[1]
            select.append((e, alias))
            if not p.accept("op", ","):
                break
    p.expect("kw", "from")
    table = p.expect("id")[1]
    if table not in _TABLES:
        raise SQLError(f"unknown table {table!r}; expected one of {_TABLES}")
    join = None
    if p.accept("kw", "left"):
        p.expect("kw", "join")
        join = True
    elif p.accept("kw", "join"):
        join = True
    if join:
        # OGR SQL's single secondary-table join: ON t1.f1 = t2.f2
        # (the dialect's JOIN is a left join — ogr_sql.html, ogr_gensql.cpp)
        jtable = p.expect("id")[1]
        if jtable not in _TABLES:
            raise SQLError(f"unknown join table {jtable!r}")
        p.expect("kw", "on")
        lhs = p.expr()
        if lhs[0] != "cmp" or lhs[1] != "=" or lhs[2][0] != "qcol" or lhs[3][0] != "qcol":
            raise SQLError("JOIN condition must be <t1>.<col> = <t2>.<col>")
        sides = {lhs[2][1]: lhs[2][2], lhs[3][1]: lhs[3][2]}
        if set(sides) != {table, jtable}:
            raise SQLError(f"JOIN condition must reference {table} and {jtable}")
        join = {"table": jtable, "left_col": sides[table], "right_col": sides[jtable]}
    where = group_by = None
    order_by = []
    limit = None
    if p.accept("kw", "where"):
        where = p.expr()
    if p.accept("kw", "group"):
        p.expect("kw", "by")
        group_by = [p.expect("id")[1]]
        while p.accept("op", ","):
            group_by.append(p.expect("id")[1])
    if p.accept("kw", "having"):
        raise SQLError("OGR SQL subset: HAVING is not supported")
    if p.accept("kw", "order"):
        p.expect("kw", "by")
        while True:
            col = p.expect("id")[1]
            desc = False
            if p.accept("kw", "desc"):
                desc = True
            else:
                p.accept("kw", "asc")
            order_by.append((col, desc))
            if not p.accept("op", ","):
                break
    if p.accept("kw", "limit"):
        limit = int(p.expect("num")[1])
    if p.peek()[0] != "eof":
        raise SQLError(f"trailing tokens at {p.peek()}")
    return {
        "select": select, "star": star, "distinct": distinct, "table": table,
        "join": join, "where": where, "group_by": group_by,
        "order_by": order_by, "limit": limit,
    }


# --------------------------------------------------------------------------
# evaluation
# --------------------------------------------------------------------------

def _like_to_re(pattern: str) -> re.Pattern:
    out = []
    for ch in pattern:
        if ch == "%":
            out.append(".*")
        elif ch == "_":
            out.append(".")
        else:
            out.append(re.escape(ch))
    return re.compile("^" + "".join(out) + "$", re.DOTALL)


def _eval(node, df: pd.DataFrame):
    kind = node[0]
    if kind == "lit":
        return node[1]
    if kind == "col":
        if node[1] not in df.columns:
            raise SQLError(f"unknown column {node[1]!r}")
        return df[node[1]]
    if kind == "neg":
        return -_eval(node[1], df)
    if kind == "bin":
        a, b = _eval(node[2], df), _eval(node[3], df)
        op = node[1]
        if op == "+":
            return a + b
        if op == "-":
            return a - b
        if op == "*":
            return a * b
        if op == "/":
            return a / b
        return a % b
    if kind == "cmp":
        a, b = _eval(node[2], df), _eval(node[3], df)
        return {"=": lambda: a == b, "!=": lambda: a != b, "<": lambda: a < b,
                "<=": lambda: a <= b, ">": lambda: a > b, ">=": lambda: a >= b}[node[1]]()
    if kind == "and":
        return _eval(node[1], df) & _eval(node[2], df)
    if kind == "or":
        return _eval(node[1], df) | _eval(node[2], df)
    if kind == "not":
        return ~_eval(node[1], df)
    if kind == "like":
        pat = _eval(node[2], df)
        if not isinstance(pat, str):
            raise SQLError("LIKE pattern must be a string literal")
        rx = _like_to_re(pat)
        return _eval(node[1], df).astype(str).str.match(rx)
    if kind == "in":
        vals = [_eval(v, df) for v in node[2]]
        return _eval(node[1], df).isin(vals)
    if kind == "between":
        v = _eval(node[1], df)
        return (v >= _eval(node[2], df)) & (v <= _eval(node[3], df))
    if kind == "isnull":
        return _eval(node[1], df).isna()
    if kind == "cast":
        v = _eval(node[1], df)
        ty = node[2]
        if not isinstance(v, pd.Series):
            v = pd.Series(np.repeat(v, len(df)), index=df.index)
        if ty in ("integer", "int", "bigint"):
            return v.astype(np.int64)
        if ty in ("float", "double", "numeric", "real"):
            return v.astype(np.float64)
        if ty in ("character", "varchar", "string", "text"):
            return v.astype(str)
        raise SQLError(f"unsupported CAST type {ty!r}")
    if kind == "fn":
        name, args = node[1], [_eval(a, df) for a in node[2]]

        def _s(v):
            return v.astype(str) if isinstance(v, pd.Series) else str(v)

        if name == "concat":
            out = _s(args[0])
            for a in args[1:]:
                out = out + _s(a)
            return out
        if name == "upper":
            return _s(args[0]).str.upper()
        if name == "lower":
            return _s(args[0]).str.lower()
        if name == "length":
            return _s(args[0]).str.len().astype(np.int64)
        if name == "trim":
            return _s(args[0]).str.strip()
        if name == "substr":
            # OGR SUBSTR is 1-based (swq_op_general.cpp SUBSTR)
            s = _s(args[0])
            start = args[1] - 1 if not isinstance(args[1], pd.Series) else args[1] - 1
            if len(node[2]) >= 3:
                ln = args[2]
                return s.str.slice(int(start), int(start) + int(ln))
            return s.str.slice(int(start))
        raise SQLError(f"unknown function {name!r}")
    if kind == "agg":
        raise SQLError("aggregate used outside the SELECT list")
    raise SQLError(f"bad node {node!r}")


def _columns_of(node, acc: set):
    if not isinstance(node, tuple):
        return acc
    if node[0] == "col":
        acc.add(node[1])
    if node[0] == "qcol":
        acc.add(node[2])
        return acc
    for ch in node[1:]:
        if isinstance(ch, tuple):
            _columns_of(ch, acc)
        elif isinstance(ch, list):
            for c in ch:
                _columns_of(c, acc)
    return acc


def _dequalify(node, valid_tables: set):
    """Rewrite ("qcol", t, c) -> ("col", c), validating the qualifier."""
    if not isinstance(node, tuple):
        return node
    if node[0] == "qcol":
        if node[1] not in valid_tables:
            raise SQLError(f"unknown table qualifier {node[1]!r}")
        return ("col", node[2])
    out = [node[0]]
    for ch in node[1:]:
        if isinstance(ch, tuple):
            out.append(_dequalify(ch, valid_tables))
        elif isinstance(ch, list):
            out.append([_dequalify(c, valid_tables) for c in ch])
        else:
            out.append(ch)
    return tuple(out)


def _find_aggs(node, acc: list):
    if not isinstance(node, tuple):
        return acc
    if node[0] == "agg":
        acc.append(node)
        return acc
    for ch in node[1:]:
        if isinstance(ch, tuple):
            _find_aggs(ch, acc)
        elif isinstance(ch, list):
            for c in ch:
                _find_aggs(c, acc)
    return acc


def execute_sql(sql: str, sf_dir: str):
    """Run an OGR-SQL SELECT against the parquet tables under ``sf_dir``.
    Returns a ray.data.Dataset (lazy until consumed)."""
    import ray.data as rd
    from ray.data.aggregate import Count, Max, Mean, Min, Sum

    from gdal_ray.sources.corpus import read_parquet_tight as _rpt

    q = parse(sql)
    valid_tables = {q["table"]} | ({q["join"]["table"]} if q["join"] else set())
    q["select"] = [(_dequalify(e, valid_tables), a) for e, a in q["select"]]
    if q["where"] is not None:
        q["where"] = _dequalify(q["where"], valid_tables)

    ds = _rpt(os.path.join(sf_dir, f"{q['table']}.parquet"))
    avail = list(ds.schema().names)
    ds2 = avail2 = None
    if q["join"]:
        ds2 = _rpt(os.path.join(sf_dir, f"{q['join']['table']}.parquet"))
        avail2 = list(ds2.schema().names)
        avail = avail + [c for c in avail2 if c not in avail]
    if q["star"]:
        q["select"] = [(("col", c), None) for c in avail]
    # data columns (select expressions, WHERE, GROUP BY) must exist in the
    # table; ORDER BY may also name an output alias
    data_cols: set = set()
    for e, _ in q["select"]:
        _columns_of(e, data_cols)
    if q["where"] is not None:
        _columns_of(q["where"], data_cols)
    for c in q["group_by"] or []:
        data_cols.add(c)
    out_names = [
        alias or (e[1] if e[0] == "col" else f"expr_{i}")
        for i, (e, alias) in enumerate(q["select"])
    ]
    if data_cols - set(avail):
        raise SQLError(f"unknown column(s) {sorted(data_cols - set(avail))}")
    needed = set(data_cols)
    for c, _ in q["order_by"]:
        if c in set(avail):
            needed.add(c)
        elif c not in out_names:
            raise SQLError(f"unknown ORDER BY column {c!r}")
    if q["join"]:
        from gdal_ray.ops.shuffle import adaptive_partitions

        lkey, rkey = q["join"]["left_col"], q["join"]["right_col"]
        lcols = sorted(((needed | {lkey}) & set(ds.schema().names)))
        rcols = sorted(((needed | {rkey}) & set(avail2)) - set(lcols))
        if rkey not in rcols:
            rcols = sorted(set(rcols) | {rkey})
        ds = ds.select_columns(lcols).join(
            ds2.select_columns(rcols),
            join_type="left_outer",
            num_partitions=adaptive_partitions(),
            on=(lkey,),
            right_on=(rkey,),
        )
    else:
        cols = sorted(needed & set(avail))
        if cols:
            ds = ds.select_columns(cols)
    # ORDER BY columns that are real table columns but not selected ride
    # along hidden through the projection and drop after the sort
    hidden = [
        c for c, _ in q["order_by"] if c in set(avail) and c not in out_names
    ]

    aggs = []
    for e, _ in q["select"]:
        _find_aggs(e, aggs)
    is_agg = bool(aggs) or q["group_by"] is not None

    where = q["where"]
    select = q["select"]

    if not is_agg:
        def project(df: pd.DataFrame) -> pd.DataFrame:
            if where is not None:
                df = df[np.asarray(_eval(where, df), dtype=bool)]
            out = {}
            for name, (e, _) in zip(out_names, select):
                v = _eval(e, df)
                out[name] = v if isinstance(v, pd.Series) else pd.Series(
                    [v] * len(df), index=df.index
                )
            for hcol in hidden:
                out[hcol] = df[hcol]
            return pd.DataFrame(out)

        ds = ds.map_batches(project, batch_format="pandas")
        if q["distinct"]:
            from gdal_ray.ops.shuffle import bucketed_group_apply

            ds = bucketed_group_apply(
                ds, out_names, lambda p: p.drop_duplicates(out_names), 16
            )
    else:
        group_by = q["group_by"] or []
        # per-select-item plan: each aggregate lands in a staging column
        agg_specs = []  # (staging_col, kind, argexpr)
        for i, a in enumerate(aggs):
            agg_specs.append((f"__agg{i}", a[1], a[2]))

        def stage(df: pd.DataFrame) -> pd.DataFrame:
            if where is not None:
                df = df[np.asarray(_eval(where, df), dtype=bool)]
            out = {}
            for g in group_by:
                out[g] = df[g]
            for cname, kind, arg in agg_specs:
                v = _eval(arg, df)
                out[cname] = v if isinstance(v, pd.Series) else pd.Series(
                    np.full(len(df), v), index=df.index
                )
            return pd.DataFrame(out)

        staged = ds.map_batches(stage, batch_format="pandas")
        ray_aggs = []
        for cname, kind, _ in agg_specs:
            ray_aggs.append(
                {"count": Count, "sum": Sum, "avg": Mean, "min": Min, "max": Max}[kind](
                    cname, alias_name=cname + "_r"
                )
                if kind != "count"
                else Count(alias_name=cname + "_r")
            )
        agged = (
            staged.groupby(group_by or None).aggregate(*ray_aggs)
            if group_by
            else staged.aggregate(*ray_aggs)
        )
        if not group_by:
            # global aggregate returns a dict; lift back into a Dataset
            import pyarrow as pa

            row = agged
            agged = rd.from_arrow(
                pa.table({k: [v] for k, v in row.items()})
            )

        # final projection: replace each agg node with its staged result
        def finish(df: pd.DataFrame) -> pd.DataFrame:
            sub = {id(aggs[i]): df[cname + "_r"] for i, (cname, _, _) in enumerate(agg_specs)}

            def ev(node):
                if node[0] == "agg":
                    return sub[id(node)]
                if node[0] == "col":
                    return df[node[1]]
                if node[0] == "lit":
                    return node[1]
                if node[0] == "neg":
                    return -ev(node[1])
                if node[0] == "bin":
                    a, b = ev(node[2]), ev(node[3])
                    if node[1] == "+":
                        return a + b
                    if node[1] == "-":
                        return a - b
                    if node[1] == "*":
                        return a * b
                    if node[1] == "/":
                        return a / b
                    return a % b
                raise SQLError("unsupported expression over aggregates")

            out = {}
            for name, (e, _) in zip(out_names, select):
                v = ev(e)
                out[name] = v if isinstance(v, pd.Series) else pd.Series(
                    np.full(len(df), v)
                )
            return pd.DataFrame(out)

        ds = agged.map_batches(finish, batch_format="pandas")

    if q["order_by"]:
        ds = ds.sort([c for c, _ in q["order_by"]],
                     descending=[d for _, d in q["order_by"]])
    if hidden and not is_agg:
        ds = ds.select_columns(out_names)
    if q["limit"] is not None:
        ds = ds.limit(q["limit"])
    return ds
