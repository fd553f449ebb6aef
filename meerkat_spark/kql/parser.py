"""KQL pipeline parser → AST.

Grammar (the KQL subset committed to by the reference, README.md:34;
operator semantics per SURVEY.md §2.2):

    query     := let_stmt* pipeline
    let_stmt  := 'let' IDENT '=' (expr | pipeline) ';'
    pipeline  := source ('|' op)*
    source    := IDENT | 'range' IDENT 'from' expr 'to' expr 'step' expr
               | 'print' name_exprs
    op        := where | project | extend | project-away | project-rename
               | project-keep | summarize | count | distinct | sort | top
               | take | limit | join | union | mv-expand | parse | search
               | getschema | sample | serialize | range | print

Expressions: standard precedence climbing; comparison layer includes the
KQL string predicates (has / contains / startswith / in / between /
matches regex).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any

from meerkat_spark.kql.lexer import KqlSyntaxError, Token, tokenize


# ------------------------------------------------------------------ AST
@dataclass
class Lit:
    value: Any  # float | str | bool | None


@dataclass
class Timespan:
    seconds: float


@dataclass
class DateTimeLit:
    text: str  # raw content of datetime(...)


@dataclass
class DynamicLit:
    items: list  # element AST nodes of dynamic([...])


@dataclass
class Ident:
    name: str


@dataclass
class Member:
    base: Any
    name: str  # dynamic access d.x


@dataclass
class Index:
    base: Any
    index: Any  # d[0]


@dataclass
class Call:
    func: str
    args: list[Any]


@dataclass
class Unary:
    op: str
    operand: Any


@dataclass
class Binary:
    op: str
    left: Any
    right: Any


@dataclass
class InList:
    expr: Any
    values: list[Any]
    negated: bool = False
    case_insensitive: bool = False


@dataclass
class Between:
    expr: Any
    low: Any
    high: Any


# pipeline ops
@dataclass
class OpNode:
    name: str
    args: dict[str, Any] = field(default_factory=dict)


@dataclass
class Pipeline:
    source: OpNode
    ops: list[OpNode]


@dataclass
class Lambda:
    params: list[str]
    body: Any  # expr, or a Pipeline for tabular lambdas
    tabular: list[str] = field(default_factory=list)  # params typed (*)
    defaults: dict[str, Any] = field(default_factory=dict)  # p -> expr


@dataclass
class Query:
    lets: dict[str, Any]
    pipeline: Pipeline


# ------------------------------------------------------------------ parser
class Parser:
    def __init__(self, text: str):
        self.text = text
        self.tokens = tokenize(text)
        self.i = 0

    # -- token helpers
    def peek(self) -> Token:
        return self.tokens[self.i]

    def next(self) -> Token:
        t = self.tokens[self.i]
        self.i += 1
        return t

    def at(self, kind: str, value=None) -> bool:
        t = self.peek()
        return t.kind == kind and (value is None or t.value == value)

    def at_ident(self, *names: str) -> bool:
        t = self.peek()
        return t.kind == "IDENT" and str(t.value).lower() in names

    def expect(self, kind: str, value=None) -> Token:
        if not self.at(kind, value):
            raise KqlSyntaxError(
                f"expected {value or kind}, got {self.peek()!r} at {self.peek().pos}"
            )
        return self.next()

    def expect_ident(self, *names: str) -> str:
        if not self.at_ident(*names):
            raise KqlSyntaxError(f"expected {names}, got {self.peek()!r}")
        return str(self.next().value).lower()

    # -- entry
    def parse(self) -> Query:
        lets: dict[str, Any] = {}
        while self.at_ident("let") or self.at_ident("set"):
            if self.at_ident("set"):
                # `set option[=value];` query-option statements (Kusto
                # request properties — notruncation, query_timeout, …):
                # service knobs with no Spark realization, so they
                # parse-and-ignore like the join/partition hints (r14)
                self.next()
                self.expect("IDENT")
                if self.at("OP", "="):
                    self.next()
                    # the value may be a multi-token expression (Kusto's
                    # documented `set query_timeout = time(5m);` form) —
                    # skip everything up to the terminating ';'
                    # (ADVICE r14)
                    while not self.at("PUNCT", ";") and not self.at("EOF"):
                        self.next()
                self.expect("PUNCT", ";")
                continue
            self.next()
            name = str(self.expect("IDENT").value)
            self.expect("OP", "=")
            lets[name] = self.parse_let_value()
            self.expect("PUNCT", ";")
        pipe = self.parse_pipeline()
        self.expect("EOF")
        return Query(lets, pipe)

    def parse_let_value(self):
        # materialize(pipeline): cache the bound subquery's result
        if self.at_ident("materialize"):
            save = self.i
            self.next()
            if self.at("PUNCT", "("):
                self.next()
                pipe = self.parse_pipeline()
                self.expect("PUNCT", ")")
                return OpNode("materialize", {"pipeline": pipe})
            self.i = save
        # view () { pipeline } — a named parameter-less subquery; the
        # `view` keyword only affects wildcard-union visibility in
        # Kusto, so it binds like a plain pipeline let
        if self.at_ident("view"):
            save = self.i
            self.next()
            if self.at("PUNCT", "("):
                self.next()
                self.expect("PUNCT", ")")
                self.expect("PUNCT", "{")
                pipe = self.parse_pipeline()
                self.expect("PUNCT", "}")
                return pipe
            self.i = save
        # lambda: (param[: type], …) { expr }
        if self.at("PUNCT", "("):
            save = self.i
            try:
                return self._parse_lambda()
            except KqlSyntaxError:
                self.i = save
        # datatable(...) / externaldata(...) literal-table sources bind
        # as pipelines (with optional piped ops), not scalar exprs
        if self.at_ident("datatable") or self.at_ident("externaldata"):
            return self.parse_pipeline()
        # table pipeline if it starts with IDENT followed by '|' or ';'
        save = self.i
        if self.at("IDENT"):
            self.next()
            if self.at("PUNCT", "|") or self.at("PUNCT", ";"):
                self.i = save
                return self.parse_pipeline()
            self.i = save
        return self.parse_expr()

    def _parse_lambda(self) -> Lambda:
        self.expect("PUNCT", "(")
        params = []
        tabular: list[str] = []
        defaults: dict[str, Any] = {}
        while not self.at("PUNCT", ")"):
            p = str(self.expect("IDENT").value)
            params.append(p)
            if self.at("PUNCT", ":"):  # optional type annotation
                self.next()
                if self.at("PUNCT", "("):
                    # tabular parameter `T:(*)` (Kusto invoke functions)
                    self.next()
                    self.expect("OP", "*")
                    self.expect("PUNCT", ")")
                    tabular.append(p)
                else:
                    self.expect("IDENT")
            if self.at("OP", "="):
                # Kusto default value — `(x:long, y:long = 10)`; a
                # call may omit trailing defaulted args (r14)
                self.next()
                defaults[p] = self.parse_expr()
            if self.at("PUNCT", ","):
                self.next()
        self.expect("PUNCT", ")")
        if not self.at("PUNCT", "{"):
            raise KqlSyntaxError("not a lambda")
        self.expect("PUNCT", "{")
        # tabular lambdas have PIPELINE bodies (source references the
        # tabular param); scalar lambdas have expression bodies
        body = self.parse_pipeline() if tabular else self.parse_expr()
        self.expect("PUNCT", "}")
        return Lambda(params, body, tabular, defaults)

    def parse_pipeline(self) -> Pipeline:
        source = self.parse_source()
        ops = []
        while self.at("PUNCT", "|"):
            self.next()
            ops.append(self.parse_op())
        return Pipeline(source, ops)

    def parse_source(self) -> OpNode:
        if self.at_ident("range"):
            self.next()
            var = str(self.expect("IDENT").value)
            self.expect_ident("from")
            lo = self.parse_expr()
            self.expect_ident("to")
            hi = self.parse_expr()
            self.expect_ident("step")
            step = self.parse_expr()
            return OpNode("range", {"var": var, "from": lo, "to": hi, "step": step})
        if self.at_ident("print"):
            self.next()
            return OpNode("print", {"cols": self.parse_named_exprs()})
        if self.at_ident("externaldata"):
            # externaldata (col:type, …) ['uri', …]
            #   [with (format='csv', ignoreFirstRecord=true, …)]
            self.next()
            self.expect("PUNCT", "(")
            schema = []
            while not self.at("PUNCT", ")"):
                cname = str(self.expect("IDENT").value)
                self.expect("PUNCT", ":")
                ctype = str(self.expect("IDENT").value).lower()
                schema.append((cname, ctype))
                if self.at("PUNCT", ","):
                    self.next()
            self.expect("PUNCT", ")")
            self.expect("PUNCT", "[")
            paths = [str(self.expect("STRING").value)]
            while self.at("PUNCT", ","):
                self.next()
                paths.append(str(self.expect("STRING").value))
            self.expect("PUNCT", "]")
            props: dict[str, Any] = {}
            if self.at_ident("with"):
                self.next()
                self.expect("PUNCT", "(")
                while not self.at("PUNCT", ")"):
                    k = str(self.expect("IDENT").value).lower()
                    self.expect("OP", "=")
                    tv = self.peek()
                    if tv.kind in ("STRING", "IDENT", "NUMBER"):
                        props[k] = str(self.next().value)
                    else:
                        raise KqlSyntaxError(
                            f"externaldata option {k!r} needs a literal value"
                        )
                    if self.at("PUNCT", ","):
                        self.next()
                self.expect("PUNCT", ")")
            if not schema:
                raise KqlSyntaxError("externaldata needs a schema")
            return OpNode(
                "externaldata",
                {"schema": schema, "paths": paths, "props": props},
            )
        if self.at_ident("datatable"):
            # datatable(col: type, …) [ v1, v2, … ] — literal inline table
            self.next()
            self.expect("PUNCT", "(")
            schema = []
            while not self.at("PUNCT", ")"):
                cname = str(self.expect("IDENT").value)
                self.expect("PUNCT", ":")
                ctype = str(self.expect("IDENT").value).lower()
                schema.append((cname, ctype))
                if self.at("PUNCT", ","):
                    self.next()
            self.expect("PUNCT", ")")
            self.expect("PUNCT", "[")
            values = []
            while not self.at("PUNCT", "]"):
                values.append(self.parse_expr())
                if self.at("PUNCT", ","):
                    self.next()
            self.expect("PUNCT", "]")
            if not schema or len(values) % len(schema) != 0:
                raise KqlSyntaxError(
                    "datatable value count must be a multiple of the column count"
                )
            return OpNode("datatable", {"schema": schema, "values": values})
        if self.at_ident("union"):
            # union [kind=...] T1, T2, (pipeline) …  as a pipeline SOURCE
            self.next()
            return self.op_union()
        if self.at_ident("find"):
            # find in (T1, T2) 'term'  |  find in (T1, T2) where <pred>
            self.next()
            self.expect_ident("in")
            self.expect("PUNCT", "(")
            tables = [str(self.expect("IDENT").value)]
            while self.at("PUNCT", ","):
                self.next()
                tables.append(str(self.expect("IDENT").value))
            self.expect("PUNCT", ")")
            if self.at_ident("where"):
                self.next()
                args = {"tables": tables, "pred": self.parse_expr(), "term": None}
            else:
                term = str(self.expect("STRING").value)
                args = {"tables": tables, "pred": None, "term": term}
            # optional Kusto output clause: project col1, col2, …
            args["project"] = None
            if self.at_ident("project"):
                self.next()
                cols = [str(self.expect("IDENT").value)]
                while self.at("PUNCT", ","):
                    self.next()
                    cols.append(str(self.expect("IDENT").value))
                args["project"] = cols
            return OpNode("find", args)
        name = str(self.expect("IDENT").value)
        # Kusto cross-cluster qualifiers: cluster('c').database('d').T —
        # a single-catalog engine resolves the TABLE and parses the
        # qualifiers through (the standard migration shim: qualified
        # queries run unmodified against the local catalog)
        while name in ("cluster", "database") and self.at("PUNCT", "("):
            self.next()
            self.expect("STRING")
            self.expect("PUNCT", ")")
            self.expect("PUNCT", ".")
            name = str(self.expect("IDENT").value)
        if name == "table" and self.at("PUNCT", "("):
            # Kusto table('name') reference — resolves like a bare
            # table identifier (r14)
            self.next()
            name = str(self.expect("STRING").value)
            self.expect("PUNCT", ")")
        return OpNode("table", {"name": name})

    # -- operators
    def parse_op(self) -> OpNode:
        t = self.peek()
        if t.kind != "IDENT":
            raise KqlSyntaxError(f"expected operator, got {t!r}")
        name = str(t.value).lower()
        self.next()
        method = getattr(self, f"op_{name.replace('-', '_')}", None)
        if method is None:
            raise KqlSyntaxError(f"unsupported operator {name!r}")
        return method()

    def op_where(self) -> OpNode:
        return OpNode("where", {"pred": self.parse_expr()})

    op_filter = op_where

    def _maybe_bracket_name(self) -> str | None:
        """Kusto's quoted-identifier form ['col name'] in a NAME
        position (r15); returns the name or None (position restored)."""
        if self.at("PUNCT", "["):
            save = self.i
            self.next()
            if self.at("STRING"):
                n = str(self.next().value)
                if self.at("PUNCT", "]"):
                    self.next()
                    return n
            self.i = save
        return None

    def parse_named_exprs(self) -> list[tuple[str | None, Any]]:
        """name = expr, ... (name optional; ['quoted name'] allowed)."""
        cols = []
        while True:
            save = self.i
            name = None
            bn = self._maybe_bracket_name()
            if bn is not None:
                if self.at("OP", "="):
                    self.next()
                    name = bn
                else:
                    self.i = save
            elif self.at("IDENT"):
                n = str(self.next().value)
                if self.at("OP", "="):
                    self.next()
                    name = n
                else:
                    self.i = save
            cols.append((name, self.parse_expr()))
            if self.at("PUNCT", ","):
                self.next()
                continue
            break
        return cols

    def op_project(self) -> OpNode:
        return OpNode("project", {"cols": self.parse_named_exprs()})

    def op_extend(self) -> OpNode:
        # multi-assign form: extend (a, b, ...) = struct_returning_fn(…)
        if self.at("PUNCT", "("):
            save = self.i
            try:
                self.next()
                names = [str(self.expect("IDENT").value)]
                while self.at("PUNCT", ","):
                    self.next()
                    names.append(str(self.expect("IDENT").value))
                self.expect("PUNCT", ")")
                self.expect("OP", "=")
            except KqlSyntaxError:
                self.i = save
            else:
                e = self.parse_expr()
                rest = []
                if self.at("PUNCT", ","):
                    self.next()
                    rest = self.parse_named_exprs()
                return OpNode("extend", {"cols": rest, "multi": (names, e)})
        return OpNode("extend", {"cols": self.parse_named_exprs()})

    def op_invoke(self) -> OpNode:
        """`T | invoke f(args…)` — apply a let-bound tabular lambda
        (first (*) parameter binds the piped table)."""
        fname = str(self.expect("IDENT").value)
        self.expect("PUNCT", "(")
        args = []
        while not self.at("PUNCT", ")"):
            args.append(self.parse_expr())
            if self.at("PUNCT", ","):
                self.next()
        self.expect("PUNCT", ")")
        return OpNode("invoke", {"func": fname, "args": args})

    def op_project_away(self) -> OpNode:
        return OpNode("project-away", {"patterns": self.parse_name_list()})

    def op_project_keep(self) -> OpNode:
        return OpNode("project-keep", {"patterns": self.parse_name_list()})

    def parse_name_list(self) -> list[str]:
        names = []
        while True:
            tok = self.peek()
            if tok.kind == "IDENT":
                pat = str(self.next().value)
            elif tok.kind == "OP" and tok.value == "*":
                self.next()
                pat = "*"
            else:
                raise KqlSyntaxError(f"expected column name, got {tok!r}")
            # Kusto column patterns allow `*` ANYWHERE (name*, *_id,
            # a*b — r15): keep absorbing ident/`*` tokens while they
            # are CHARACTER-ADJACENT to the pattern so far (a space
            # separates two list items, not one pattern)
            end = tok.pos + len(pat)
            while True:
                nxt = self.peek()
                if nxt.kind == "IDENT" and nxt.pos == end:
                    self.next()
                    pat += str(nxt.value)
                    end += len(str(nxt.value))
                elif nxt.kind == "OP" and nxt.value == "*" and nxt.pos == end:
                    self.next()
                    pat += "*"
                    end += 1
                else:
                    break
            names.append(pat)
            if self.at("PUNCT", ","):
                self.next()
                continue
            break
        return names

    def op_project_reorder(self) -> OpNode:
        return OpNode("project-reorder", {"first": self.parse_name_list()})

    def op_parse_where(self) -> OpNode:
        node = self.op_parse()
        return OpNode("parse-where", node.args)

    def _parse_json_literal(self) -> Any:
        """Literal JSON value inside a dynamic({...}) bag: string,
        number (negatives included), true/false/null, or a nested
        bag/array of the same (recursive)."""
        if self.at("PUNCT", "{"):
            self.next()
            bag: dict[str, Any] = {}
            while not self.at("PUNCT", "}"):
                kt = self.expect("STRING")
                self.expect("PUNCT", ":")
                bag[str(kt.value)] = self._parse_json_literal()
                if self.at("PUNCT", ","):
                    self.next()
            self.expect("PUNCT", "}")
            return bag
        if self.at("PUNCT", "["):
            self.next()
            arr: list[Any] = []
            while not self.at("PUNCT", "]"):
                arr.append(self._parse_json_literal())
                if self.at("PUNCT", ","):
                    self.next()
            self.expect("PUNCT", "]")
            return arr
        t = self.peek()
        if t.kind in ("STRING", "NUMBER"):
            self.next()
            return t.value
        if t.kind == "OP" and t.value == "-":
            self.next()
            return -self.expect("NUMBER").value
        if t.kind == "IDENT" and str(t.value) in ("true", "false", "null"):
            self.next()
            return {"true": True, "false": False, "null": None}[str(t.value)]
        raise KqlSyntaxError("dynamic bag values must be literals")

    def op_parse_kv(self) -> OpNode:
        """`parse-kv Expr as (key1:type, key2:type, …) with
        (pair_delimiter='…', kv_delimiter='…')` — extract declared keys
        as typed columns. Regex mode: `with (regex=@'(key)(value)')`,
        a pattern with exactly two capture groups (group 1 = key name,
        group 2 = value; first occurrence wins, per Kusto)."""
        expr = self.parse_expr()
        self.expect_ident("as")
        self.expect("PUNCT", "(")
        keys = []
        while not self.at("PUNCT", ")"):
            kname = str(self.expect("IDENT").value)
            self.expect("PUNCT", ":")
            ktype = str(self.expect("IDENT").value).lower()
            keys.append((kname, ktype))
            if self.at("PUNCT", ","):
                self.next()
        self.expect("PUNCT", ")")
        pair_delim, kv_delim, regex = ";", "=", None
        if self.at_ident("with"):
            self.next()
            self.expect("PUNCT", "(")
            while not self.at("PUNCT", ")"):
                opt = str(self.expect("IDENT").value).lower()
                self.expect("OP", "=")
                val = str(self.expect("STRING").value)
                if opt == "pair_delimiter":
                    pair_delim = val
                elif opt == "kv_delimiter":
                    kv_delim = val
                elif opt == "regex":
                    regex = val
                else:
                    raise KqlSyntaxError(f"parse-kv: unknown option {opt!r}")
                if self.at("PUNCT", ","):
                    self.next()
            self.expect("PUNCT", ")")
        return OpNode(
            "parse-kv",
            {
                "expr": expr,
                "keys": keys,
                "pair_delimiter": pair_delim,
                "kv_delimiter": kv_delim,
                "regex": regex,
            },
        )

    def op_consume(self) -> OpNode:
        """`consume` — run the pipeline, emit no rows (Kusto's sink for
        timing/side effects)."""
        return OpNode("consume", {})

    def op_scan(self) -> OpNode:
        # scan [kind=greedy|concurrent] [with_match_id = name]
        #      with (step s1: pred; step s2: pred; …)
        kind = "greedy"
        match_id = "match_id"
        partials = 1
        if self.at_ident("kind"):
            self.next()
            self.expect("OP", "=")
            kind = self.expect_ident("greedy", "concurrent")
        if self.at_ident("with_partials"):
            # bounded state tables: with_partials=N partial matches per
            # step (engine extension; Kusto's tables are unbounded)
            self.next()
            self.expect("OP", "=")
            partials = int(self.expect("NUMBER").value)
        if self.at_ident("with_match_id"):
            self.next()
            self.expect("OP", "=")
            match_id = str(self.expect("IDENT").value)
        declare: list[tuple[str, str]] = []
        declare_defaults: dict[str, Any] = {}
        if self.at_ident("declare"):
            self.next()
            self.expect("PUNCT", "(")
            while not self.at("PUNCT", ")"):
                vname = str(self.expect("IDENT").value)
                self.expect("PUNCT", ":")
                vtype = str(self.expect("IDENT").value)
                declare.append((vname, vtype))
                if self.at("OP", "="):
                    # Kusto `scan declare (k:long = 0)` default values
                    # (r15) — the variable starts each sequence at the
                    # default instead of null
                    self.next()
                    declare_defaults[vname] = self.parse_expr()
                if self.at("PUNCT", ","):
                    self.next()
            self.expect("PUNCT", ")")
        self.expect_ident("with")
        self.expect("PUNCT", "(")
        steps: list[tuple[str, Any]] = []
        outputs: list[str] = []
        assigns: list[list[tuple[str, Any]]] = []
        while not self.at("PUNCT", ")"):
            self.expect_ident("step")
            sname = str(self.expect("IDENT").value)
            mode = "all"
            if self.at_ident("output"):
                self.next()
                self.expect("OP", "=")
                mode = self.expect_ident("all", "last", "none")
            self.expect("PUNCT", ":")
            steps.append((sname, self.parse_expr()))
            outputs.append(mode)
            step_assigns: list[tuple[str, Any]] = []
            if self.at("OP", "=>"):
                self.next()
                while True:
                    vname = str(self.expect("IDENT").value)
                    self.expect("OP", "=")
                    step_assigns.append((vname, self.parse_expr()))
                    if self.at("PUNCT", ","):
                        self.next()
                        continue
                    break
            assigns.append(step_assigns)
            if self.at("PUNCT", ";"):
                self.next()
        self.expect("PUNCT", ")")
        if not steps:
            raise KqlSyntaxError("scan needs at least one step")
        return OpNode(
            "scan",
            {
                "match_id": match_id,
                "steps": steps,
                "outputs": outputs,
                "declare": declare,
                "declare_defaults": declare_defaults,
                "assigns": assigns,
                "kind": kind,
                "partials": partials,
            },
        )

    def op_project_rename(self) -> OpNode:
        renames = {}
        while True:
            new = self._maybe_bracket_name() or str(self.expect("IDENT").value)
            self.expect("OP", "=")
            old = self._maybe_bracket_name() or str(self.expect("IDENT").value)
            renames[new] = old
            if self.at("PUNCT", ","):
                self.next()
                continue
            break
        return OpNode("project-rename", {"renames": renames})

    def op_summarize(self) -> OpNode:
        shuffle_keys: list[str] = []
        while self.at_ident("hint"):
            self.next()
            self.expect("PUNCT", ".")
            hname = str(self.expect("IDENT").value).lower()
            self.expect("OP", "=")
            # hint values may be identifiers (shufflekey=Col,
            # strategy=shuffle) or numbers (num_partitions=64)
            if self.at("NUMBER"):
                hval = str(self.next().value)
            else:
                hval = str(self.expect("IDENT").value)
            if hname == "shufflekey":
                shuffle_keys.append(hval)
            # other hints (strategy, num_partitions) parse-and-ignore
        aggs = []
        by = []
        if not self.at_ident("by"):
            aggs = self._parse_summarize_exprs()
        if self.at_ident("by"):
            self.next()
            by = self.parse_named_exprs()
        return OpNode(
            "summarize",
            {"aggs": aggs, "by": by, "shuffle_keys": shuffle_keys},
        )

    def _parse_summarize_exprs(self) -> list[tuple]:
        """Like parse_named_exprs but also accepts Kusto's multi-assign
        aggregate form `(n1, n2, …) = arg_min(e, e1, …)` — the name
        slot becomes a TUPLE of output names."""
        cols: list[tuple] = []
        while True:
            if self.at("PUNCT", "("):
                save = self.i
                try:
                    self.next()
                    names = [str(self.expect("IDENT").value)]
                    while self.at("PUNCT", ","):
                        self.next()
                        names.append(str(self.expect("IDENT").value))
                    self.expect("PUNCT", ")")
                    self.expect("OP", "=")
                except KqlSyntaxError:
                    self.i = save
                else:
                    cols.append((tuple(names), self.parse_expr()))
                    if self.at("PUNCT", ","):
                        self.next()
                        continue
                    break
                # fell back: not a multi-assign — parse as plain expr
            save = self.i
            name = None
            if self.at("IDENT"):
                n = str(self.next().value)
                if self.at("OP", "="):
                    self.next()
                    name = n
                else:
                    self.i = save
            cols.append((name, self.parse_expr()))
            if self.at("PUNCT", ","):
                self.next()
                continue
            break
        return cols

    def op_count(self) -> OpNode:
        alias = "Count"
        if self.at_ident("as"):
            self.next()
            alias = str(self.expect("IDENT").value)
        return OpNode("count", {"alias": alias})

    def op_distinct(self) -> OpNode:
        if self.at("OP", "*"):
            self.next()
            return OpNode("distinct", {"cols": []})
        return OpNode("distinct", {"cols": self.parse_name_list()})

    def op_sort(self) -> OpNode:
        self.expect_ident("by")
        orders = []
        while True:
            e = self.parse_expr()
            direction = "desc"  # KQL default
            if self.at_ident("asc", "desc"):
                direction = self.expect_ident("asc", "desc")
            nulls = None  # default: first for asc, last for desc (KQL)
            if self.at_ident("nulls"):
                self.next()
                nulls = self.expect_ident("first", "last")
            orders.append((e, direction, nulls))
            if self.at("PUNCT", ","):
                self.next()
                continue
            break
        return OpNode("sort", {"orders": orders})

    op_order = op_sort

    def op_take(self) -> OpNode:
        # row count may be a literal or a scalar expression (a lambda
        # parameter / let-bound value), resolved at translate time
        if self.at("NUMBER"):
            return OpNode("take", {"n": int(self.next().value)})
        return OpNode("take", {"n": self.parse_expr()})

    op_limit = op_take

    def op_top(self) -> OpNode:
        n = int(self.expect("NUMBER").value)
        self.expect_ident("by")
        e = self.parse_expr()
        direction = "desc"
        if self.at_ident("asc", "desc"):
            direction = self.expect_ident("asc", "desc")
        nulls = None  # default: first for asc, last for desc (KQL)
        if self.at_ident("nulls"):
            self.next()
            nulls = self.expect_ident("first", "last")
        return OpNode("top", {"n": n, "by": e, "dir": direction, "nulls": nulls})

    def op_render(self) -> OpNode:
        """`| render timechart [with (...)]` — a presentation directive,
        not a data transform: consumed and passed through so real-world
        Kusto queries run unmodified."""
        self.expect("IDENT")  # chart kind
        if self.at_ident("with"):
            self.next()
            self._raw_parens()
        return OpNode("render", {})

    def op_join(self) -> OpNode:
        kind = "innerunique"
        hint_broadcast = False
        shuffle_keys: list[str] = []
        while self.at_ident("kind") or self.at_ident("hint"):
            word = self.expect_ident("kind", "hint")
            if word == "kind":
                self.expect("OP", "=")
                kind = str(self.expect("IDENT").value).lower()
            else:
                self.expect("PUNCT", ".")
                hname = str(self.expect("IDENT").value).lower()
                self.expect("OP", "=")
                hval = str(self.expect("IDENT").value)
                if hname == "strategy":
                    hint_broadcast = hval.lower() == "broadcast"
                elif hname == "shufflekey":
                    shuffle_keys.append(hval)
        if self.at("PUNCT", "("):
            self.next()
            right = self.parse_pipeline()
            self.expect("PUNCT", ")")
        else:  # bare table name operand: `join customer on …`
            right = Pipeline(OpNode("table", {"name": str(self.expect("IDENT").value)}), [])
        self.expect_ident("on")
        on = self.parse_join_keys()
        return OpNode(
            "join",
            {
                "kind": kind,
                "right": right,
                "on": on,
                "broadcast": hint_broadcast,
                "shufflekey": shuffle_keys,
            },
        )

    op_lookup = None  # assigned below

    def parse_join_keys(self) -> list[Any]:
        keys = []
        while True:
            if self.at("PUNCT", "$"):
                keys.append(self.parse_expr())  # $left.x == $right.y
            else:
                keys.append(str(self.expect("IDENT").value))
            if self.at("PUNCT", ","):
                self.next()
                continue
            break
        return keys

    def op_union(self) -> OpNode:
        kind = "outer"
        withsource = None
        isfuzzy = False
        while (
            self.at_ident("kind")
            or self.at_ident("withsource")
            or self.at_ident("isfuzzy")
        ):
            w = self.expect_ident("kind", "withsource", "isfuzzy")
            self.expect("OP", "=")
            if w == "isfuzzy":
                isfuzzy = self.expect_ident("true", "false") == "true"
                continue
            if w == "kind":
                kind = self.expect_ident("outer", "inner")
            else:
                withsource = str(self.expect("IDENT").value)
        tables = []
        while True:
            if self.at("PUNCT", "("):
                self.next()
                tables.append(self.parse_pipeline())
                self.expect("PUNCT", ")")
            else:
                nm = str(self.expect("IDENT").value)
                if self.at("OP", "*"):
                    # wildcard union leg: `union nation*` — expanded
                    # against the catalog at translate time
                    self.next()
                    nm += "*"
                tables.append(nm)
            if self.at("PUNCT", ","):
                self.next()
                continue
            break
        return OpNode(
            "union",
            {"kind": kind, "tables": tables, "withsource": withsource, "isfuzzy": isfuzzy},
        )

    def op_mv_expand(self) -> OpNode:
        """mv-expand [kind=bag|array] [bagexpansion=bag|array]
        [with_itemindex=ix] [name =] arrayExpr [to typeof(type)]
        [limit N]"""
        index_name = None
        bag_mode = "bag"
        while (
            self.at_ident("with_itemindex")
            or self.at_ident("kind")
            or self.at_ident("bagexpansion")
        ):
            w = str(self.next().value).lower()
            self.expect("OP", "=")
            if w == "with_itemindex":
                index_name = str(self.expect("IDENT").value)
            else:  # kind / bagexpansion: how property BAGS expand
                bag_mode = self.expect_ident("bag", "array")
        cols = []
        while True:
            save = self.i
            name = None
            if self.at("IDENT"):
                n = str(self.next().value)
                if self.at("OP", "="):
                    self.next()
                    name = n
                else:
                    self.i = save
            e = self.parse_expr()
            ty = None
            if self.at_ident("to"):
                self.next()
                self.expect_ident("typeof")
                self.expect("PUNCT", "(")
                ty = str(self.expect("IDENT").value).lower()
                self.expect("PUNCT", ")")
            cols.append((name, e, ty))
            if self.at("PUNCT", ","):
                self.next()
                continue
            break
        limit = None
        if self.at_ident("limit"):
            self.next()
            limit = int(self.expect("NUMBER").value)
        return OpNode(
            "mv-expand",
            {
                "cols": cols,
                "index": index_name,
                "limit": limit,
                "bag_mode": bag_mode,
            },
        )

    def op_mv_apply(self) -> OpNode:
        """mv-apply [elem =] arrayExpr [to typeof(T)] on ( op | op … ) —
        per-row subquery over the exploded array (supported sub-ops:
        where, extend, summarize, top). Bare-column form reuses the
        column name for the element."""
        name = str(self.expect("IDENT").value)
        if self.at("OP", "="):
            self.next()
            arr = self.parse_expr()
        else:
            arr = Ident(name)  # bare column: element keeps its name
        elem_type = None
        if self.at_ident("to"):
            self.next()
            self.expect_ident("typeof")
            self.expect("PUNCT", "(")
            elem_type = str(self.expect("IDENT").value).lower()
            self.expect("PUNCT", ")")
        self.expect_ident("on")
        self.expect("PUNCT", "(")
        ops = []
        while True:
            ops.append(self.parse_op())
            if self.at("PUNCT", "|"):
                self.next()
                continue
            break
        self.expect("PUNCT", ")")
        return OpNode(
            "mv-apply",
            {"name": name, "expr": arr, "ops": ops, "to": elem_type},
        )

    def op_parse(self) -> OpNode:
        kind = "simple"
        flags = ""
        # kind= / flags= in either order (Kusto: parse kind=regex
        # flags=Ui — flags only meaningful with kind=regex)
        while self.at_ident("kind") or self.at_ident("flags"):
            which = str(self.next().value).lower()
            self.expect("OP", "=")
            if which == "kind":
                kind = str(self.expect("IDENT").value).lower()
                if kind not in ("simple", "regex", "relaxed"):
                    raise KqlSyntaxError(f"parse: unknown kind {kind!r}")
            else:
                flags = str(self.expect("IDENT").value)
        src = self.parse_expr()
        self.expect_ident("with")
        # pattern: STRING IDENT[:type] STRING IDENT[:type] ...
        parts: list[tuple[str, Any]] = []
        while True:
            if self.at("STRING"):
                parts.append(("lit", str(self.next().value)))
            elif self.at("IDENT"):
                name = str(self.next().value)
                typ = "string"
                if self.at("PUNCT", ":"):
                    self.next()
                    typ = str(self.expect("IDENT").value)
                parts.append(("capture", (name, typ)))
            else:
                break
        return OpNode(
            "parse", {"src": src, "parts": parts, "kind": kind, "flags": flags}
        )

    def op_top_nested(self) -> OpNode:
        """top-nested N of key by [name =] agg [with others = 'label']
        (chained with `, top-nested …` — the chain arrives as ONE token
        stream here because parse_op dispatched on the first)."""
        levels = []
        while True:
            n = None
            if self.at("NUMBER"):
                n = int(self.next().value)
            self.expect_ident("of")
            key_name = None
            save = self.i
            if self.at("IDENT"):
                kn = str(self.next().value)
                if self.at("OP", "="):
                    self.next()
                    key_name = kn
                else:
                    self.i = save
            key = self.parse_expr()
            # Kusto places `with others = 'label'` BEFORE `by`
            # (top-nested N of Expr with others = X by Agg); the
            # post-agg position is also accepted (pre-r14 form)
            others = None
            if self.at_ident("with"):
                self.next()
                self.expect_ident("others")
                self.expect("OP", "=")
                # any constant expression, not just a string literal
                # (Kusto allows e.g. strcat(...) — r15 probe batch 7)
                others = self.parse_expr()
            self.expect_ident("by")
            agg_name = None
            save = self.i
            if self.at("IDENT"):
                an = str(self.next().value)
                if self.at("OP", "="):
                    self.next()
                    agg_name = an
                else:
                    self.i = save
            agg = self.parse_expr()
            if others is None and self.at_ident("with"):
                self.next()
                self.expect_ident("others")
                self.expect("OP", "=")
                others = self.parse_expr()
            levels.append(
                {"n": n, "key": key, "key_name": key_name, "agg": agg,
                 "agg_name": agg_name, "others": others}
            )
            if self.at("PUNCT", ","):
                self.next()
                self.expect_ident("top-nested")
                continue
            break
        return OpNode("top-nested", {"levels": levels})

    def op_partition(self) -> OpNode:
        """partition [hint.*=v …] by col ( op | op … ) — run the
        subquery per value of `col` (supported sub-ops: where, extend,
        summarize, top). Hints (strategy, shufflekey, num_partitions)
        parse-and-ignore: the Spark realization is always the shuffled
        window/groupBy form, which IS Kusto's shuffle strategy."""
        while self.at_ident("hint"):
            self.next()
            self.expect("PUNCT", ".")
            self.expect("IDENT")
            self.expect("OP", "=")
            if self.at("NUMBER"):
                self.next()
            else:
                self.expect("IDENT")
        self.expect_ident("by")
        col = str(self.expect("IDENT").value)
        self.expect("PUNCT", "(")
        ops = []
        while True:
            ops.append(self.parse_op())
            if self.at("PUNCT", "|"):
                self.next()
                continue
            break
        self.expect("PUNCT", ")")
        return OpNode("partition", {"col": col, "ops": ops})

    def op_top_hitters(self) -> OpNode:
        """top-hitters N of col [by sum_col] — heaviest values of a
        column by count (or by summed measure)."""
        n = int(self.expect("NUMBER").value)
        self.expect_ident("of")
        col = str(self.expect("IDENT").value)
        by = None
        if self.at_ident("by"):
            self.next()
            by = str(self.expect("IDENT").value)
        return OpNode("top-hitters", {"n": n, "col": col, "by": by})

    def op_fork(self) -> OpNode:
        """fork [name1 =] ( op | op … ) [name2 =] ( … ) — output legs
        off one shared parent; legs are unioned (outer) with a
        `fork_leg` column carrying the leg name. Unnamed legs get
        Kusto's auto names (Result, Result_1, …)."""
        legs = []
        n_anon = 0
        while self.at("IDENT") or self.at("PUNCT", "("):
            if self.at("IDENT"):
                name = str(self.expect("IDENT").value)
                self.expect("OP", "=")
            else:
                name = "Result" if n_anon == 0 else f"Result_{n_anon}"
                n_anon += 1
            self.expect("PUNCT", "(")
            ops = []
            while True:
                ops.append(self.parse_op())
                if self.at("PUNCT", "|"):
                    self.next()
                    continue
                break
            self.expect("PUNCT", ")")
            legs.append((name, ops))
        if not legs:
            raise KqlSyntaxError(
                "fork requires at least one `[name =] ( ops )` leg"
            )
        return OpNode("fork", {"legs": legs})

    def op_facet(self) -> OpNode:
        """facet by col1, col2 — per-column value-count tables, unioned
        as (facet_column, value, count_). Optional `with ( op | op … )`
        applies the subquery per facet value (single facet column)."""
        self.expect_ident("by")
        cols = self.parse_name_list()
        with_ops = None
        if self.at_ident("with"):
            self.next()
            self.expect("PUNCT", "(")
            with_ops = [self.parse_op()]
            while self.at("PUNCT", "|"):
                self.next()
                with_ops.append(self.parse_op())
            self.expect("PUNCT", ")")
        return OpNode("facet", {"cols": cols, "with": with_ops})

    def op_make_graph(self) -> OpNode:
        """`make-graph src --> dst [with NodesTable on id]` — the piped
        table is the edge list."""
        src = str(self.expect("IDENT").value)
        self.expect("OP", "-")
        self.expect("OP", "-")
        self.expect("OP", ">")
        dst = str(self.expect("IDENT").value)
        nodes = node_id = None
        if self.at_ident("with"):
            self.next()
            if self.at("PUNCT", "("):
                # inline nodes subquery: with (T | project …) on id
                self.next()
                nodes = self.parse_pipeline()
                self.expect("PUNCT", ")")
            else:
                nodes = str(self.expect("IDENT").value)
            self.expect_ident("on")
            node_id = str(self.expect("IDENT").value)
        return OpNode(
            "make-graph",
            {"src": src, "dst": dst, "nodes": nodes, "node_id": node_id},
        )

    def op_graph_to_table(self) -> OpNode:
        """`graph-to-table nodes [with_node_id=name]` or
        `graph-to-table edges [with_source_id=name] [with_target_id=
        name]` — materialize the graph context back into a table
        (single-output subset of Kusto's `as`-binding form)."""
        what = str(self.expect("IDENT").value).lower()
        if what not in ("nodes", "edges"):
            raise KqlSyntaxError("graph-to-table expects 'nodes' or 'edges'")
        opts: dict[str, str] = {}
        while self.at_ident("with_node_id") or self.at_ident(
            "with_source_id"
        ) or self.at_ident("with_target_id"):
            key = str(self.next().value)
            self.expect("OP", "=")
            opts[key] = str(self.expect("IDENT").value)
        return OpNode("graph-to-table", {"what": what, **opts})

    def op_graph_match(self) -> OpNode:
        """`graph-match (a)-[e1]->(b)[-[e2]->(c)…] [where pred]
        project name = expr, …` — fixed-length directed path patterns
        (no variable-length edges; named variables required)."""
        nodes: list[str] = []
        edges: list[str] = []
        self.expect("PUNCT", "(")
        nodes.append(str(self.expect("IDENT").value))
        self.expect("PUNCT", ")")
        while self.at("OP", "-"):
            self.next()
            self.expect("PUNCT", "[")
            ev = str(self.expect("IDENT").value)
            lo = hi = None
            if self.at("OP", "*"):
                # variable-length edge e*lo..hi (bounded expansion)
                self.next()
                lo = int(float(self.expect("NUMBER").value))
                self.expect("OP", "..")
                hi = int(float(self.expect("NUMBER").value))
                if lo < 1 or hi < lo:
                    raise KqlSyntaxError(
                        "graph-match edge range needs 1 <= lo <= hi"
                    )
            edges.append({"var": ev, "min": lo, "max": hi})
            self.expect("PUNCT", "]")
            self.expect("OP", "-")
            self.expect("OP", ">")
            self.expect("PUNCT", "(")
            nodes.append(str(self.expect("IDENT").value))
            self.expect("PUNCT", ")")
        if not edges:
            raise KqlSyntaxError("graph-match needs at least one edge")
        pred = None
        if self.at_ident("where"):
            self.next()
            pred = self.parse_expr()
        self.expect_ident("project")
        cols = self.parse_named_exprs()
        return OpNode(
            "graph-match",
            {"nodes": nodes, "edges": edges, "pred": pred, "cols": cols},
        )

    def op_graph_shortest_paths(self) -> OpNode:
        """`graph-shortest-paths [output=any] (s)-[e*lo..hi]->(t)
        [where pred] project name = expr, …` — one variable-length
        edge between two node variables (Kusto's mandatory range; this
        engine's BFS subset returns one shortest path per pair)."""
        output = "any"
        if self.at_ident("output"):
            self.next()
            self.expect("OP", "=")
            output = str(self.expect("IDENT").value).lower()
        self.expect("PUNCT", "(")
        s = str(self.expect("IDENT").value)
        self.expect("PUNCT", ")")
        self.expect("OP", "-")
        self.expect("PUNCT", "[")
        ev = str(self.expect("IDENT").value)
        self.expect("OP", "*")
        lo = int(float(self.expect("NUMBER").value))
        self.expect("OP", "..")
        hi = int(float(self.expect("NUMBER").value))
        if lo < 1 or hi < lo:
            raise KqlSyntaxError(
                "graph-shortest-paths edge range needs 1 <= lo <= hi"
            )
        self.expect("PUNCT", "]")
        self.expect("OP", "-")
        self.expect("OP", ">")
        self.expect("PUNCT", "(")
        tn = str(self.expect("IDENT").value)
        self.expect("PUNCT", ")")
        pred = None
        if self.at_ident("where"):
            self.next()
            pred = self.parse_expr()
        self.expect_ident("project")
        cols = self.parse_named_exprs()
        return OpNode(
            "graph-shortest-paths",
            {
                "output": output,
                "src_var": s,
                "dst_var": tn,
                "edge_var": ev,
                "min": lo,
                "max": hi,
                "pred": pred,
                "cols": cols,
            },
        )

    def op_render(self) -> OpNode:
        """`render timechart [with (...)]` — a presentation directive,
        not a data transformation: parsed for grammar parity and
        dropped (the result table is unchanged, Kusto's semantics for
        non-visual consumers). Everything up to the next pipe is
        consumed."""
        while not (self.at("PUNCT", "|") or self.at("EOF")):
            self.next()
        return OpNode("render", {})

    def op_reduce(self) -> OpNode:
        """`reduce by col [with threshold=0.x]` — pattern clustering.
        threshold is parsed for grammar parity (Kusto tunes its
        proprietary heuristic with it; the exact rewrite here has no
        knob) and ignored."""
        self.expect_ident("by")
        col = str(self.expect("IDENT").value)
        threshold = None
        if self.at_ident("with"):
            self.next()
            self.expect_ident("threshold")
            self.expect("OP", "=")
            threshold = float(self.expect("NUMBER").value)
        return OpNode("reduce", {"col": col, "threshold": threshold})

    def op_evaluate(self) -> OpNode:
        """`evaluate plugin(args)` — bag_unpack, pivot, activity
        analytics, … Args may be NAMED (`login = (Event == 'login')`,
        the Kusto sequence_detect expr form); names land in `arg_names`
        parallel to `args` (None for positional)."""
        plugin = str(self.expect("IDENT").value).lower()
        self.expect("PUNCT", "(")
        args = []
        arg_names: list = []

        def one():
            save = self.i
            if self.at("IDENT"):
                n = str(self.next().value)
                if self.at("OP", "="):
                    self.next()
                    arg_names.append(n)
                    args.append(self.parse_expr())
                    return
                self.i = save
            arg_names.append(None)
            args.append(self.parse_expr())

        if not self.at("PUNCT", ")"):
            one()
            while self.at("PUNCT", ","):
                self.next()
                one()
        self.expect("PUNCT", ")")
        return OpNode(
            "evaluate", {"plugin": plugin, "args": args, "arg_names": arg_names}
        )

    def op_make_series(self) -> OpNode:
        """make-series name=agg(...) [default=lit] on ts
        [from expr to expr] step 1d [by keys]"""
        aggs = []
        default = P_DEFAULT_SENTINEL
        while True:
            name = None
            save = self.i
            if self.at("IDENT"):
                n = str(self.next().value)
                if self.at("OP", "="):
                    self.next()
                    name = n
                else:
                    self.i = save
            aggs.append((name, self.parse_expr()))
            # `default = lit` binds after an agg WITHOUT a comma
            if self.at_ident("default"):
                self.next()
                self.expect("OP", "=")
                default = self.parse_expr()
            if self.at("PUNCT", ","):
                self.next()
                continue
            break
        self.expect_ident("on")
        ts = self.parse_expr()
        lo = hi = None
        if self.at_ident("from"):
            self.next()
            lo = self.parse_expr()
            self.expect_ident("to")
            hi = self.parse_expr()
        self.expect_ident("step")
        step = self.parse_expr()
        by = []
        if self.at_ident("by"):
            self.next()
            by = self.parse_named_exprs()
        return OpNode(
            "make-series",
            {"aggs": aggs, "default": default, "on": ts, "from": lo, "to": hi,
             "step": step, "by": by},
        )

    def op_search(self) -> OpNode:
        """`search ['col':] 'term'` with optional kind=case_sensitive —
        substring match across all string columns, or one column when
        qualified."""
        case_sensitive = False
        if self.at_ident("kind"):
            self.next()
            self.expect("OP", "=")
            kind = str(self.expect("IDENT").value).lower()
            if kind not in ("default", "case_sensitive"):
                raise KqlSyntaxError(f"search: unknown kind {kind!r}")
            case_sensitive = kind == "case_sensitive"
        col = None
        if self.at("IDENT"):
            save = self.i
            name = str(self.next().value)
            if self.at("PUNCT", ":"):
                self.next()
                col = name
            else:
                self.i = save
        term = self.expect("STRING").value
        return OpNode(
            "search",
            {"term": str(term), "col": col, "case_sensitive": case_sensitive},
        )

    def op_as(self) -> OpNode:
        """`T | as name` — bind the current table mid-pipeline."""
        return OpNode("as", {"name": str(self.expect("IDENT").value)})

    def op_getschema(self) -> OpNode:
        return OpNode("getschema", {})

    def op_sample(self) -> OpNode:
        n = self.expect("NUMBER").value
        return OpNode("sample", {"n": float(n)})

    def op_sample_distinct(self) -> OpNode:
        # sample-distinct N of ColumnName
        n = self.expect("NUMBER").value
        if not self.at_ident("of"):
            raise KqlSyntaxError("sample-distinct expects `N of Column`")
        self.next()
        col = str(self.expect("IDENT").value)
        return OpNode("sample-distinct", {"n": float(n), "col": col})

    def op_serialize(self) -> OpNode:
        # `serialize [name = expr, …]` — optional assignments evaluated
        # over the frozen order (window functions allowed)
        cols = []
        if not (self.at("PUNCT", "|") or self.at("EOF")):
            cols = self.parse_named_exprs()
        return OpNode("serialize", {"cols": cols})

    # ---------------------------------------------------------- expressions
    def parse_expr(self):
        return self.parse_or()

    def parse_or(self):
        left = self.parse_and()
        while self.at_ident("or"):
            self.next()
            left = Binary("or", left, self.parse_and())
        return left

    def parse_and(self):
        left = self.parse_not()
        while self.at_ident("and"):
            self.next()
            left = Binary("and", left, self.parse_not())
        return left

    def parse_not(self):
        if self.at_ident("not"):
            self.next()
            return Unary("not", self.parse_not())
        return self.parse_comparison()

    _STR_PREDS = {
        "has", "has_cs", "contains", "contains_cs", "startswith",
        "endswith", "startswith_cs", "endswith_cs",
        "hasprefix", "hassuffix", "hasprefix_cs", "hassuffix_cs",
    }

    def parse_comparison(self):
        left = self.parse_additive()
        t = self.peek()
        if t.kind == "OP" and t.value in ("==", "!=", "<", "<=", ">", ">=", "=~", "!~"):
            self.next()
            return Binary(str(t.value), left, self.parse_additive())
        if t.kind == "OP" and t.value in ("!in", "!in~"):
            self.next()
            return self._parse_in(left, negated=True, ci=str(t.value).endswith("~"))
        if t.kind == "OP" and t.value == "!between":
            self.next()
            self.expect("PUNCT", "(")
            low = self.parse_expr()
            self.expect("OP", "..")
            high = self.parse_expr()
            self.expect("PUNCT", ")")
            return Unary("not", Between(left, low, high))
        if (
            t.kind == "OP"
            and str(t.value).startswith("!")
            and str(t.value)[1:] in self._STR_PREDS
        ):
            # negated string predicate (!has, !contains, …)
            self.next()
            return Unary(
                "not", Binary(str(t.value)[1:], left, self.parse_additive())
            )
        if t.kind == "OP" and t.value == "in~":
            self.next()
            return self._parse_in(left, negated=False, ci=True)
        if t.kind == "IDENT":
            word = str(t.value).lower()
            if word in self._STR_PREDS:
                self.next()
                return Binary(word, left, self.parse_additive())
            if word == "in":
                self.next()
                ci = False
                if self.at("OP", "=~"):  # in~
                    self.next()
                    ci = True
                return self._parse_in(left, negated=False, ci=ci)
            if word in ("has_any", "has_all"):
                # desugar to an or/and chain of `has` terms at parse
                # time — each term keeps the token-bloom prefilter path
                self.next()
                self.expect("PUNCT", "(")
                if self.at("PUNCT", "("):
                    # table subquery form: has_any ((T | project c)) —
                    # resolved at translate time (bounded collect)
                    save = self.i
                    self.next()
                    try:
                        pipe = self.parse_pipeline()
                        self.expect("PUNCT", ")")
                        self.expect("PUNCT", ")")
                        return Binary(
                            "has_any_sub" if word == "has_any" else "has_all_sub",
                            left,
                            pipe,
                        )
                    except KqlSyntaxError:
                        self.i = save
                values = [self.parse_expr()]
                while self.at("PUNCT", ","):
                    self.next()
                    values.append(self.parse_expr())
                self.expect("PUNCT", ")")
                joiner = "and" if word == "has_all" else "or"
                node = Binary("has", left, values[0])
                for v in values[1:]:
                    node = Binary(joiner, node, Binary("has", left, v))
                return node
            if word == "between":
                self.next()
                self.expect("PUNCT", "(")
                low = self.parse_expr()
                self.expect("OP", "..")
                high = self.parse_expr()
                self.expect("PUNCT", ")")
                return Between(left, low, high)
            if word == "matches":
                self.next()
                self.expect_ident("regex")
                return Binary("matches", left, self.parse_additive())
        return left

    def _parse_in(self, left, negated: bool, ci: bool = False):
        self.expect("PUNCT", "(")
        # table-subquery form: in ((T | project col)) — the doubled
        # paren disambiguates a pipeline from a scalar expression
        if self.at("PUNCT", "("):
            save = self.i
            self.next()
            if self.at("IDENT"):
                save2 = self.i
                self.next()
                is_pipe = self.at("PUNCT", "|") or self.at("PUNCT", ")")
                self.i = save2
                if is_pipe:
                    pipe = self.parse_pipeline()
                    self.expect("PUNCT", ")")
                    self.expect("PUNCT", ")")
                    return InList(
                        left, [pipe], negated=negated, case_insensitive=ci
                    )
            self.i = save
        # Kusto's documented SINGLE-paren subquery form: in (T | op | …)
        # — a bare ident followed by '|' can only be a pipeline (r15,
        # probe batch 9); a lone ident stays a scalar (column/let ref)
        if self.at("IDENT"):
            save2 = self.i
            self.next()
            is_pipe = self.at("PUNCT", "|")
            self.i = save2
            if is_pipe:
                pipe = self.parse_pipeline()
                self.expect("PUNCT", ")")
                return InList(
                    left, [pipe], negated=negated, case_insensitive=ci
                )
        values = [self.parse_expr()]
        while self.at("PUNCT", ","):
            self.next()
            values.append(self.parse_expr())
        self.expect("PUNCT", ")")
        return InList(left, values, negated=negated, case_insensitive=ci)

    def parse_additive(self):
        left = self.parse_multiplicative()
        while self.at("OP", "+") or self.at("OP", "-"):
            op = str(self.next().value)
            left = Binary(op, left, self.parse_multiplicative())
        return left

    def parse_multiplicative(self):
        left = self.parse_unary()
        while self.at("OP", "*") or self.at("OP", "/") or self.at("OP", "%"):
            op = str(self.next().value)
            left = Binary(op, left, self.parse_unary())
        return left

    def parse_unary(self):
        if self.at("OP", "-"):
            self.next()
            return Unary("-", self.parse_unary())
        if self.at("OP", "+"):
            # unary plus is a no-op (Kusto allows `+5`, `real(+inf)`)
            self.next()
            return self.parse_unary()
        return self.parse_postfix()

    def parse_postfix(self):
        e = self.parse_primary()
        while True:
            if self.at("PUNCT", "."):
                # member access only when base is not an Ident used as $left.x
                self.next()
                name = str(self.expect("IDENT").value)
                e = Member(e, name)
                continue
            if self.at("PUNCT", "["):
                self.next()
                idx = self.parse_expr()
                self.expect("PUNCT", "]")
                e = Index(e, idx)
                continue
            break
        return e

    def parse_primary(self):
        t = self.peek()
        if t.kind == "NUMBER":
            self.next()
            v = t.value
            return Lit(int(v) if float(v).is_integer() else float(v))
        if t.kind == "STRING":
            self.next()
            return Lit(str(t.value))
        if t.kind == "TIMESPAN":
            self.next()
            return Timespan(float(t.value))
        if t.kind == "PUNCT" and t.value == "(":
            self.next()
            e = self.parse_expr()
            self.expect("PUNCT", ")")
            return e
        if t.kind == "PUNCT" and t.value == "[":
            # bare [v1, v2, …] array literal (nested dynamic arrays)
            self.next()
            items = []
            while not self.at("PUNCT", "]"):
                items.append(self.parse_expr())
                if self.at("PUNCT", ","):
                    self.next()
            self.expect("PUNCT", "]")
            return DynamicLit(items)
        if t.kind == "PUNCT" and t.value == "$":
            self.next()
            side = self.expect_ident("left", "right")
            self.expect("PUNCT", ".")
            name = str(self.expect("IDENT").value)
            return Ident(f"${side}.{name}")
        if t.kind == "OP" and t.value == "*":
            self.next()
            return Ident("*")
        if t.kind == "IDENT":
            word = str(t.value)
            self.next()
            low = word.lower()
            if low == "true":
                return Lit(True)
            if low == "false":
                return Lit(False)
            if low == "null":
                return Lit(None)
            if low in ("datetime", "date") and self.at("PUNCT", "("):
                # date(...) is Kusto's documented alias for datetime(...)
                return DateTimeLit(self._raw_parens())
            if low == "dynamic" and self.at("PUNCT", "("):
                # dynamic([v1, v2, …]) literal array | dynamic(scalar)
                self.next()
                if self.at("PUNCT", "["):
                    self.next()
                    items = []
                    while not self.at("PUNCT", "]"):
                        items.append(self.parse_expr())
                        if self.at("PUNCT", ","):
                            self.next()
                    self.expect("PUNCT", "]")
                    self.expect("PUNCT", ")")
                    return DynamicLit(items)
                if self.at("PUNCT", "{"):
                    # dynamic({"k": lit, …}) property-bag literal →
                    # canonical JSON string (bags travel as JSON text);
                    # values recurse (nested bags/arrays supported)
                    import json as _json

                    bag = self._parse_json_literal()
                    self.expect("PUNCT", ")")
                    return Lit(_json.dumps(bag, separators=(",", ":")))
                e = self.parse_expr()
                self.expect("PUNCT", ")")
                return e
            if low == "toscalar" and self.at("PUNCT", "("):
                # toscalar(T | …) — scalar subquery (first column of
                # first row). Try the pipeline form; fall back to a
                # plain expression argument.
                self.next()
                save = self.i
                node: Any = None
                try:
                    pipe = self.parse_pipeline()
                    if self.at("PUNCT", ")"):
                        node = pipe
                except KqlSyntaxError:
                    pass
                if node is None:
                    self.i = save
                    node = self.parse_expr()
                self.expect("PUNCT", ")")
                return Call("toscalar", [node])
            if self.at("PUNCT", "("):
                self.next()
                args = []
                if not self.at("PUNCT", ")"):
                    args.append(self.parse_expr())
                    while self.at("PUNCT", ","):
                        self.next()
                        args.append(self.parse_expr())
                self.expect("PUNCT", ")")
                # preserve source case: let-bound lambda names are
                # case-sensitive; builtins are lowered at dispatch
                return Call(word, args)
            return Ident(word)
        raise KqlSyntaxError(f"unexpected token {t!r}")

    def _raw_parens(self) -> str:
        """Consume a parenthesized region and return its RAW source text
        (for datetime(2024-01-01 00:00:00)-style literals whose content
        does not tokenize as an expression)."""
        open_tok = self.expect("PUNCT", "(")
        depth = 1
        t = open_tok
        while depth:
            t = self.next()
            if t.kind == "EOF":
                raise KqlSyntaxError("unterminated datetime(...) literal")
            if t.kind == "PUNCT" and t.value == "(":
                depth += 1
            elif t.kind == "PUNCT" and t.value == ")":
                depth -= 1
        raw = self.text[open_tok.pos + 1 : t.pos].strip()
        # Kusto also accepts the QUOTED form — datetime('2024-01-05') /
        # datetime("...") — strip one layer of matching quotes (r15)
        if len(raw) >= 2 and raw[0] == raw[-1] and raw[0] in "'\"":
            raw = raw[1:-1].strip()
        return raw


def op_lookup(self) -> OpNode:
    node = self.op_join()
    node.args["kind"] = "lookup"
    return node


Parser.op_lookup = op_lookup


P_DEFAULT_SENTINEL = Lit(0)


def parse_kql(text: str) -> Query:
    return Parser(text).parse()
