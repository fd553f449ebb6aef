"""MeerkatTable — the KQL-pipeline builder over a Spark DataFrame.

A KQL query is a pipeline `Table | op | op | …` (reference README.md:34
commits to KQL as the query language; the type enum in
src/store/segment_metadata.rs:131-142 is the KQL scalar set). Each
tabular operator here is a thin, *declarative* DataFrame transformation
— no materialization, no driver-side loops — so the whole pipeline folds
into one Catalyst logical plan and gets optimized (pushdown, pruning,
join planning, AQE) as a unit.

KQL semantic deltas are encoded here, once (SURVEY.md §7.4.3):
- `sort by` defaults to DESC; KQL nulls order is "nulls first" for asc
  and "nulls last" for desc.
- `join` default kind is `innerunique` (left side deduped on keys).
- `union` default is outer (schema union, missing cols null).
- `summarize` with no `by` is a global aggregate.
"""

from __future__ import annotations

import fnmatch
from collections.abc import Iterable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from meerkat_spark.localrel import local_df
from meerkat_spark.types import spark_to_kql

JOIN_KIND_MAP = {
    "inner": "inner",
    "innerunique": "inner",  # left deduped first — handled in .join()
    "leftouter": "left",
    "rightouter": "right",
    "fullouter": "full",
    "leftsemi": "left_semi",
    "leftanti": "left_anti",
    # Spark has no right_semi/right_anti — realized by swapping sides.
    "rightsemi": "left_semi",
    "rightanti": "left_anti",
    # Kusto's documented aliases (r14, corrected r15): Kusto documents
    # aliases only for the ANTI family — `anti` == leftanti, and
    # *antisemi are the long-form spellings. `kind=semi` is NOT valid
    # Kusto and is rejected (ADVICE r14: silently accepting it would
    # pass queries the real engine refuses).
    "anti": "left_anti",
    "leftantisemi": "left_anti",
    "rightantisemi": "left_anti",
}


def _as_col(c: str | Column) -> Column:
    return F.col(c) if isinstance(c, str) else c


class MeerkatTable:
    """Immutable wrapper: every operator returns a new MeerkatTable."""

    def __init__(self, df: DataFrame):
        self.df = df

    # -- plumbing -----------------------------------------------------
    def _wrap(self, df: DataFrame) -> "MeerkatTable":
        return MeerkatTable(df)

    def to_df(self) -> DataFrame:
        return self.df

    @property
    def columns(self) -> list[str]:
        return self.df.columns

    # -- KQL tabular operators (SURVEY.md §2.2.1) ---------------------
    def where(self, predicate: Column | str) -> "MeerkatTable":
        """KQL `where`/`filter` → df.filter (Catalyst pushes to scan)."""
        pred = F.expr(predicate) if isinstance(predicate, str) else predicate
        return self._wrap(self.df.filter(pred))

    filter = where

    def project(self, *cols: Column | str, **named: Column | str) -> "MeerkatTable":
        """KQL `project` — select + compute + rename."""
        exprs = [_as_col(c) if not isinstance(c, str) else F.expr(c) for c in cols]
        exprs += [
            (F.expr(e) if isinstance(e, str) else e).alias(name)
            for name, e in named.items()
        ]
        return self._wrap(self.df.select(*exprs))

    def extend(self, **named: Column | str) -> "MeerkatTable":
        """KQL `extend` — add/replace computed columns."""
        cols = {
            name: (F.expr(e) if isinstance(e, str) else e) for name, e in named.items()
        }
        return self._wrap(self.df.withColumns(cols))

    def project_away(self, *patterns: str) -> "MeerkatTable":
        """KQL `project-away` — drop columns; wildcards allowed."""
        drop = [
            c
            for c in self.df.columns
            if any(fnmatch.fnmatchcase(c, p) for p in patterns)
        ]
        return self._wrap(self.df.drop(*drop))

    def project_keep(self, *patterns: str) -> "MeerkatTable":
        """KQL `project-keep` — keep matching columns, original order."""
        keep = [
            c
            for c in self.df.columns
            if any(fnmatch.fnmatchcase(c, p) for p in patterns)
        ]
        return self._wrap(self.df.select(*keep))

    def project_rename(self, **renames: str) -> "MeerkatTable":
        """KQL `project-rename new=old`."""
        mapping = {old: new for new, old in renames.items()}
        return self._wrap(self.df.withColumnsRenamed(mapping))

    def project_reorder(self, *first: str) -> "MeerkatTable":
        """KQL `project-reorder` — move matching columns to the front
        (wildcard patterns allowed, each expanding in the table's
        existing column order, Kusto's default ordering)."""
        front: list[str] = []
        for p in first:
            if "*" in p or "?" in p:
                front += [
                    c
                    for c in self.df.columns
                    if fnmatch.fnmatchcase(c, p) and c not in front
                ]
            elif p not in front:
                front.append(p)
        rest = [c for c in self.df.columns if c not in front]
        return self._wrap(self.df.select(*front, *rest))

    def summarize(
        self,
        aggs: dict[str, Column],
        by: Iterable[str | Column] | None = None,
    ) -> "MeerkatTable":
        """KQL `summarize agg1=…, agg2=… [by k1, k2]`.

        Spark executes this as partial+final HashAggregate automatically —
        the distributed partial/final split the reference planned
        (reference README.md:34) is Catalyst's default physical plan.
        """
        agg_cols = [c.alias(name) for name, c in aggs.items()]
        if by:
            keys = [_as_col(k) for k in by]
            return self._wrap(self.df.groupBy(*keys).agg(*agg_cols))
        return self._wrap(self.df.agg(*agg_cols))

    def count(self, alias: str = "Count") -> "MeerkatTable":
        """KQL `count` — 1×1 table (declarative, not an action)."""
        return self._wrap(self.df.agg(F.count(F.lit(1)).alias(alias)))

    def distinct(self, *cols: str) -> "MeerkatTable":
        df = self.df.select(*cols) if cols else self.df
        return self._wrap(df.distinct())

    def sort(self, *orders: Column | str, desc_default: bool = True) -> "MeerkatTable":
        """KQL `sort by` — default DESC (nulls last); pass Columns with
        explicit .asc()/.desc() to override. KQL nulls: first for asc,
        last for desc."""
        cols: list[Column] = []
        for o in orders:
            if isinstance(o, str):
                cols.append(
                    F.col(o).desc_nulls_last() if desc_default else F.col(o).asc_nulls_first()
                )
            else:
                cols.append(o)
        return self._wrap(self.df.orderBy(*cols))

    order_by = sort

    def take(self, n: int) -> "MeerkatTable":
        """KQL `take`/`limit` — first N, no order guarantee."""
        return self._wrap(self.df.limit(n))

    limit = take

    def top(self, n: int, by: Column | str, asc: bool = False) -> "MeerkatTable":
        """KQL `top N by expr` — Catalyst plans TakeOrderedAndProject
        (per-partition top-N then merge: no full sort, no full shuffle)."""
        col = _as_col(by)
        col = col.asc_nulls_first() if asc else col.desc_nulls_last()
        return self._wrap(self.df.orderBy(col).limit(n))

    def join(
        self,
        other: "MeerkatTable | DataFrame",
        on: str | list[str] | Column,
        kind: str = "innerunique",
        broadcast_right: bool = False,
        left_keys: list[str] | None = None,
        side_aliases: tuple[str, str] | None = None,
    ) -> "MeerkatTable":
        """KQL `join kind=…` — all eight kinds + innerunique default.

        innerunique (the KQL default) dedups the LEFT side on the join
        keys before an inner join. rightsemi/rightanti swap sides onto
        Spark's left_semi/left_anti (Spark has no right-semi variants).

        `side_aliases=(l, r)` wraps each side in a subquery alias and
        expects `on` to reference columns as `l.col` / `r.col` — the
        SELF-JOIN form (`let hot = …; hot | join (hot) on k`): with
        dataset-col references Spark cannot attribute the two identical
        attribute ids and raises AMBIGUOUS_SELF_JOIN.
        """
        right = other.df if isinstance(other, MeerkatTable) else other
        left = self.df
        k = kind.replace("=", "").lower()
        if k not in JOIN_KIND_MAP:
            raise ValueError(f"unknown join kind {kind!r}")
        if k == "innerunique":
            keys = left_keys or ([on] if isinstance(on, str) else on)
            if not isinstance(keys, list):
                raise ValueError(
                    "innerunique with an expression join needs left_keys=[...]"
                )
            left = left.dropDuplicates(keys)
        if side_aliases:
            left = left.alias(side_aliases[0])
            right = right.alias(side_aliases[1])
        if k in ("rightsemi", "rightanti", "rightantisemi"):
            left, right = right, left
        if broadcast_right:
            right = F.broadcast(right)
        how = JOIN_KIND_MAP[k]
        joined = left.join(right, on, how)
        # Kusto name-collision rule: both sides' columns survive the
        # join, and a right column whose name collides with a left one
        # is suffixed `1` (then 2, ... until free): `T1 | join T2 on
        # $left.k == $right.k` yields k and k1. Spark instead keeps two
        # ambiguous same-name attributes — resolve via per-side
        # references and alias Kusto-style. Semi/anti output only one
        # side (nothing to rename); the plain-name `on key` form keeps
        # Spark's single merged key column (documented subset — many
        # suite oracles pin that shape) but still renames colliding
        # NON-key right columns, which were unreferencable before.
        if how not in ("left_semi", "left_anti"):
            merged = (
                [] if isinstance(on, Column) else ([on] if isinstance(on, str) else list(on))
            )
            l_cols = [c for c in left.columns if c not in merged]
            r_cols = [c for c in right.columns if c not in merged]
            if set(l_cols) & set(r_cols):

                def _q(name: str) -> str:
                    return "`" + name.replace("`", "``") + "`"

                def _lref(c: str) -> Column:
                    if side_aliases:
                        return F.col(f"{side_aliases[0]}.{_q(c)}")
                    return left[c]

                def _rref(c: str) -> Column:
                    if side_aliases:
                        return F.col(f"{side_aliases[1]}.{_q(c)}")
                    return right[c]

                taken = set(merged) | set(l_cols) | set(r_cols)
                sel = [F.col(c) for c in merged] + [
                    _lref(c).alias(c) for c in l_cols
                ]
                for c in r_cols:
                    if c in l_cols:
                        i = 1
                        while f"{c}{i}" in taken:
                            i += 1
                        new = f"{c}{i}"
                        taken.add(new)
                        sel.append(_rref(c).alias(new))
                    else:
                        sel.append(_rref(c).alias(c))
                joined = joined.select(*sel)
        return self._wrap(joined)

    def lookup(
        self,
        dim: "MeerkatTable | DataFrame",
        on: str | list[str] | Column,
        kind: str = "leftouter",
        side_aliases: tuple[str, str] | None = None,
    ) -> "MeerkatTable":
        """KQL `lookup` — dimension enrich; right side is broadcast
        (dimension tables are small by contract, so the join is
        shuffle-free at any fact-table scale). `side_aliases` as in
        join(): expression `on` built against subquery aliases."""
        right = dim.df if isinstance(dim, MeerkatTable) else dim
        left = self.df
        if side_aliases:
            left = left.alias(side_aliases[0])
            right = right.alias(side_aliases[1])
        how = "left" if kind == "leftouter" else "inner"
        return self._wrap(left.join(F.broadcast(right), on, how))

    def union(
        self, *others: "MeerkatTable | DataFrame", kind: str = "outer"
    ) -> "MeerkatTable":
        """KQL `union` — outer (default): schema union, missing → null;
        inner: common columns only."""
        dfs = [self.df] + [
            o.df if isinstance(o, MeerkatTable) else o for o in others
        ]
        if kind == "outer":
            out = dfs[0]
            for d in dfs[1:]:
                out = out.unionByName(d, allowMissingColumns=True)
            return self._wrap(out)
        common = [c for c in dfs[0].columns if all(c in d.columns for d in dfs[1:])]
        out = dfs[0].select(*common)
        for d in dfs[1:]:
            out = out.unionByName(d.select(*common))
        return self._wrap(out)

    def mv_expand(
        self, column: str, index_col: str | None = None, outer: bool = False
    ) -> "MeerkatTable":
        """KQL `mv-expand` — explode an array column into rows.

        With `index_col`, emits the 0-based element index (KQL
        `with_itemindex=`)."""
        others = [c for c in self.df.columns if c != column]
        if index_col:
            ex = F.posexplode_outer(column) if outer else F.posexplode(column)
            df = self.df.select(*others, ex.alias(index_col, column))
        else:
            ex = F.explode_outer(column) if outer else F.explode(column)
            df = self.df.select(*others, ex.alias(column))
        return self._wrap(df)

    def getschema(self) -> "MeerkatTable":
        """KQL `getschema` — table of (ColumnName, ColumnOrdinal, DataType,
        ColumnType)."""
        spark = self.df.sparkSession
        rows = [
            (name, i, dtype, spark_to_kql(field.dataType))
            for i, (name, dtype, field) in enumerate(
                (f.name, f.dataType.simpleString(), f)
                for f in self.df.schema.fields
            )
        ]
        out = local_df(
            spark,
            rows,
            "ColumnName string, ColumnOrdinal int, DataType string, ColumnType string",
        )
        return self._wrap(out)

    def search(
        self,
        term: str,
        case_sensitive: bool = False,
        column: str | None = None,
    ) -> "MeerkatTable":
        """KQL `search` — substring match across all string columns, or
        one column when qualified (`search Col:'term'`). A `*` in the
        term is Kusto's wildcard; like the plain-term case the match is
        un-anchored (`fail*` matches a 'fail'-prefixed term anywhere in
        the value, not only values that start with it), so the LIKE
        pattern is wrapped in '%'. Subset note: matching is substring-
        based, not term-boundary-based, consistently for both the plain
        and wildcard forms."""
        from functools import reduce

        str_cols = (
            [column]
            if column is not None
            else [
                f.name
                for f in self.df.schema.fields
                if f.dataType.simpleString() == "string"
            ]
        )
        if not str_cols:
            return self._wrap(self.df.filter(F.lit(False)))

        if "*" in term:
            esc = term.replace("%", "\\%").replace("_", "\\_")
            pat = "%" + esc.replace("*", "%") + "%"
            if case_sensitive:
                preds = [F.col(c).like(pat) for c in str_cols]
            else:
                preds = [F.lower(F.col(c)).like(pat.lower()) for c in str_cols]
        elif case_sensitive:
            preds = [F.col(c).contains(term) for c in str_cols]
        else:
            preds = [F.lower(F.col(c)).contains(term.lower()) for c in str_cols]
        return self._wrap(self.df.filter(reduce(lambda a, b: a | b, preds)))

    def sample(self, n_or_fraction: float, seed: int = 42) -> "MeerkatTable":
        """KQL `sample N` — N random rows. Exact-N and count-free:
        orderBy(rand).limit(N) compiles to TakeOrderedAndProject
        (per-partition top-N on the random key, tiny driver merge — no
        global sort, no pre-count). A float < 1 selects Spark's native
        Bernoulli fractional mode instead."""
        if n_or_fraction >= 1:
            return self._wrap(
                self.df.orderBy(F.rand(seed=seed)).limit(int(n_or_fraction))
            )
        return self._wrap(self.df.sample(fraction=n_or_fraction, seed=seed))

    def sample_distinct(self, n: int, col: str, seed: int = 42) -> "MeerkatTable":
        """KQL `sample-distinct N of Col` — exactly N (or all, if fewer
        exist) random distinct values of one column. Same exact-N shape
        as `sample`: distinct (one shuffle on the column) then
        TakeOrderedAndProject on a random key — count-free, no global
        sort."""
        return self._wrap(
            self.df.select(col).distinct().orderBy(F.rand(seed=seed)).limit(n)
        )

    def serialize(self, *orders: Column | str) -> "MeerkatTable":
        """KQL `serialize` — freeze row order (enables window funcs).
        Realized as an explicit orderBy; window operators in
        operators/window.py take the same order columns."""
        if orders:
            return self.sort(*orders, desc_default=False)
        return self

    def alias(self, name: str) -> "MeerkatTable":
        return self._wrap(self.df.alias(name))
