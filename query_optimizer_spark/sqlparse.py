"""Mini SQL parser for JOB-shaped SPJA queries.

The reference parses SQL with Calcite (``planner.parse`` at
``QueryOptExperiment.java:640``) after a dialect rewrite
(``Query.java:53-69``: ``!=`` -> ``<>``, trailing ``;`` stripped).  We only
need the JOB / fixture query shape (SURVEY.md §1.2, §2.5):

    SELECT <agg-or-col list>
    FROM t1 a1, t2 a2, ...          (or ``t1 AS a1`` / bare ``t1``)
    WHERE conj AND conj AND ...
    [GROUP BY cols] [ORDER BY cols] [LIMIT n]

Conjuncts supported: ``a.x = b.y`` (equi-join), ``a.x <op> literal``,
``BETWEEN``, ``LIKE``, ``IN (...)``, ``IS [NOT] NULL``, and non-equi
cross-alias comparisons (kept as post-join filters, SURVEY §2.2-P4).

This is planner input only -- arbitrary SQL still runs through
``spark.sql`` untouched (SURVEY §2.5).
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

_AGG_FUNCS = {"min", "max", "sum", "count", "avg"}

# token spec: strings, numbers, identifiers/keywords, operators, punctuation
_TOKEN_RE = re.compile(
    r"""
    \s*(
        '(?:[^']|'')*'            # string literal
      | \d+\.\d+ | \.\d+ | \d+    # number
      | [A-Za-z_][A-Za-z_0-9]*(?:\.[A-Za-z_][A-Za-z_0-9]*)?   # ident or a.b
      | <= | >= | <> | != | = | < | > | \( | \) | , | \* | ;
    )
    """,
    re.VERBOSE,
)

_KEYWORDS = {
    "select", "from", "where", "and", "or", "as", "between", "like", "not",
    "in", "is", "null", "group", "order", "by", "limit", "date", "asc",
    "desc", "distinct", "left", "right", "full", "outer", "inner", "join",
    "on",
}


class ParseError(ValueError):
    pass


@dataclass(frozen=True)
class ColumnRef:
    alias: str
    column: str

    def __str__(self) -> str:
        return f"{self.alias}.{self.column}"


@dataclass(frozen=True)
class Literal:
    value: object  # int | float | str
    is_date: bool = False

    def sql(self) -> str:
        if isinstance(self.value, str):
            escaped = self.value.replace("'", "''")
            prefix = "DATE " if self.is_date else ""
            return f"{prefix}'{escaped}'"
        return repr(self.value)


@dataclass(frozen=True)
class Predicate:
    """A single-conjunct predicate.

    kind: 'cmp' (col op operand), 'between', 'like', 'in', 'isnull',
    'isnotnull'.  ``col`` is always a ColumnRef; ``operand`` is a Literal,
    a ColumnRef (join / cross-column compare), or a tuple for
    between/in.
    """

    kind: str
    col: ColumnRef
    op: str = ""
    operand: object = None

    @property
    def aliases(self) -> frozenset[str]:
        out = {self.col.alias}
        if isinstance(self.operand, ColumnRef):
            out.add(self.operand.alias)
        return frozenset(out)

    @property
    def is_equijoin(self) -> bool:
        return (
            self.kind == "cmp"
            and self.op == "="
            and isinstance(self.operand, ColumnRef)
            and self.operand.alias != self.col.alias
        )

    def normalized(self) -> str:
        """Canonical compact repr, used in cardinality-oracle keys
        (replaces the string surgery of ``MyUtils.getTableNameWithFilter``,
        ``MyUtils.java:143-192`` -- see SURVEY §2.2-P6 / §7 risk register)."""
        if self.kind == "cmp":
            rhs = (
                str(self.operand)
                if isinstance(self.operand, ColumnRef)
                else _lit_norm(self.operand)
            )
            return f"{self.col.column}{self.op}{rhs}"
        if self.kind == "between":
            lo, hi = self.operand
            return f"{self.col.column}between{_lit_norm(lo)},{_lit_norm(hi)}"
        if self.kind == "like":
            neg = "!" if self.op == "not" else ""
            return f"{self.col.column}{neg}like{_lit_norm(self.operand)}"
        if self.kind == "in":
            vals = ",".join(sorted(_lit_norm(v) for v in self.operand))
            neg = "!" if self.op == "not" else ""
            return f"{self.col.column}{neg}in({vals})"
        return f"{self.col.column}{self.kind}"

    def sql(self) -> str:
        """Render back to ANSI SQL (for DuckDB oracles and debugging)."""
        c = str(self.col)
        if self.kind == "cmp":
            rhs = (
                str(self.operand)
                if isinstance(self.operand, ColumnRef)
                else self.operand.sql()
            )
            return f"{c} {self.op} {rhs}"
        if self.kind == "between":
            lo, hi = self.operand
            return f"{c} BETWEEN {lo.sql()} AND {hi.sql()}"
        if self.kind == "like":
            neg = "NOT " if self.op == "not" else ""
            return f"{c} {neg}LIKE {self.operand.sql()}"
        if self.kind == "in":
            vals = ", ".join(v.sql() for v in self.operand)
            neg = "NOT " if self.op == "not" else ""
            return f"{c} {neg}IN ({vals})"
        if self.kind == "isnull":
            return f"{c} IS NULL"
        if self.kind == "isnotnull":
            return f"{c} IS NOT NULL"
        raise ParseError(f"unknown predicate kind {self.kind}")


def _lit_norm(lit: Literal) -> str:
    v = lit.value
    if isinstance(v, float) and v.is_integer():
        return str(int(v))
    return str(v)


@dataclass(frozen=True)
class SelectItem:
    """``MIN(a.x) AS name`` or plain ``a.x [AS name]``."""

    col: ColumnRef
    agg: str | None  # min/max/sum/count/avg or None
    name: str

    def sql(self) -> str:
        expr = f"{self.agg.upper()}({self.col})" if self.agg else str(self.col)
        return f"{expr} AS {self.name}"


@dataclass
class ParsedQuery:
    select: list[SelectItem]
    tables: list[tuple[str, str]]  # (table, alias) in FROM order
    join_preds: list[Predicate] = field(default_factory=list)
    filters: list[Predicate] = field(default_factory=list)  # single-alias
    post_join_filters: list[Predicate] = field(default_factory=list)
    group_by: list[ColumnRef] = field(default_factory=list)
    order_by: list[tuple[ColumnRef, str]] = field(default_factory=list)
    limit: int | None = None
    # J14: aliases joined via LEFT [OUTER] JOIN -- the null-generating
    # factors of the reference's MultiJoin (isNullGenerating).  A
    # null-rejecting WHERE predicate on such an alias simplifies the
    # outer join back to inner during parse (the standard rewrite), so
    # membership here means the outer semantics actually survive.
    null_generating: set[str] = field(default_factory=set)
    full_outer: bool = False  # 2-table FULL OUTER (ref addToTop :1231-1234)
    # single-alias conjuncts from an ON clause: same leaf placement as
    # WHERE filters (pre-filtering the null-generating input IS the ON
    # semantics) but they must NOT trigger outer-to-inner simplification
    # and render inside ON, not WHERE
    on_filters: list[Predicate] = field(default_factory=list)
    # equi-join conjuncts from an ON clause, keyed by the alias whose
    # JOIN clause introduced them.  Provenance matters twice: a WHERE
    # equijoin referencing a null-generating alias is null-rejecting and
    # must simplify the outer join to inner (an ON equijoin must not),
    # and outer-join removal must know WHOSE ON references a factor to
    # unwind chains in reverse.
    on_join_preds: dict[str, list[Predicate]] = field(default_factory=dict)

    @property
    def all_join_preds(self) -> list[Predicate]:
        return self.join_preds + [
            p for ps in self.on_join_preds.values() for p in ps
        ]

    @property
    def aliases(self) -> list[str]:
        return [a for _, a in self.tables]

    def filters_for(self, alias: str) -> list[Predicate]:
        return [
            p for p in self.filters + self.on_filters if p.col.alias == alias
        ]


def tokenize(sql: str) -> list[str]:
    sql = sql.strip()
    tokens: list[str] = []
    pos = 0
    while pos < len(sql):
        m = _TOKEN_RE.match(sql, pos)
        if not m:
            raise ParseError(f"cannot tokenize at: {sql[pos:pos + 30]!r}")
        tok = m.group(1)
        if tok != ";":
            tokens.append(tok)
        pos = m.end()
    return tokens


class _Parser:
    def __init__(self, tokens: list[str]):
        self.toks = tokens
        self.i = 0

    def peek(self) -> str | None:
        return self.toks[self.i] if self.i < len(self.toks) else None

    def peek_kw(self) -> str | None:
        t = self.peek()
        return t.lower() if t is not None else None

    def next(self) -> str:
        if self.i >= len(self.toks):
            raise ParseError("unexpected end of input")
        t = self.toks[self.i]
        self.i += 1
        return t

    def expect_kw(self, kw: str) -> None:
        t = self.next()
        if t.lower() != kw:
            raise ParseError(f"expected {kw!r}, got {t!r}")

    def accept_kw(self, kw: str) -> bool:
        if self.peek_kw() == kw:
            self.i += 1
            return True
        return False

    # --- literals / refs ------------------------------------------------
    def parse_literal(self) -> Literal:
        t = self.next()
        tl = t.lower()
        if tl == "date":
            s = self.next()
            if not s.startswith("'"):
                raise ParseError(f"expected date string, got {s!r}")
            return Literal(s[1:-1].replace("''", "'"), is_date=True)
        if t.startswith("'"):
            return Literal(t[1:-1].replace("''", "'"))
        try:
            if re.fullmatch(r"\d+", t):
                return Literal(int(t))
            return Literal(float(t))
        except ValueError:
            raise ParseError(f"expected literal, got {t!r}") from None

    def parse_colref(self) -> ColumnRef:
        t = self.next()
        if "." not in t or t.lower() in _KEYWORDS:
            raise ParseError(f"expected alias.column, got {t!r}")
        alias, col = t.split(".", 1)
        return ColumnRef(alias.lower(), col.lower())

    # --- clauses --------------------------------------------------------
    def parse(self) -> ParsedQuery:
        self.expect_kw("select")
        select = self.parse_select_list()
        self.expect_kw("from")
        tables = self.parse_from()
        q = ParsedQuery(select=select, tables=tables)
        alias_set = set(q.aliases)
        if len(alias_set) != len(q.aliases):
            raise ParseError("duplicate alias in FROM")
        self.parse_outer_joins(q, alias_set)
        if self.accept_kw("where"):
            for pred in self.parse_conjuncts():
                for a in pred.aliases:
                    if a not in alias_set:
                        raise ParseError(f"unknown alias {a!r} in predicate")
                if pred.is_equijoin:
                    q.join_preds.append(pred)
                elif len(pred.aliases) == 2:
                    q.post_join_filters.append(pred)
                else:
                    q.filters.append(pred)
        self.simplify_outer_joins(q)
        if self.accept_kw("group"):
            self.expect_kw("by")
            q.group_by.append(self.parse_colref())
            while self.accept_kw(","):
                q.group_by.append(self.parse_colref())
        if self.accept_kw("order"):
            self.expect_kw("by")
            while True:
                c = self.parse_colref()
                direction = "asc"
                if self.accept_kw("desc"):
                    direction = "desc"
                else:
                    self.accept_kw("asc")
                q.order_by.append((c, direction))
                if not self.accept_kw(","):
                    break
        if self.accept_kw("limit"):
            q.limit = int(self.next())
        if self.peek() is not None:
            raise ParseError(f"trailing tokens at {self.peek()!r}")
        # ORDER BY may only reference output columns: plain select items,
        # or group keys -- anything else would vanish under the final
        # projection/aggregation and fail at execution time
        visible = {(it.col.alias, it.col.column) for it in q.select if not it.agg}
        visible |= {(c.alias, c.column) for c in q.group_by}
        for c, _ in q.order_by:
            if (c.alias, c.column) not in visible:
                raise ParseError(
                    f"ORDER BY {c} does not reference a selected column "
                    "or group key"
                )
        return q

    def parse_select_list(self) -> list[SelectItem]:
        items: list[SelectItem] = []
        while True:
            t = self.peek()
            if t is None:
                raise ParseError("unexpected end in select list")
            if (
                t.lower() in _AGG_FUNCS
                and self.i + 1 < len(self.toks)
                and self.toks[self.i + 1] == "("
            ):
                agg = self.next().lower()
                self.expect_kw("(")
                col = self.parse_colref()
                self.expect_kw(")")
            else:
                agg = None
                col = self.parse_colref()
            if self.accept_kw("as"):
                name = self.next().lower()
            else:
                name = f"{agg}_{col.column}" if agg else col.column
            items.append(SelectItem(col=col, agg=agg, name=name))
            if not self.accept_kw(","):
                break
        return items

    def parse_from(self) -> list[tuple[str, str]]:
        tables: list[tuple[str, str]] = []
        while True:
            tables.append(self._parse_table_ref())
            if not self.accept_kw(","):
                break
        return tables

    def _parse_table_ref(self) -> tuple[str, str]:
        table = self.next().lower()
        nxt = self.peek()
        if self.accept_kw("as"):
            alias = self.next().lower()
        elif nxt is not None and nxt.lower() not in _KEYWORDS and nxt not in {",", "("}:
            alias = self.next().lower()
        else:
            alias = table
        return table, alias

    def parse_outer_joins(self, q: ParsedQuery, alias_set: set[str]) -> None:
        """``LEFT [OUTER] JOIN t [AS] a ON conj [AND conj]*`` clauses after
        the comma-list (J14 input).  ``FULL [OUTER] JOIN`` is accepted only
        in the 2-table form, matching the reference's assertion that a
        full-outer MultiJoin has exactly two factors (addToTop
        :1231-1234).  ON conjuncts route like WHERE conjuncts except that
        a single-alias conjunct must sit on the null-generating side
        (there it is equivalent to pre-filtering that input, which is how
        the executor runs it); on the preserved side it would change
        semantics, so it is rejected."""
        while self.peek_kw() in {"left", "full", "right", "inner"}:
            kind = self.next().lower()
            if kind == "right":
                raise ParseError("RIGHT JOIN unsupported: rewrite as LEFT")
            if kind == "inner":
                raise ParseError("INNER JOIN syntax unsupported: use FROM+WHERE")
            self.accept_kw("outer")
            self.expect_kw("join")
            table, alias = self._parse_table_ref()
            if alias in alias_set:
                raise ParseError(f"duplicate alias {alias!r} in FROM")
            q.tables.append((table, alias))
            alias_set.add(alias)
            if kind == "full":
                if len(q.tables) != 2 or q.null_generating:
                    raise ParseError("FULL OUTER JOIN requires exactly 2 tables")
                q.full_outer = True
                q.null_generating.update(a for _, a in q.tables)
            else:
                q.null_generating.add(alias)
            self.expect_kw("on")
            for pred in self.parse_conjuncts():
                for a in pred.aliases:
                    if a not in alias_set:
                        raise ParseError(f"unknown alias {a!r} in ON")
                if alias not in pred.aliases:
                    # an ON conjunct over only earlier tables has
                    # different semantics from both WHERE and the join
                    # condition of THIS join -- rejecting beats
                    # silently misrouting it
                    raise ParseError(
                        f"ON conjunct must reference {alias!r}"
                    )
                if pred.is_equijoin:
                    q.on_join_preds.setdefault(alias, []).append(pred)
                elif len(pred.aliases) == 1:
                    if kind == "full":
                        raise ParseError(
                            "single-alias ON conjunct unsupported in FULL JOIN"
                        )
                    if pred.col.alias != alias:
                        raise ParseError(
                            "ON filter must reference the null-generating side"
                        )
                    q.on_filters.append(pred)
                else:
                    raise ParseError("non-equi two-alias ON conjunct unsupported")

    def simplify_outer_joins(self, q: ParsedQuery) -> None:
        """Outer-to-inner simplification: a null-rejecting WHERE predicate
        on a null-generating alias filters out every null-extended row, so
        the outer join degenerates to inner (the rewrite Calcite runs
        before LoptOptimizeJoinRule ever sees the MultiJoin).  Every
        predicate kind except IS NULL is null-rejecting.  A 2-table FULL
        join simplifies side-by-side: one surviving side -> LEFT, none ->
        inner."""
        if not q.null_generating:
            return
        rejecting: set[str] = set()
        for p in q.filters:
            if p.kind != "isnull" and p.col.alias in q.null_generating:
                rejecting.add(p.col.alias)
        for p in q.post_join_filters:
            for a in p.aliases & q.null_generating:
                rejecting.add(a)
        # a WHERE equijoin touching an outer alias is null-rejecting too
        # (q.join_preds holds only WHERE-origin equijoins; ON-origin ones
        # live in q.on_join_preds and must NOT reject)
        for p in q.join_preds:
            for a in p.aliases & q.null_generating:
                rejecting.add(a)
        if rejecting:
            q.null_generating -= rejecting
            if q.full_outer and len(q.null_generating) < 2:
                q.full_outer = False
        # anti-join check AFTER simplification: IS NULL on an alias whose
        # join already degenerated to inner is an ordinary filter
        for p in q.filters:
            if p.kind == "isnull" and p.col.alias in q.null_generating:
                raise ParseError(
                    "IS NULL on an outer-joined alias (anti-join) unsupported"
                )

    def parse_conjuncts(self) -> list[Predicate]:
        preds = [self.parse_predicate()]
        while self.accept_kw("and"):
            preds.append(self.parse_predicate())
        if self.peek_kw() == "or":
            raise ParseError("OR not supported in planner input")
        return preds

    def parse_predicate(self) -> Predicate:
        col = self.parse_colref()
        t = self.next().lower()
        if t in {"=", "<>", "!=", "<", ">", "<=", ">="}:
            op = "<>" if t == "!=" else t  # dialect rewrite, Query.java:54
            nxt = self.peek()
            if nxt and "." in nxt and not nxt.startswith("'") and not re.match(r"[\d.]", nxt):
                return Predicate("cmp", col, op, self.parse_colref())
            return Predicate("cmp", col, op, self.parse_literal())
        if t == "between":
            lo = self.parse_literal()
            self.expect_kw("and")
            hi = self.parse_literal()
            return Predicate("between", col, "", (lo, hi))
        if t == "not":
            t2 = self.next().lower()
            if t2 == "like":
                return Predicate("like", col, "not", self.parse_literal())
            if t2 == "in":
                return Predicate("in", col, "not", self._parse_in_list())
            raise ParseError(f"unexpected NOT {t2!r}")
        if t == "like":
            return Predicate("like", col, "", self.parse_literal())
        if t == "in":
            return Predicate("in", col, "", self._parse_in_list())
        if t == "is":
            if self.accept_kw("not"):
                self.expect_kw("null")
                return Predicate("isnotnull", col)
            self.expect_kw("null")
            return Predicate("isnull", col)
        raise ParseError(f"unexpected operator {t!r}")

    def _parse_in_list(self) -> tuple[Literal, ...]:
        self.expect_kw("(")
        vals = [self.parse_literal()]
        while self.accept_kw(","):
            vals.append(self.parse_literal())
        self.expect_kw(")")
        return tuple(vals)


def parse(sql: str) -> ParsedQuery:
    """Parse a JOB-shaped SPJA query into a ParsedQuery."""
    return _Parser(tokenize(sql)).parse()
