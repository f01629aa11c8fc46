"""Join-removal rewrites (J11/J12).

Re-implements the removability analyses of ``MyLoptOptimizeJoinRule``:

- ``remove_redundant_outer_joins`` -- findRemovableOuterJoins (:157-263):
  a null-generating factor can be dropped entirely when nothing projects
  its columns and its join keys are unique, because a LEFT join against
  a unique key matches each preserved row at most once and therefore
  never changes the preserved side's rows.
- ``remove_redundant_self_joins``  -- findRemovableSelfJoins (:314-368)
  + isSelfJoinFilterUnique (:372-410): two factors over the SAME base
  table equi-joined on a unique key are the same row twice; the pair
  collapses to one scan with the second alias's references remapped to
  the first (the reference does the equivalent column remapping in
  createReplacementJoin :1606-1688).

Both rewrites are result-invariant; the driver-gate fixtures prove it by
hashing the rewritten Spark plan against a DuckDB oracle that still runs
the UN-rewritten SQL.

The reference runs these inside its Calcite rule before ordering; here
they are graph/query transforms applied before planning, which keeps
every planner unaware of them -- the Spark-first shape of the same idea.
"""

from __future__ import annotations

from dataclasses import replace

from .joingraph import Edge, JoinGraph, bits, popcount
from .sqlparse import ColumnRef, ParsedQuery, Predicate, SelectItem


def _output_aliases(q: ParsedQuery | None) -> set[str]:
    """Aliases whose columns survive into the query output or post-join
    filtering (the reference's getProjFields / joinFieldRefCounts
    check)."""
    if q is None:
        return set()
    refs = {it.col.alias for it in q.select}
    refs |= {c.alias for c in q.group_by}
    refs |= {c.alias for c, _ in q.order_by}
    for p in q.post_join_filters:
        refs |= set(p.aliases)
    return refs


def _side_columns(graph: JoinGraph, factor: int, edges: list[Edge]) -> set[str]:
    """Equi-join columns on ``factor``'s side across ``edges``."""
    alias = graph.aliases[factor]
    cols: set[str] = set()
    for e in edges:
        for p in e.preds:
            if not p.is_equijoin:
                continue
            if p.col.alias == alias:
                cols.add(p.col.column)
            elif getattr(p.operand, "alias", None) == alias:
                cols.add(p.operand.column)
    return cols


def _keys_unique(graph: JoinGraph, oracle, factor: int, cols: set[str]) -> bool:
    """Null-aware uniqueness proof: distinct NON-NULL key tuples ==
    table rows establishes both (a) no row carries a NULL in any key
    column and (b) no two rows share a key -- together, an equi-join on
    the key matches every base row exactly once, which is what both
    removals (J11/J12) require.

    Single-column keys use plain count(DISTINCT k): SQL already ignores
    NULL there, so it IS the non-null distinct count.  Multi-column keys
    need the explicit non-null form because count(DISTINCT (a, b))
    counts NULL-bearing tuples (a struct with a NULL field is not NULL)
    while join equality drops them (the reference proves composite keys
    the same way -- areSelfJoinKeysUnique,
    MyLoptOptimizeJoinRule.java:2080-2109).  Oracles lacking the
    metadata decline conservatively."""
    alias = graph.aliases[factor]
    try:
        if len(cols) == 1:
            distinct = oracle.distinct_count(graph, alias, tuple(cols))
        else:
            distinct = oracle.nonnull_distinct_count(
                graph, alias, tuple(sorted(cols))
            )
        total = oracle.table_rows(graph, alias)
    except Exception:
        return False
    return distinct == total


def remove_redundant_outer_joins(graph: JoinGraph, oracle) -> JoinGraph:
    """Drop removable null-generating factors (J11).

    A factor g is removable when (a) no output/group/order/post-filter
    references it, (b) every edge of g goes to a non-null-generating
    factor (i.e. no OTHER outer join's ON references g -- the alias-level
    analog of the reference's joinFieldRefCounts bookkeeping), and
    (c) g's equi-join key columns are unique in its base table.  Loops to
    a fixpoint so chains unwind in reverse, reproducing the reference's
    retryCandidates pass (:167-169, :244-258)."""
    out_refs = _output_aliases(graph.query)
    q = graph.query
    on_preds = getattr(q, "on_join_preds", {}) if q is not None else {}
    removed = 0
    changed = True
    while changed:
        changed = False
        ng = graph.null_generating & ~removed
        for g in bits(ng):
            alias = graph.aliases[g]
            if alias in out_refs:
                continue
            # blocked while ANOTHER live null-generating factor's OWN
            # ON clause references g (its removal may unblock g -- the
            # retryCandidates loop); g's own ON referencing other
            # factors never blocks g
            blocked = False
            for h in bits(ng & ~(1 << g)):
                h_alias = graph.aliases[h]
                for p in on_preds.get(h_alias, []):
                    if alias in p.aliases:
                        blocked = True
                        break
                if blocked:
                    break
            if blocked:
                continue
            edges = [
                e
                for e in graph.edges
                if e.factors & (1 << g) and not (e.factors & removed)
            ]
            cols = _side_columns(graph, g, edges)
            if not cols:
                continue
            if _keys_unique(graph, oracle, g, cols):
                removed |= 1 << g
                changed = True
    if not removed:
        return graph
    return _drop_factors(graph, removed)


def _drop_factors(graph: JoinGraph, removed: int) -> JoinGraph:
    keep = [i for i in range(graph.n) if not (removed & (1 << i))]
    remap = {old: new for new, old in enumerate(keep)}
    aliases = [graph.aliases[i] for i in keep]
    edges = []
    for e in graph.edges:
        if e.factors & removed:
            continue
        f = 0
        for i in bits(e.factors):
            f |= 1 << remap[i]
        edges.append(Edge(f, e.preds))
    null_gen = 0
    for i in bits(graph.null_generating & ~removed):
        null_gen |= 1 << remap[i]
    return JoinGraph(
        aliases=aliases,
        tables={a: graph.tables[a] for a in aliases},
        filters={a: graph.filters.get(a, ()) for a in aliases},
        edges=edges,
        post_join_filters=graph.post_join_filters,
        query=graph.query,
        null_generating=null_gen,
        full_outer=False,
    )


# --- self-join removal (J12) -------------------------------------------------


def _remap_col(c: ColumnRef, merge: dict[str, str]) -> ColumnRef:
    return ColumnRef(merge.get(c.alias, c.alias), c.column) if c.alias in merge else c


def _remap_pred(p: Predicate, merge: dict[str, str]) -> Predicate:
    col = _remap_col(p.col, merge)
    operand = p.operand
    if isinstance(operand, ColumnRef):
        operand = _remap_col(operand, merge)
    return replace(p, col=col, operand=operand)


def remove_redundant_self_joins(q: ParsedQuery, graph: JoinGraph, oracle) -> ParsedQuery:
    """Collapse removable self-join pairs (J12) at the query level.

    Candidate pairs are two aliases over the same base table (simple
    factors -- every factor here is a base scan, getSimpleFactors
    :383-402) whose connecting edge consists solely of same-column
    equi-joins (a.k = b.k) on a unique key (isSelfJoinFilterUnique
    :372-410).  Such a join matches each row with itself exactly once,
    so the pair is one scan: the second alias's references remap to the
    first, filters merge, and the self edge disappears.  Returns a new
    ParsedQuery (unchanged input -> same object)."""
    merge: dict[str, str] = {}  # dropped alias -> surviving alias
    by_idx = {a: i for i, a in enumerate(graph.aliases)}
    used = set()
    for i, a1 in enumerate(graph.aliases):
        for a2 in graph.aliases[i + 1:]:
            if a1 in used or a2 in used or a1 in merge or a2 in merge:
                continue
            if graph.tables[a1] != graph.tables[a2]:
                continue
            if (1 << by_idx[a1]) & graph.null_generating or (
                1 << by_idx[a2]
            ) & graph.null_generating:
                continue
            edges = graph.edges_between(1 << by_idx[a1], 1 << by_idx[a2])
            if not edges:
                continue
            preds = [p for e in edges for p in e.preds]
            cols = set()
            ok = True
            for p in preds:
                if not p.is_equijoin or p.col.column != p.operand.column:
                    ok = False
                    break
                cols.add(p.col.column)
            if not ok or not cols:
                continue
            if _keys_unique(graph, oracle, by_idx[a1], cols):
                merge[a2] = a1
                used.add(a1)
    if not merge:
        return q
    survivors = set(merge.values())
    new_tables = [(t, a) for t, a in q.tables if a not in merge]
    new_select = [
        SelectItem(_remap_col(it.col, merge), it.agg, it.name)
        for it in q.select
    ]
    new_join_preds = []
    for p in q.join_preds:
        rp = _remap_pred(p, merge)
        if rp.is_equijoin:
            new_join_preds.append(rp)
        # a.k = a.k after remap: the removed self edge, drop it
    new_filters = [_remap_pred(p, merge) for p in q.filters]
    new_post = [_remap_pred(p, merge) for p in q.post_join_filters]
    return ParsedQuery(
        select=new_select,
        tables=new_tables,
        join_preds=new_join_preds,
        filters=new_filters,
        post_join_filters=new_post,
        group_by=[_remap_col(c, merge) for c in q.group_by],
        order_by=[(_remap_col(c, merge), d) for c, d in q.order_by],
        limit=q.limit,
        null_generating=set(q.null_generating),
        full_outer=q.full_outer,
        on_filters=[_remap_pred(p, merge) for p in q.on_filters],
        on_join_preds={
            a: [_remap_pred(p, merge) for p in ps]
            for a, ps in q.on_join_preds.items()
        },
    )


def simplify(q: ParsedQuery, oracle) -> JoinGraph:
    """Run both removal rewrites and return the planning-ready graph:
    self-join collapse at the query level, then outer-join removal on the
    rebuilt graph (the reference runs both analyses up front in onMatch
    :96-117)."""
    graph = JoinGraph.from_query(q)
    q2 = remove_redundant_self_joins(q, graph, oracle)
    if q2 is not q:
        graph = JoinGraph.from_query(q2)
    return remove_redundant_outer_joins(graph, oracle)
