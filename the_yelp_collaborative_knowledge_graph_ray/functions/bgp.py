"""SPARQL-style graph-pattern engine over the triple Dataset.

The reference queries its finished graph with SPARQL competency questions
(``Code/CompetencyQuestions/Yelp_CQ.md`` — every CQ is a basic graph
pattern plus aggregation). The engine's CQ analogs compile each question by
hand; this module is the GENERIC engine: a list of (s, p, o) triple
patterns with ``?var`` variables is planned as a chain of distributed
joins over the triples Dataset itself, so any BGP runs without bespoke
code. Surface:

* verbs — SELECT (:func:`bgp_match`), ASK (:func:`bgp_ask`), CONSTRUCT
  (:func:`bgp_construct`), DESCRIBE (a one-mask star filter, see
  ``queries._q_kg_describe``);
* clauses — OPTIONAL (left cogroup join), MINUS (anti mode), UNION
  (:func:`bgp_union`), FILTER / VALUES (vectorized binding masks);
* property paths (:func:`expand_paths`) — inverse ``^p``, sequence as a
  step tuple, alternation ``p|q`` (one ``is_in`` scan), transitive
  ``p+`` (scan over the path-doubling closure);
* planning — greedy selectivity join ordering (:func:`plan_order`) and
  :func:`bgp_explain` for the plan as a metadata table.

Execution model (Ray-Data-first):

* each pattern scans the triples ONCE with a vectorized constant filter
  (predicates are almost always bound, so the scan prunes to one
  predicate's rows) and projects the variable positions to columns;
* patterns join pairwise on their shared variables via
  :func:`cogroup_join` — the m:n generalization of
  ``joins.attach_column``: union both sides tagged, ONE sort on the join
  key colocates each key's rows, and the per-block cross product emits the
  matches (safe for the bounded fan-outs of graph patterns; a hot join key
  would need the salting machinery, documented below);
* the final projection dedups with one grouped count.

Join-key boundedness is the partitioning assumption (module contract the
brief asks to document): a single join-key value's rows on BOTH sides must
fit one block, the same per-key bound sessionize/attach_column already
carry. Star-joins on a celebrity node need key salting + two-phase
verify; the planner raises if a key group exceeds ``max_group``.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

_SEP = "\x1f"
_MARK = "__side"


def _is_var(term: str) -> bool:
    return term.startswith("?")


def cogroup_join(left: ray.data.Dataset, right: ray.data.Dataset,
                 on: list[str], left_cols: list[str], right_cols: list[str],
                 num_partitions: int | None = None,
                 max_group: int = 100_000,
                 how: str = "inner") -> ray.data.Dataset:
    """General m:n equi-join of two string-column Datasets.

    Both sides are tagged and unioned; ONE sort on the composite key
    colocates each key's rows; the per-block kernel emits the cross
    product per key fully vectorized (repeat/tile index arrays, one take
    per side). All columns are strings (IRI/literal bindings). Raises if
    one key's cross product exceeds ``max_group`` rows — the hot-key guard
    that keeps a pathological star pattern from silently OOMing a block.

    ``how="left"`` is the SPARQL OPTIONAL shape: left rows whose key has
    no right-side rows survive with right-only columns filled with ``""``
    (empty string stands in for SPARQL's unbound — the engine keeps join
    outputs null-free so the driver's value hash is engine-independent).

    ``how="anti"`` is the SPARQL MINUS shape: ONLY left rows whose key has
    no right-side rows survive, projected to the left columns (right-only
    columns are dropped — they exist only to express the excluded group).
    """
    if how not in ("inner", "left", "anti"):
        raise ValueError(f"cogroup_join: how={how!r}")
    lval = [c for c in left_cols if c not in on]
    rval = [c for c in right_cols if c not in on]
    out_cols = on + lval + ([] if how == "anti" else rval)
    schema = pa.schema([("__k", pa.string()), (_MARK, pa.bool_())] +
                       [(c, pa.string()) for c in on + lval + rval])

    def tag(cols_here, is_left):
        def f(b: pa.Table) -> pa.Table:
            n = b.num_rows
            key = (b[on[0]] if len(on) == 1 else
                   pc.binary_join_element_wise(
                       *[b[c] for c in on], _SEP))
            cols = {"__k": pc.cast(key, pa.string()),
                    _MARK: pa.nulls(n, pa.bool_()).fill_null(is_left)}
            for c in on + lval + rval:
                cols[c] = (pc.cast(b[c], pa.string()) if c in cols_here
                           else pa.nulls(n, pa.string()))
            return pa.table(cols, schema=schema)
        return f

    u = left.map_batches(tag(left_cols, True), batch_format="pyarrow") \
        .union(right.map_batches(tag(right_cols, False),
                                 batch_format="pyarrow"))
    out_schema = pa.schema([(c, pa.string()) for c in out_cols])

    def block(b: pa.Table) -> pa.Table:
        from .grouped import group_ids
        if b.num_rows == 0:
            return out_schema.empty_table()
        gid, starts = group_ids(b, ["__k"])
        mark = b[_MARK].combine_chunks().to_numpy(zero_copy_only=False)
        sizes = np.diff(np.append(starts, len(gid)))
        nl = np.zeros(len(sizes), np.int64)
        np.add.at(nl, gid[mark], 1)
        nr = sizes - nl
        prod = nl * nr
        if prod.max(initial=0) > max_group:
            raise ValueError(
                f"cogroup_join: key group cross product {prod.max()} > "
                f"max_group={max_group}; salt the hot key")
        unmatched = None
        if how in ("left", "anti"):
            # left rows whose group has no right rows: keep, fill rval ''
            li_nomatch = np.flatnonzero(mark & (nr[gid] == 0))
            if len(li_nomatch):
                lt = b.take(pa.array(li_nomatch))
                cols = {c: lt[c] for c in on + lval}
                fill = pa.nulls(len(li_nomatch), pa.string()).fill_null("")
                cols.update({c: fill for c in rval if how != "anti"})
                unmatched = pa.table(cols, schema=out_schema)
        if how == "anti":
            return (unmatched if unmatched is not None
                    else out_schema.empty_table())
        if prod.sum() == 0:
            return (unmatched if unmatched is not None
                    else out_schema.empty_table())
        # vectorized cross product: explicit index arrays per side
        li = np.flatnonzero(mark)
        ri = np.flatnonzero(~mark)
        lg, rg = gid[li], gid[ri]
        # offset of each group's first row within ri (rg is sorted)
        rstart = np.searchsorted(rg, np.arange(len(sizes)))
        # expand: for each left row, its group's right rows
        reps = nr[lg]
        lrep = np.repeat(li, reps)
        # right index: rstart[group of left row] + intra-group position
        base = np.repeat(rstart[lg], reps)
        intra = np.arange(reps.sum(), dtype=np.int64) - \
            np.repeat(np.concatenate([[0], np.cumsum(reps)[:-1]]), reps)
        rrep = ri[base + intra]
        lt = b.take(pa.array(lrep))
        rt = b.take(pa.array(rrep))
        cols = {c: lt[c] for c in on}
        cols.update({c: lt[c] for c in lval})
        cols.update({c: rt[c] for c in rval})
        matched = pa.table(cols, schema=out_schema)
        if unmatched is not None:
            return pa.concat_tables([matched, unmatched])
        return matched

    from .grouped import sorted_group_apply
    return sorted_group_apply(u, ["__k"], block, num_partitions)


def expand_paths(patterns: list[tuple[str, str, str]]
                 ) -> list[tuple[str, str, str]]:
    """Rewrite SPARQL property-path predicates into plain patterns.

    Supported path syntax in the predicate position (SPARQL 1.1 property
    paths, the subset that rewrites statically — ``p+`` transitive closure
    is the separate :mod:`..stages.enrich` closure operator):

    * sequence ``p/q`` — written as a TUPLE of steps ``("p", "q")``
      (full IRIs contain ``/``, so the SPARQL slash can't be split
      textually); a fresh intermediate variable joins each step;
    * inverse ``^p`` — a step with a leading ``^`` swaps subject/object;
    * alternation ``p|q`` — ``|`` inside a step, handled as an ``is_in``
      predicate filter in the scan (IRIs here never contain ``|``).
    """
    out, k = [], 0
    for s, p, o in patterns:
        if isinstance(p, str) and (_is_var(p) or not p.startswith("^")):
            out.append((s, p, o))
            continue
        steps = [p] if isinstance(p, str) else list(p)
        cur = s
        for i, step in enumerate(steps):
            if i == len(steps) - 1:
                nxt = o
            else:
                nxt = f"?__pp{k}"
                k += 1
            if step.startswith("^"):
                out.append((nxt, step[1:], cur))
            else:
                out.append((cur, step, nxt))
            cur = nxt
    return out


def _scan(triples: ray.data.Dataset, pat: tuple[str, str, str],
          num_partitions: int | None = None):
    """One vectorized scan of the triples for one pattern: constant terms
    filter (predicate alternation ``p|q`` becomes an ``is_in``), variable
    positions project to string columns named after the variables.

    A predicate ``p+`` (SPARQL one-or-more transitive path) scans the
    TRANSITIVE CLOSURE of p's edges instead of the raw triples: the
    closure is computed once by distributed path doubling
    (:func:`..functions.datalog.transitive_closure`, ⌈log₂ diameter⌉
    co-group rounds) and then filtered/projected exactly like a base
    scan — so p+ composes with every other pattern and modifier.

    ``p*`` (zero-or-more) is ``p+`` unioned with the identity relation
    over the nodes incident to p edges (the practical SPARQL-engine
    scoping of zero-length paths: terms that participate in p);
    ``p?`` (zero-or-one) is the base edges unioned with that identity —
    no closure needed."""
    s, p, o = pat
    plus = (not _is_var(p)) and p.endswith("+")
    star = (not _is_var(p)) and p.endswith("*")
    opt = (not _is_var(p)) and p.endswith("?")
    if (plus or star or opt) and "|" in p:
        raise ValueError("bgp_match: p|q and p+/p*/p? cannot combine "
                         "in one step")
    out = [(pos, t[1:]) for pos, t in zip("spo", (s, p, o))
           if _is_var(t)]
    consts = [(pos, t) for pos, t in zip("spo", (s, p, o))
              if not _is_var(t)]
    col_of = {"s": "subj", "p": "pred", "o": "obj"}
    names = [v for _, v in out]
    if len(set(names)) != len(names):
        raise ValueError("bgp_match: repeated variable in one pattern")

    source = triples
    if plus or star or opt:
        from .datalog import transitive_closure
        base = p[:-1]

        def edges(b: pa.Table) -> pa.Table:
            t = b.filter(pc.equal(b["pred"], base))
            return pa.table({"src": pc.cast(t["subj"], pa.string()),
                             "dst": pc.cast(t["obj"], pa.string())})

        e = triples.map_batches(edges, batch_format="pyarrow",
                                zero_copy_batch=True)
        clo = e if opt else transitive_closure(
            e, "src", "dst", num_partitions=num_partitions or 4)
        if star or opt:
            # zero-length paths: node ⟶ itself, for every incident node
            def ident(b: pa.Table) -> pa.Table:
                n = pa.concat_arrays(
                    [pc.cast(b["src"], pa.string()).combine_chunks(),
                     pc.cast(b["dst"], pa.string()).combine_chunks()])
                u = pc.unique(n)
                return pa.table({"src": u, "dst": u})
            clo = clo.union(e.map_batches(ident, batch_format="pyarrow"))
        source = clo.map_batches(
            lambda b: pa.table({
                "subj": b["src"],
                "pred": pa.nulls(b.num_rows, pa.string()).fill_null(p),
                "obj": b["dst"]}),
            batch_format="pyarrow")
        consts = [(pos, t) for pos, t in consts if pos != "p"]

    def f(b: pa.Table) -> pa.Table:
        m = None
        for pos, t in consts:
            if pos == "p" and t.startswith("!"):
                # negated property set !p / !(p|q): one inverted is_in scan
                body = t[1:]
                if body.startswith("(") and body.endswith(")"):
                    body = body[1:-1]
                eq = pc.invert(pc.is_in(
                    b[col_of[pos]], value_set=pa.array(body.split("|"))))
            elif pos == "p" and "|" in t:
                eq = pc.is_in(b[col_of[pos]],
                              value_set=pa.array(t.split("|")))
            else:
                eq = pc.equal(b[col_of[pos]], t)
            m = eq if m is None else pc.and_(m, eq)
        t2 = b.filter(m) if m is not None else b
        return pa.table({v: pc.cast(t2[col_of[pos]], pa.string())
                         for pos, v in out})
    return source.map_batches(f, batch_format="pyarrow",
                              zero_copy_batch=True), names


def _chain(triples, bindings, have, patterns, num_partitions, how, label):
    """Join each pattern's scan into the accumulated bindings."""
    for pat in patterns:
        nxt, names = _scan(triples, pat, num_partitions)
        shared = [v for v in names if v in have]
        if not shared:
            raise ValueError(f"bgp_match: {label} {pat} shares no variable "
                             "with the accumulated bindings")
        bindings = cogroup_join(bindings, nxt, shared, have, names,
                                num_partitions, how=how)
        if how != "anti":
            have = have + [v for v in names if v not in have]
    return bindings, have


def plan_order(patterns: list[tuple[str, str, str]]
               ) -> list[tuple[str, str, str]]:
    """Greedy selectivity join ordering for the required BGP chain.

    Inner joins commute, so the chain can start from the most selective
    pattern instead of whatever the user wrote first — on a big graph a
    leading ``(?t, ?p, ?x)`` full scan feeding a join is catastrophically
    worse than seeding from a constant-rich pattern and letting the join
    prune. Heuristic (no extra pass over the data): selectivity ≈ number
    of constant terms, predicate constants counting extra half (predicate
    scans prune hardest in practice); ties keep the user's order, so
    plans are deterministic. Only CONNECTED next-patterns are eligible —
    a graph that is connected in the user's order stays traversable from
    any seed, so the no-Cartesian-product guarantee is unchanged (a
    disconnected graph still reaches :func:`_chain`'s raise).
    """
    def score(p):
        s = sum(0 if _is_var(t) else 1 for t in p)
        return s * 2 + (0 if _is_var(p[1]) else 1)

    def vars_of(p):
        return {t[1:] for t in p if isinstance(t, str) and _is_var(t)}

    rem = list(range(len(patterns)))
    first = max(rem, key=lambda i: (score(patterns[i]), -i))
    out, bound = [first], set(vars_of(patterns[first]))
    rem.remove(first)
    while rem:
        cand = [i for i in rem if vars_of(patterns[i]) & bound]
        if not cand:  # disconnected — preserve order, _chain will raise
            out.extend(rem)
            break
        nxt = max(cand, key=lambda i: (score(patterns[i]), -i))
        out.append(nxt)
        bound |= vars_of(patterns[nxt])
        rem.remove(nxt)
    return [patterns[i] for i in out]


def bgp_bindings(triples: ray.data.Dataset,
                 patterns: list[tuple[str, str, str]],
                 num_partitions: int | None = None,
                 optional_patterns: list[tuple[str, str, str]] | None = None,
                 minus_patterns: list[tuple[str, str, str]] | None = None,
                 reorder: bool = True,
                 ) -> tuple[ray.data.Dataset, list[str]]:
    """The BGP planner core: returns (bindings Dataset, bound var names).

    Required ``patterns`` chain with inner cogroup joins (greedily
    reordered by :func:`plan_order` unless ``reorder=False``), then
    OPTIONAL clauses left-join, then MINUS clauses anti-join (SPARQL
    MINUS on the shared variables: a binding is dropped iff the minus
    pattern matches it) — OPTIONAL/MINUS keep the user's order, which is
    semantically load-bearing for left joins. All three accept property
    paths (:func:`expand_paths`).
    """
    patterns = expand_paths(patterns)
    if reorder:
        patterns = plan_order(patterns)
    bindings, have = _scan(triples, patterns[0], num_partitions)
    bindings, have = _chain(triples, bindings, have, patterns[1:],
                            num_partitions, "inner", "pattern")
    bindings, have = _chain(triples, bindings, have,
                            expand_paths(optional_patterns or []),
                            num_partitions, "left", "OPTIONAL")
    bindings, _ = _chain(triples, bindings, have,
                         expand_paths(minus_patterns or []),
                         num_partitions, "anti", "MINUS")
    return bindings, have


def bgp_match(triples: ray.data.Dataset,
              patterns: list[tuple[str, str, str]],
              select: list[str],
              num_partitions: int | None = None,
              optional_patterns: list[tuple[str, str, str]] | None = None,
              filters: list[tuple[str, str, str]] | None = None,
              values: dict[str, list[str]] | None = None,
              minus_patterns: list[tuple[str, str, str]] | None = None,
              reorder: bool = True,
              ) -> ray.data.Dataset:
    """Match a basic graph pattern; return DISTINCT rows of ``select`` vars.

    ``patterns`` are (s, p, o) terms; ``?name`` marks a variable, anything
    else is an IRI/literal constant matched exactly (the predicate position
    also accepts property paths — see :func:`expand_paths`). Patterns chain
    left-to-right; each must share >=1 variable with the bindings
    accumulated so far (no Cartesian products — the planner raises).

    ``optional_patterns`` are SPARQL ``OPTIONAL { ... }`` clauses, one
    pattern per clause, left-joined AFTER the required chain: bindings
    with no match keep their row and the clause's new variables bind to
    ``""`` (the engine's null-free stand-in for SPARQL unbound).

    ``minus_patterns`` are SPARQL ``MINUS { ... }`` clauses, one pattern
    per clause, anti-joined after OPTIONAL: a binding is dropped iff the
    clause matches it on its shared variables.

    ``filters`` are SPARQL ``FILTER`` terms ``(var, op, constant)`` with
    op ``"=="``/``"!="``; ``values`` is SPARQL ``VALUES`` inline data
    ``{var: [allowed, ...]}``. Both are vectorized masks applied to the
    bindings before the final distinct (a planner would push VALUES into
    the scans; semantics are identical, noted as the optimization hook).
    """
    bindings, have = bgp_bindings(triples, patterns, num_partitions,
                                  optional_patterns, minus_patterns,
                                  reorder=reorder)
    missing = [v for v in select if v not in have]
    if missing:
        raise ValueError(f"bgp_match: select vars {missing} unbound")

    if filters or values:
        unknown = ([v for v, _, _ in (filters or []) if v not in have] +
                   [v for v in (values or {}) if v not in have])
        if unknown:
            raise ValueError(f"bgp_match: FILTER/VALUES vars {unknown} "
                             "unbound")

        def apply_masks(b: pa.Table) -> pa.Table:
            m = None
            for var, op, const in (filters or []):
                if op == "==":
                    eq = pc.equal(b[var], const)
                elif op == "!=":
                    eq = pc.not_equal(b[var], const)
                else:
                    raise ValueError(f"bgp_match: FILTER op {op!r}")
                m = eq if m is None else pc.and_(m, eq)
            for var, allowed in (values or {}).items():
                inn = pc.is_in(b[var], value_set=pa.array(allowed))
                m = inn if m is None else pc.and_(m, inn)
            return b.filter(m)

        bindings = bindings.map_batches(apply_masks, batch_format="pyarrow",
                                        zero_copy_batch=True)
    from .grouped import grouped_count
    dd = grouped_count(bindings.map_batches(
        lambda b: b.select(select), batch_format="pyarrow",
        zero_copy_batch=True), select, "__n", num_partitions)
    return dd.map_batches(lambda b: b.select(select),
                          batch_format="pyarrow", zero_copy_batch=True)


def bgp_filter_exists(triples: ray.data.Dataset,
                      bindings: ray.data.Dataset,
                      pattern: tuple[str, str, str],
                      num_partitions: int | None = None,
                      negate: bool = False) -> ray.data.Dataset:
    """SPARQL ``FILTER EXISTS { pattern }`` / ``FILTER NOT EXISTS``:
    semi- (or anti-) join the bindings against the pattern's scan on
    their SHARED variables — no new variables bind (the difference from
    just chaining the pattern: multiplicity and the variable frame stay
    untouched). The pattern side collapses to its distinct shared-key
    rows first, so the inner co-group is 1:1 and cannot blow up a hot
    key."""
    from .grouped import grouped_count
    nxt, names = _scan(triples, pattern, num_partitions)
    have = bindings.schema().names
    shared = [v for v in names if v in have]
    if not shared:
        raise ValueError("bgp_filter_exists: pattern shares no variable "
                         "with the bindings")
    keys = grouped_count(nxt.map_batches(
        lambda b: b.select(shared), batch_format="pyarrow",
        zero_copy_batch=True), shared, "__n", num_partitions) \
        .map_batches(lambda b: b.select(shared), batch_format="pyarrow")
    return cogroup_join(bindings, keys, shared, list(have), shared,
                        num_partitions, how="anti" if negate else "inner")


def bgp_union(triples: ray.data.Dataset,
              groups: list[list[tuple[str, str, str]]],
              select: list[str],
              num_partitions: int | None = None) -> ray.data.Dataset:
    """SPARQL ``UNION``: match each pattern group independently, union the
    binding streams, and return ONE distinct over ``select``.

    Every group must bind all of ``select`` (SPARQL allows partial
    bindings; this engine's null-free contract requires full ones — use
    OPTIONAL inside a group for partially-bound shapes). The union is a
    zero-shuffle ``Dataset.union``; the single final distinct is the only
    all-to-all, shared across groups.
    """
    parts = []
    for pats in groups:
        bindings, have = bgp_bindings(triples, pats, num_partitions)
        missing = [v for v in select if v not in have]
        if missing:
            raise ValueError(f"bgp_union: group {pats} leaves {missing} "
                             "unbound")
        parts.append(bindings.map_batches(
            lambda b: b.select(select), batch_format="pyarrow",
            zero_copy_batch=True))
    u = parts[0]
    for p in parts[1:]:
        u = u.union(p)
    from .grouped import grouped_count
    dd = grouped_count(u, select, "__n", num_partitions)
    return dd.map_batches(lambda b: b.select(select),
                          batch_format="pyarrow", zero_copy_batch=True)


def bgp_construct(triples: ray.data.Dataset,
                  patterns: list[tuple[str, str, str]],
                  template: list[tuple[str, str, str]],
                  num_partitions: int | None = None) -> ray.data.Dataset:
    """SPARQL ``CONSTRUCT``: match ``patterns``, instantiate ``template``
    (s, p, o) terms per binding — ``?var`` substitutes the binding, any
    other term is emitted as a constant — and return the DISTINCT new
    triples as a (subj, pred, obj) Dataset ready to union into the graph.

    Mirrors the reference's graph-building step (its CQ file both queries
    and derives; ``Code/CompetencyQuestions/Yelp_CQ.md``) as a generic
    derived-triple operator: materialized inference rules, rollup edges,
    co-occurrence edges all phrase as one CONSTRUCT each.
    """
    need = sorted({t[1:] for pat in template for t in pat if _is_var(t)})
    dd = bgp_match(triples, patterns, need, num_partitions)

    def build(b: pa.Table) -> pa.Table:
        tabs = []
        for s, p, o in template:
            cols = {}
            for name, term in zip(("subj", "pred", "obj"), (s, p, o)):
                if _is_var(term):
                    cols[name] = pc.cast(b[term[1:]], pa.string())
                else:
                    cols[name] = pa.nulls(b.num_rows,
                                          pa.string()).fill_null(term)
            tabs.append(pa.table(cols))
        return pa.concat_tables(tabs)

    out = dd.map_batches(build, batch_format="pyarrow",
                         zero_copy_batch=True)
    if len(template) == 1:
        return out  # bindings were already distinct on exactly `need`
    from .grouped import grouped_count
    cols = ["subj", "pred", "obj"]
    dd2 = grouped_count(out, cols, "__n", num_partitions)
    return dd2.map_batches(lambda b: b.select(cols),
                           batch_format="pyarrow", zero_copy_batch=True)


def bgp_bind(bindings: ray.data.Dataset, out_var: str,
             fn) -> ray.data.Dataset:
    """SPARQL ``BIND(expr AS ?v)``: append a computed binding column.
    ``fn`` is a vectorized ``pa.Table -> pa.Array`` over the existing
    binding columns (the expression), applied per batch — BIND never
    shuffles, it composes with FILTER/GROUP/ORDER downstream exactly like
    a scanned variable."""
    def f(b: pa.Table) -> pa.Table:
        return b.append_column(out_var, fn(b))
    return bindings.map_batches(f, batch_format="pyarrow",
                                zero_copy_batch=True)


def bgp_ask(triples: ray.data.Dataset,
            patterns: list[tuple[str, str, str]],
            num_partitions: int | None = None) -> bool:
    """SPARQL ``ASK``: does at least one binding of ``patterns`` exist?

    Plans the same binding chain as :func:`bgp_match` but consumes it with
    ``limit(1)`` — the streaming executor stops the moment one row
    survives, so a hit on a 100 TB graph never runs the full scan."""
    bindings, _ = bgp_bindings(triples, patterns, num_partitions)
    return len(bindings.limit(1).take(1)) > 0


def bgp_explain(patterns: list[tuple[str, str, str]],
                optional_patterns: list[tuple[str, str, str]] | None = None,
                minus_patterns: list[tuple[str, str, str]] | None = None,
                reorder: bool = True) -> pa.Table:
    """EXPLAIN for a BGP: the plan as a table, one row per step —
    (step, clause, subj, pred, obj, n_consts) in execution order after
    path expansion and join-order planning. Pure metadata (no scan runs);
    the observability hook a user checks before paying for a big match."""
    req = expand_paths(patterns)
    if reorder:
        req = plan_order(req)
    rows = ([("required", p) for p in req]
            + [("optional", p) for p in expand_paths(optional_patterns
                                                     or [])]
            + [("minus", p) for p in expand_paths(minus_patterns or [])])

    def fmt(t):
        return t if isinstance(t, str) else "/".join(t)

    return pa.table({
        "step": pa.array(range(len(rows)), pa.int64()),
        "clause": pa.array([c for c, _ in rows], pa.string()),
        "subj": pa.array([fmt(p[0]) for _, p in rows], pa.string()),
        "pred": pa.array([fmt(p[1]) for _, p in rows], pa.string()),
        "obj": pa.array([fmt(p[2]) for _, p in rows], pa.string()),
        "n_consts": pa.array(
            [sum(0 if _is_var(t) else 1 for t in p) for _, p in rows],
            pa.int64())})
