"""Percolator: reverse search — match a stream of documents against a
registry of standing queries.

Re-expresses the reference's percolator (/root/reference/percolator.h:19-86,
percolator.cpp:5-137: compile a query to an exec_node tree once, then
evaluate it against each document's term set — the Twitter predicate-index
pattern) as an idiomatic Ray Data stage: a stateful actor pool
(``map_batches(Percolator, concurrency=N)``) that parses/normalizes every
standing query ONCE in ``__init__`` and evaluates the compiled ASTs against
each tokenized document in ``__call__``.

Documents never shuffle; the (tiny) query registry ships once per actor.
This is the canonical broadcast-small-side shape: at 10^12 docs the stage
stays embarrassingly parallel.
"""

from __future__ import annotations

import pyarrow as pa

from trinity_ray.query.ast import (
    And,
    ConstFalse,
    MatchAll,
    MatchSome,
    Near,
    Node,
    Not,
    Optional_,
    Or,
    Phrase,
    Token,
    parse_query,
)
from trinity_ray.rayutil import actor_pool, package_runtime_env
from trinity_ray.tokenizer import MAX_POSITION, get_tokenizer


def match_doc(node: Node, term_pos: dict[str, list[int]]) -> bool:
    """Evaluate a compiled query AST against one document's term->positions
    map (the document_proxy term-set evaluation of percolator.cpp:44-137)."""
    if isinstance(node, ConstFalse):
        return False
    if isinstance(node, (MatchAll, Optional_)):
        return True
    if isinstance(node, Token):
        return node.term in term_pos
    if isinstance(node, Near):   # before Phrase: Near subclasses it
        poss = [term_pos.get(t) for t in dict.fromkeys(node.terms)]
        if any(p is None for p in poss):
            return False
        # anchor sweep: some term occurrence is the window's left edge
        return any(all(any(a <= q <= a + node.window for q in p)
                       for p in poss)
                   for anchor in poss for a in anchor)
    if isinstance(node, Phrase):
        first = term_pos.get(node.terms[0])
        if first is None:
            return False
        rest = [term_pos.get(t) for t in node.terms[1:]]
        if any(r is None for r in rest):
            return False
        rest_sets = [set(r) for r in rest]
        return any(all(p + i + 1 in s for i, s in enumerate(rest_sets))
                   for p in first)
    if isinstance(node, Not):
        return not match_doc(node.child, term_pos)
    if isinstance(node, And):
        positives = [c for c in node.children if not isinstance(c, (Not, Optional_))]
        negatives = [c.child for c in node.children if isinstance(c, Not)]
        return (all(match_doc(c, term_pos) for c in positives)
                and not any(match_doc(c, term_pos) for c in negatives))
    if isinstance(node, Or):
        return any(match_doc(c, term_pos) for c in node.children)
    if isinstance(node, MatchSome):
        n = sum(1 for c in node.children if match_doc(c, term_pos))
        return n >= node.min_match
    raise TypeError(f"unknown node {node!r}")


def trigger_terms(node: Node) -> frozenset[str] | None:
    """A conservative trigger-term set for a standing query: the query can
    only match a document containing AT LEAST ONE of these terms.  None
    means unconditional (must always be evaluated); an EMPTY set means the
    query can never match (ConstFalse).

    This is the predicate-grouping idea of the reference's group_execnodes
    (compilation_ctx.cpp:1760+): thousands of standing queries share an
    inverted term->queries map so a document only evaluates the queries
    whose trigger terms it contains — the Twitter percolator pattern.
    """
    if isinstance(node, Token):
        return frozenset((node.term,))
    if isinstance(node, Phrase):
        return frozenset((node.terms[0],))
    if isinstance(node, ConstFalse):
        return frozenset()
    if isinstance(node, And):
        # ANY positive child's trigger set suffices (all must match);
        # pick the smallest available
        cands = [trigger_terms(c) for c in node.children
                 if not isinstance(c, (Not, Optional_))]
        cands = [c for c in cands if c is not None]
        return min(cands, key=len) if cands else None
    if isinstance(node, (Or, MatchSome)):
        if isinstance(node, MatchSome) and node.min_match <= 0:
            return None
        subs = [trigger_terms(c) for c in node.children]
        if any(s is None for s in subs):
            return None
        return frozenset().union(*subs)
    # MatchAll / Not / Optional_: can match term-free docs
    return None


class Percolator:
    """Stateful map_batches stage: standing queries compiled once per actor
    (__init__), documents evaluated per batch (__call__).

    A shared term -> queries index (built from each query's trigger terms)
    makes per-doc cost proportional to the queries its terms could trigger,
    not the registry size — group_execnodes / compilation_ctx.cpp:1760+.

    Emits one row (id, query_name) per (document, matching query).
    """

    def __init__(self, queries: dict[str, str], tokenizer: str = "simple",
                 text_column: str = "text", id_column: str = "doc_id"):
        self.tokenize = get_tokenizer(tokenizer)
        self.plans: list[tuple[str, Node]] = [
            (name, parse_query(q, tokenizer)) for name, q in sorted(queries.items())
        ]
        self.text_column = text_column
        self.id_column = id_column
        # predicate index: trigger term -> query indices; queries with no
        # trigger set are evaluated for every doc
        self.always: list[int] = []
        self.by_term: dict[str, list[int]] = {}
        for qi, (_name, plan) in enumerate(self.plans):
            trig = trigger_terms(plan)
            if trig is None:
                self.always.append(qi)
            else:
                for t in trig:  # empty set (ConstFalse) indexes nowhere
                    self.by_term.setdefault(t, []).append(qi)

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column(self.id_column).to_pylist()
        texts = batch.column(self.text_column).to_pylist()
        out_ids, out_names = [], []
        for i, text in zip(ids, texts):
            toks = self.tokenize(text or "")[: MAX_POSITION - 1]
            term_pos: dict[str, list[int]] = {}
            for p, t in enumerate(toks, start=1):
                term_pos.setdefault(t, []).append(p)
            cand = set(self.always)
            for t in term_pos:
                qis = self.by_term.get(t)
                if qis:
                    cand.update(qis)
            for qi in sorted(cand):  # registry order == original output order
                name, plan = self.plans[qi]
                if match_doc(plan, term_pos):
                    out_ids.append(i)
                    out_names.append(name)
        return pa.table({
            self.id_column: pa.array(out_ids,
                                     batch.column(self.id_column).type),
            "query_name": pa.array(out_names, pa.string()),
        })


def percolate(ds, queries: dict[str, str], *, tokenizer: str = "simple",
              text_column: str = "text", id_column: str = "doc_id",
              batch_size: int = 1024, concurrency: int = 8):
    """(id, query_name) rows for every document matching a standing query."""
    return ds.map_batches(
        Percolator,
        fn_constructor_kwargs=dict(queries=queries, tokenizer=tokenizer,
                                   text_column=text_column,
                                   id_column=id_column),
        batch_format="pyarrow", batch_size=batch_size,
        concurrency=actor_pool(concurrency), runtime_env=package_runtime_env(),
    )
