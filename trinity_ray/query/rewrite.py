"""Query rewrite hook: synonym / spelling expansion over token runs.

The reference's rewrite framework (/root/reference/queries_rewrite.h:992-1089
``rewrite_query(flags, q, budget, K, lambda, rcb)``) walks each maximal
AND-run of tokens (queries.h:692-778 ``process_runs``), offers every K-gram
of the run to an application callback, and splices the returned alternatives
into an OR tree.  We keep the same seam, Pythonic:

    rewrite_query(node, k, callback, budget=...)

``callback(tokens: tuple[str, ...]) -> list[str]`` returns alternative
surface strings for a gram (empty/None = no alternatives).  A gram with
alternatives is replaced by ``Or(original, *alternatives)``.  A bare word
sequence parses to a Token (single term) or Phrase (multi term); an
alternative carrying query syntax — quotes, parens, ``|``, AND/OR/NOT,
``<optional>``, ``[k ...]`` — is parsed with the full query grammar the
way the reference hands every alternative to ast_parser
(queries_rewrite.h:370-376, 415, 463), with the reference's
translation-coefficient rule applied to the parsed subtree
(queries.cpp:1589-1647 set_rewrite_translation_coeff: token count over an
AND-only subtree; any other operator leaves tc at 1).

Longest-gram-first, non-overlapping, left-to-right — mirroring the
reference's preference for longer captures (queries_rewrite.h:217-260).
``budget`` caps the TOTAL number of spliced alternatives across the query
(the budget seam of the reference's optimal-OR-tree construction,
queries_rewrite.h:522-948 / trinity_limits.h): a callback fanning out
wider than the remaining budget has its lowest-weight alternatives pruned
before splice, so results degrade gracefully instead of the tree blowing
up.
"""

from __future__ import annotations

import dataclasses
import re
from typing import Callable, Sequence

from trinity_ray.query.ast import (
    And,
    MatchSome,
    Node,
    Not,
    Optional_,
    Or,
    Phrase,
    Token,
    _lex,
    _Parser,
    assign_query_indices,
    normalize,
)

# callback returns alternative surface strings, optionally weighted:
# "vector" or ("vector", 0.5).  Weight < 1 makes the synonym contribute
# proportionally less than the original (queries_rewrite.h lambda
# weighting / token-instance provenance, queries.h:312-492) — the weight
# rides on the Token/Phrase node and multiplies that term's idf.
RewriteCallback = Callable[
    [tuple[str, ...]], Sequence["str | tuple[str, float]"] | None]


# an alternative that uses query syntax (operators / grouping / quoting)
# is parsed with the full query grammar, exactly as the reference parses
# every alternative with ast_parser (queries_rewrite.h:370-376); bare
# word sequences keep the historical fast path (Token / Phrase).  The
# keywords must be WHITESPACE-delimited ("AND-GATE" is a term, not the
# operator — \b would trip on the hyphen and invert the parse)
_ALT_SYNTAX = re.compile(r'["()|<>\[\]“”]|(?<!\S)(?:AND|OR|NOT)(?!\S)')


def _parse_alt_query(text: str) -> Node:
    """Parse an operator-bearing alternative with the query grammar but a
    PASS-THROUGH tokenizer: terms from the callback are already normalized
    the way the index tokenizer would produce them (the module contract),
    so only structure — quotes, parens, |, AND/OR/NOT, <>, [k ...] — is
    interpreted; term text is preserved byte-for-byte.  A malformed
    alternative raises instead of silently truncating (the reference
    throws data_error on a failed alternative parse,
    queries_rewrite.h:372-373): unconsumed trailing tokens mean the
    grammar stopped early (e.g. a stray ')')."""
    items = _lex(text, lambda s: [s])
    parser = _Parser(items)
    node = parser.parse_expr()
    kind, val = parser.peek()
    if kind is not None:
        raise ValueError(
            f"rewrite alternative {text!r}: unparsed trailing input "
            f"from {val!r}")
    if not _has_leaf(node):
        raise ValueError(f"rewrite alternative {text!r} has no terms")
    return node


def _has_leaf(node: Node) -> bool:
    if isinstance(node, (Token, Phrase)):
        return True
    for f in dataclasses.fields(node):
        v = getattr(node, f.name)
        if isinstance(v, Node) and _has_leaf(v):
            return True
        if isinstance(v, tuple) and any(
                isinstance(c, Node) and _has_leaf(c) for c in v):
            return True
    return False


def _and_only_token_count(node: Node) -> int | None:
    """Token count of an AND-only subtree over Token/Phrase leaves, else
    None — the first walk of ast_node::set_rewrite_translation_coeff
    (queries.cpp:1589-1627): any operator other than AND/STRICT_AND makes
    the coefficient inapplicable (the reference returns without setting
    it, leaving every leaf at tc=1)."""
    if isinstance(node, Token):
        return 1
    if isinstance(node, Phrase):       # Near included (Phrase subclass)
        return len(node.terms)
    if isinstance(node, And):
        total = 0
        for c in node.children:
            sub = _and_only_token_count(c)
            if sub is None:
                return None
            total += sub
        return total
    return None


def _scale_leaf_weights(node: Node, f: float) -> Node:
    """Multiply every Token/Phrase leaf weight by ``f`` (the second walk of
    set_rewrite_translation_coeff, queries.cpp:1628-1646, generalized to
    descend all composite nodes so callback weight x src_weight still
    reach leaves under OR)."""
    if f == 1.0:
        return node
    if isinstance(node, (Token, Phrase)):
        return dataclasses.replace(node, weight=node.weight * f)
    if isinstance(node, (And, Or)):
        return type(node)(tuple(_scale_leaf_weights(c, f)
                                for c in node.children))
    if isinstance(node, Not):
        return Not(_scale_leaf_weights(node.child, f))
    if isinstance(node, Optional_):
        return Optional_(_scale_leaf_weights(node.child, f))
    if isinstance(node, MatchSome):
        return MatchSome(node.min_match,
                         tuple(_scale_leaf_weights(c, f)
                               for c in node.children))
    return node


def _node_weight(node: Node) -> float:
    """Prune key for the budget seam: leaf weight, or the max leaf weight
    of a composite alternative (its best-scoring branch)."""
    if isinstance(node, (Token, Phrase)):
        return node.weight
    best = 0.0
    if isinstance(node, (And, Or, MatchSome)):
        kids = node.children
    elif isinstance(node, (Not, Optional_)):
        kids = (node.child,)
    else:
        return best
    for c in kids:
        best = max(best, _node_weight(c))
    return best


def _alt_node(alt, src_len: int, src_weight: float = 1.0,
              default_weight: float = 1.0) -> Node:
    """An alternative surface string (optionally (text, weight)) -> Token
    or Phrase (terms are assumed already normalized the way the index
    tokenizer would produce them).

    The node weight is ``callback_weight x translationCoefficient x
    src_weight`` — the reference's rewrite_ctx algebra (queries.h:400-417,
    queries.cpp set_rewrite_translation_coeff): expanding a ``span``-token
    gram into a ``cnt``-token alternative stamps every alternative token
    with ``min(span, cnt) / max(span, cnt)`` ([cod] -> [call of duty] =
    1/3; [mac book] -> [macbook] = 1/2; equal-length rewrites = 1.0, so
    plain synonym splices are unaffected).  ``src_weight`` carries the
    source gram's own instance weight, so CHAINED rewrite passes compose
    coefficients multiplicatively (the nested multi-gram case,
    queries_rewrite.h:391/440/484 re-stamping through flow nesting)."""
    w = default_weight
    if isinstance(alt, tuple):
        alt, w = alt
    if _ALT_SYNTAX.search(alt):
        # operator-bearing alternative: full query grammar, reference
        # coefficient semantics — tc applies only when the parsed subtree
        # is AND-only (set_rewrite_translation_coeff's first-walk bailout
        # leaves OR-bearing alternatives at tc=1), while the callback
        # weight and the source gram's weight reach every leaf
        sub = _parse_alt_query(alt)
        cnt = _and_only_token_count(sub)
        tc = (min(src_len, cnt) / max(src_len, cnt)) if cnt else 1.0
        return _scale_leaf_weights(sub, float(w) * tc * float(src_weight))
    parts = tuple(p for p in alt.split() if p)
    if not parts:
        raise ValueError("empty rewrite alternative")
    tc = min(src_len, len(parts)) / max(src_len, len(parts))
    w = float(w) * tc * float(src_weight)
    if len(parts) == 1:
        return Token(parts[0], weight=w)
    return Phrase(parts, weight=w)


def _gram_node(gram: tuple[str, ...], weights: tuple[float, ...]) -> Node:
    """The ORIGINAL gram keeps its source instance weights (max over the
    run tokens for a phrase — collect_scorable_weights' max semantics)."""
    if len(gram) == 1:
        return Token(gram[0], weight=weights[0])
    return Phrase(gram, weight=max(weights))


def _rewrite_run(tokens: list[tuple[str, float]], k: int,
                 callback: RewriteCallback,
                 budget: list[int], alt_weight: float = 1.0) -> list[Node]:
    """Expand one AND-run of tokens; returns replacement child nodes.

    ``budget`` counts spliced ALTERNATIVES (the reference's budget-driven
    OR-tree construction, queries_rewrite.h:522-948, reduced to a pruning
    seam): when a callback fans out wider than the remaining budget, the
    lowest-weight alternatives are pruned before splice — highest weight
    wins, callback order breaks ties — so a 1000-synonym callback can
    never blow up the execution tree."""
    out: list[Node] = []
    i = 0
    n = len(tokens)
    while i < n:
        replaced = False
        if budget[0] > 0:
            for glen in range(min(k, n - i), 0, -1):  # longest gram first
                gram = tuple(t for t, _w in tokens[i:i + glen])
                gram_w = tuple(w for _t, w in tokens[i:i + glen])
                alts = callback(gram)
                if alts:
                    src_w = max(gram_w)
                    nodes = [_alt_node(a, len(gram), src_w, alt_weight)
                             for a in alts]
                    if len(nodes) > budget[0]:
                        # stable highest-weight-first prune to budget
                        order = sorted(range(len(nodes)),
                                       key=lambda j: -_node_weight(nodes[j]))
                        keep = set(order[:budget[0]])
                        nodes = [nd for j, nd in enumerate(nodes)
                                 if j in keep]
                    out.append(Or(tuple([_gram_node(gram, gram_w)] + nodes)))
                    budget[0] -= len(nodes)
                    i += glen
                    replaced = True
                    break
        if not replaced:
            term, w = tokens[i]
            out.append(Token(term, weight=w))
            i += 1
    return out


def rewrite_query(node: Node, k: int, callback: RewriteCallback,
                  budget: int = 64, alt_weight: float = 1.0,
                  geometry: list | None = None) -> Node:
    """Expand token runs with callback-provided alternatives (the
    queries_rewrite.h:992 entry point, AND-run walk per queries.h:692-778).
    ``alt_weight`` is the default scoring multiplier for alternatives whose
    callback didn't weight them explicitly (1.0 = score like originals).
    Returns a new normalized AST; the input is not modified.

    ``geometry``: optional list the rewrite fills with the rewritten
    query's index geometry — ``assign_query_indices`` over the REWRITTEN
    AST, exactly as the reference assigns indices after Query::rewrite
    (queries.cpp:1140-1249 runs post-rewrite, so spliced alternatives
    overlap their source gram's index range and phrase alternatives
    extend it via the longest-branch resume) — the rewrite_ctx
    provenance needed for sequence-aware scoring of rewritten queries
    (queries_rewrite.h:312-492); feed it to
    ``search_sequence(index_terms=...)``, or rely on the identical
    search_sequence default."""
    state = [budget]
    rewritten = normalize(_walk(node, k, callback, state, alt_weight))
    if geometry is not None:
        geometry[:] = assign_query_indices(rewritten)
    return rewritten


def _walk(node: Node, k: int, callback: RewriteCallback,
          budget: list[int], alt_weight: float = 1.0) -> Node:
    if isinstance(node, And):
        new_children: list[Node] = []
        run: list[tuple[str, float]] = []

        def flush() -> None:
            if run:
                new_children.extend(_rewrite_run(run, k, callback, budget,
                                                 alt_weight))
                run.clear()

        for c in node.children:
            if isinstance(c, Token):
                # contiguous token run (process_runs); instance weight
                # rides along so chained rewrites compose coefficients
                run.append((c.term, c.weight))
            else:
                flush()
                new_children.append(_walk(c, k, callback, budget, alt_weight))
        flush()
        return And(tuple(new_children))
    if isinstance(node, Or):
        return Or(tuple(_walk(c, k, callback, budget, alt_weight)
                        for c in node.children))
    if isinstance(node, Not):
        return Not(_walk(node.child, k, callback, budget, alt_weight))
    if isinstance(node, Optional_):
        return Optional_(_walk(node.child, k, callback, budget, alt_weight))
    if isinstance(node, MatchSome):
        return MatchSome(node.min_match,
                         tuple(_walk(c, k, callback, budget, alt_weight)
                               for c in node.children))
    if isinstance(node, Token):
        # a lone token is a run of one
        return _rewrite_run([(node.term, node.weight)], k, callback,
                            budget, alt_weight)[0]
    return node
