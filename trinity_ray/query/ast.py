"""Query AST, parser and normalizer.

The reference models a query as an AST over {BinOp{AND, STRICT_AND, OR, NOT},
Token, Phrase, UnaryOp, ConstFalse, ConstTrueExpr, MatchSome}
(/root/reference/queries.h:10-16, 36-202), parsed by an operator-precedence
recursive-descent parser (queries.cpp:30-538; priorities AND=NOT=8 > OR=7,
queries.cpp:11-28) and canonicalized by a normalization fixpoint
(normalize_root, queries.cpp:553-1343).

Ours is n-ary (And/Or hold child lists) because batch set-evaluation doesn't
need binary trees.  Supported syntax::

    a b c            implicit AND
    a AND b          explicit AND (STRICT_AND folds to the same node)
    a OR b, a | b    OR
    a NOT b, a -b    AND-NOT
    "a b c"          phrase (adjacent positions; MaxPhraseSize=16,
                     trinity_limits.h:12 — longer phrases are truncated)
    ( ... )          grouping
    < ... >          ConstTrueExpr: always matches, contributes to score
                     (queries.h:76-89)
    [k a b c]        MatchSome: match >= k of the subexpressions
                     (queries.h:91-96; the reference builds these
                     programmatically — we give them a surface syntax)

Query terms go through the SAME tokenizer as documents (parser-parity
requirement, queries.h:246-247).  A parsed query with no positive,
satisfiable component normalizes to ConstFalse.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from typing import Callable, Iterator

from trinity_ray.tokenizer import TOKEN_RE, get_tokenizer

MAX_PHRASE_SIZE = 16  # trinity_limits.h:12
MAX_QUERY_TOKENS = 32  # trinity_limits.h:5-13 (query::trim, queries.cpp:1503-1525)


class Node:
    __slots__ = ()


@dataclass(frozen=True)
class Token(Node):
    term: str
    # rewrite provenance (queries.h:312-492 token_instance flags reduced to
    # a scoring multiplier): 1.0 = original query token; rewrites may tag
    # synonym/spelling alternatives with a lower weight so originals
    # outrank their expansions (queries_rewrite.h lambda weighting)
    weight: float = 1.0


@dataclass(frozen=True)
class Phrase(Node):
    terms: tuple[str, ...]
    weight: float = 1.0


@dataclass(frozen=True)
class Near(Phrase):
    """Unordered proximity: all ``terms`` occur with position span <=
    ``window`` (max chosen position - min chosen position).  ``window=0``
    degenerates to same-position (never true for distinct tokens);
    Phrase is the ORDERED adjacent special case.  The reference evaluates
    proximity through its span framework (docset_spans.h window drive
    loops); here it is a leaf with its own positional verifier.

    Subclasses Phrase deliberately: every term-collection / trim /
    geometry visitor treats Near exactly like a phrase (same terms, same
    weight semantics); only the executor dispatches on the subtype.
    ``window`` is keyword-only: positionally it would land on the
    inherited ``weight`` field."""
    window: int = field(default=1, kw_only=True)


@dataclass(frozen=True)
class Fuzzy(Token):
    """Typo-tolerant leaf: matches any dictionary term within Levenshtein
    distance 1 of ``term``.  Needs dictionary state to expand, so the
    searcher entry points rewrite it to ``Or(Token(exact, w), Token(
    neighbor, 0.5*w), ...)`` via the SymSpell deletion index
    (search.expand_fuzzy); the 0.5 multiplier is the same
    original-outranks-expansion convention as rewrite provenance weights
    (queries_rewrite.h lambda weighting).

    Subclasses Token deliberately: every visitor (normalize / trim /
    term collection / weights) treats an UNEXPANDED Fuzzy as the exact
    term — so a context without an index (percolator parse checks,
    oracles over raw ASTs) degrades to exact match instead of erroring."""


@dataclass(frozen=True)
class Prefix(Token):
    """Prefix leaf: matches any dictionary term starting with ``term``
    (``[prefix sca]`` → SCAN, SCALE, …).  Like :class:`Fuzzy` it needs
    dictionary state to expand, so searcher entry points rewrite it to
    the OR of its completions (all at the leaf's own weight — a
    completion IS the intended term, unlike fuzzy's half-weight typo
    neighbors) via the sorted-dictionary range scan behind suggest_terms.

    Subclasses Token deliberately (same degrade contract as Fuzzy): an
    UNEXPANDED Prefix behaves as the exact term in index-less contexts."""


@dataclass(frozen=True)
class And(Node):
    children: tuple[Node, ...]


@dataclass(frozen=True)
class Or(Node):
    children: tuple[Node, ...]


@dataclass(frozen=True)
class Not(Node):
    """Negation; meaningful inside And (anti-join) — queries.h BinOp NOT."""

    child: Node


@dataclass(frozen=True)
class Optional_(Node):
    """ConstTrueExpr: matches everything, child only contributes to score."""

    child: Node


@dataclass(frozen=True)
class MatchSome(Node):
    min_match: int
    children: tuple[Node, ...]


@dataclass(frozen=True)
class ConstFalse(Node):
    pass


@dataclass(frozen=True)
class MatchAll(Node):
    pass


CONST_FALSE = ConstFalse()
MATCH_ALL = MatchAll()


# ---------------------------------------------------------------------------
# lexer
# ---------------------------------------------------------------------------

_LEX = re.compile(
    rf"(?P<tok>{TOKEN_RE.pattern})|(?P<sy>[\"()|<>\[\]“”-])",
    re.X,
)

_KEYWORDS = {"AND", "OR", "NOT"}


def _lex(text: str, tokenize: Callable[[str], list[str]]) -> list[tuple[str, object]]:
    """Yield (kind, value): kind in {'term','phrase_term','sy','kw'}."""
    out: list[tuple[str, object]] = []
    for m in _LEX.finditer(text):
        if m.lastgroup == "sy":
            ch = m.group()
            if ch in "“”":
                ch = '"'
            out.append(("sy", ch))
        else:
            toks = tokenize(m.group())  # normalizes exactly like documents
            for t in toks:
                if t in _KEYWORDS:
                    out.append(("kw", t))
                else:
                    out.append(("term", t))
    return out


# ---------------------------------------------------------------------------
# parser (recursive descent, AND > OR — queries.cpp:11-28)
# ---------------------------------------------------------------------------

class _Parser:
    def __init__(self, items: list[tuple[str, object]]):
        self.items = items
        self.i = 0

    def peek(self):
        return self.items[self.i] if self.i < len(self.items) else (None, None)

    def next(self):
        it = self.peek()
        self.i += 1
        return it

    def parse_expr(self) -> Node:
        return self.parse_or()

    def parse_or(self) -> Node:
        children = [self.parse_and()]
        while True:
            kind, val = self.peek()
            if (kind == "kw" and val == "OR") or (kind == "sy" and val == "|"):
                self.next()
                children.append(self.parse_and())
            else:
                break
        return Or(tuple(children)) if len(children) > 1 else children[0]

    def parse_and(self) -> Node:
        children: list[Node] = []
        while True:
            kind, val = self.peek()
            if kind is None:
                break
            if kind == "kw" and val == "AND":
                self.next()
                continue
            if kind == "kw" and val == "NOT":
                self.next()
                children.append(Not(self.parse_unary()))
                continue
            if (kind == "kw" and val == "OR") or (kind == "sy" and val in ")|>]"):
                break
            children.append(self.parse_unary())
        if not children:
            return MATCH_ALL
        return And(tuple(children)) if len(children) > 1 else children[0]

    def parse_unary(self) -> Node:
        kind, val = self.next()
        if kind == "sy":
            if val == "-":
                return Not(self.parse_unary())
            if val == "(":
                node = self.parse_expr()
                self._expect(")")
                return node
            if val == "<":
                node = self.parse_expr()
                self._expect(">")
                return Optional_(node)
            if val == '"':
                terms: list[str] = []
                while True:
                    k, v = self.peek()
                    if k is None:
                        break
                    self.next()
                    if k == "sy" and v == '"':
                        break
                    if k in ("term", "kw"):
                        terms.append(str(v))
                terms = terms[:MAX_PHRASE_SIZE]
                if not terms:
                    return MATCH_ALL  # empty phrase is a no-op ("")
                if len(terms) == 1:
                    return Token(terms[0])
                return Phrase(tuple(terms))
            if val == "[":
                # [k expr expr ...] — first bare numeric term is min_match;
                # [near w t1 t2 ...] — unordered proximity within w positions
                # (the leading literal NEAR selects the mode; a MatchSome
                # over the literal term "near" needs an explicit count:
                # [1 near far])
                # [fuzzy t1 t2 ...] — typo-tolerant terms (edit distance 1),
                # AND-combined; same leading-literal convention ([1 fuzzy
                # logic] match-somes the literal term "fuzzy")
                parts: list[Node] = []
                min_match = 1
                near_window: int | None = None
                fuzzy_mode = False
                prefix_mode = False
                window_taken = False
                first = True
                while True:
                    k, v = self.peek()
                    if k is None:
                        break
                    if k == "sy" and v == "]":
                        self.next()
                        break
                    sub = self.parse_unary()
                    if first and isinstance(sub, Token) and sub.term == "NEAR":
                        near_window = 1
                    elif first and isinstance(sub, Token) \
                            and sub.term == "FUZZY":
                        fuzzy_mode = True
                    elif first and isinstance(sub, Token) \
                            and sub.term == "PREFIX":
                        prefix_mode = True
                    elif isinstance(sub, Token) and str(sub.term).isdigit() \
                            and (first or (near_window is not None
                                           and not window_taken
                                           and not parts)):
                        # exactly ONE leading numeric is the window /
                        # min_match spec; later numerics are search terms
                        if near_window is not None:
                            # clamp at parse time: exec's _match_near
                            # rejects window >= MAX_POSITION, and a
                            # syntactically valid query string must not
                            # surface as a match-time ValueError inside
                            # remote search actors (ADVICE r4)
                            from trinity_ray.tokenizer import MAX_POSITION
                            near_window = min(max(1, int(sub.term)),
                                              MAX_POSITION - 1)
                            window_taken = True
                        else:
                            min_match = max(1, int(sub.term))
                    else:
                        parts.append(sub)
                    first = False
                if not parts:
                    return MATCH_ALL
                # "plain terms only" means the exact Token class: a nested
                # Fuzzy/Prefix must error, not silently lose its semantics
                # (Prefix IS a Token subclass, so isinstance is too loose)
                if fuzzy_mode:
                    if any(type(t) is not Token for t in parts):
                        raise ValueError("[fuzzy ...] takes plain terms only")
                    fz = [Fuzzy(t.term) for t in parts]
                    return fz[0] if len(fz) == 1 else And(tuple(fz))
                if prefix_mode:
                    if any(type(t) is not Token for t in parts):
                        raise ValueError(
                            "[prefix ...] takes plain terms only")
                    pz = [Prefix(t.term) for t in parts]
                    return pz[0] if len(pz) == 1 else And(tuple(pz))
                if near_window is not None:
                    terms = tuple(t.term for t in parts
                                  if type(t) is Token)
                    if len(terms) != len(parts) or not terms:
                        raise ValueError(
                            "[near w ...] takes plain terms only")
                    if len(terms) == 1:
                        return Token(terms[0])
                    return Near(terms, window=near_window)
                return MatchSome(min_match, tuple(parts))
            # stray syntax char: skip
            return MATCH_ALL
        if kind in ("term", "kw"):
            return Token(str(val))
        return MATCH_ALL

    def _expect(self, ch: str) -> None:
        kind, val = self.peek()
        if kind == "sy" and val == ch:
            self.next()


def parse_query(text: str, tokenizer: str = "trinity") -> Node:
    """Parse + normalize a query string."""
    items = _lex(text, get_tokenizer(tokenizer))
    node = _Parser(items).parse_expr()
    return normalize(trim(node))


# ---------------------------------------------------------------------------
# normalization fixpoint (normalize_root analogue, queries.cpp:553-1343)
# ---------------------------------------------------------------------------

def normalize(node: Node) -> Node:
    prev = None
    while prev != node:
        prev = node
        node = _normalize_one(node)
    if isinstance(node, Not):  # pure-negative query matches nothing
        return CONST_FALSE
    return node


def _normalize_one(node: Node) -> Node:
    if isinstance(node, (Token, Phrase, ConstFalse, MatchAll)):
        return node
    if isinstance(node, Not):
        child = _normalize_one(node.child)
        if isinstance(child, Not):       # NOT NOT a -> a
            return child.child
        if isinstance(child, ConstFalse):
            return MATCH_ALL
        if isinstance(child, MatchAll):
            return CONST_FALSE
        return Not(child)
    if isinstance(node, Optional_):
        child = _normalize_one(node.child)
        if isinstance(child, (ConstFalse, MatchAll)):
            return MATCH_ALL
        return Optional_(child)
    if isinstance(node, And):
        out: list[Node] = []
        seen: set[Node] = set()
        for c in node.children:
            c = _normalize_one(c)
            if isinstance(c, And):       # flatten
                grand = c.children
            else:
                grand = (c,)
            for g in grand:
                if isinstance(g, MatchAll):
                    continue
                if isinstance(g, ConstFalse):
                    return CONST_FALSE
                if isinstance(g, Not) and isinstance(g.child, ConstFalse):
                    continue
                if g in seen:            # (a AND a) -> a (queries.cpp collapse)
                    continue
                seen.add(g)
                out.append(g)
        # a AND NOT a -> constfalse
        positives = {c for c in out if not isinstance(c, Not)}
        for c in out:
            if isinstance(c, Not) and c.child in positives:
                return CONST_FALSE
        if not out:
            return MATCH_ALL
        if len(out) == 1:
            only = out[0]
            if isinstance(only, Not):    # pure-negative query -> no matches
                return CONST_FALSE
            if isinstance(only, Optional_):
                return only
            return only
        if all(isinstance(c, Not) for c in out):
            return CONST_FALSE
        return And(tuple(out))
    if isinstance(node, Or):
        out = []
        seen = set()
        for c in node.children:
            c = _normalize_one(c)
            grand = c.children if isinstance(c, Or) else (c,)
            for g in grand:
                if isinstance(g, ConstFalse):
                    continue
                if isinstance(g, MatchAll):
                    return MATCH_ALL
                if g in seen:
                    continue
                seen.add(g)
                out.append(g)
        if not out:
            return CONST_FALSE
        if len(out) == 1:
            c = out[0]
            return CONST_FALSE if isinstance(c, Not) else c
        # `a OR -b` — a negation cannot stand alone in a union; drop it
        # (the reference's normalizer rewrites these forms, queries.cpp:553+)
        kept = [c for c in out if not isinstance(c, Not)]
        if not kept:
            return CONST_FALSE
        if len(kept) == 1:
            return kept[0]
        return Or(tuple(kept))
    if isinstance(node, MatchSome):
        children = tuple(_normalize_one(c) for c in node.children)
        children = tuple(c for c in children if not isinstance(c, ConstFalse))
        k = node.min_match
        if not children or k > len(children):
            return CONST_FALSE
        if k <= 1:
            return Or(children) if len(children) > 1 else children[0]
        if k == len(children):           # min==size -> AND chain
            return And(children)         # (compilation_ctx.cpp matchsome spec.)
        return MatchSome(k, children)
    raise TypeError(f"unknown node {node!r}")


def trim(node: Node, limit: int = MAX_QUERY_TOKENS) -> Node:
    """Cap distinct query tokens (query::trim, queries.cpp:1503-1525)."""
    seen: list[str] = []

    def walk(n: Node) -> Node:
        if isinstance(n, Token):
            if n.term not in seen:
                if len(seen) >= limit:
                    return MATCH_ALL
                seen.append(n.term)
            return n
        if isinstance(n, Phrase):
            for t in n.terms:
                if t not in seen:
                    if len(seen) >= limit:
                        return MATCH_ALL
                    seen.append(t)
            return n
        if isinstance(n, And):
            return And(tuple(walk(c) for c in n.children))
        if isinstance(n, Or):
            return Or(tuple(walk(c) for c in n.children))
        if isinstance(n, Not):
            return Not(walk(n.child))
        if isinstance(n, Optional_):
            return Optional_(walk(n.child))
        if isinstance(n, MatchSome):
            return MatchSome(n.min_match, tuple(walk(c) for c in n.children))
        return n

    return walk(node)


# ---------------------------------------------------------------------------
# term collection
# ---------------------------------------------------------------------------

def _iter_nodes(node: Node) -> Iterator[Node]:
    yield node
    if isinstance(node, (And, Or, MatchSome)):
        for c in node.children:
            yield from _iter_nodes(c)
    elif isinstance(node, (Not, Optional_)):
        yield from _iter_nodes(node.child)


def collect_terms(node: Node) -> list[str]:
    """All distinct terms (incl. under NOT), in first-appearance order."""
    out: list[str] = []
    for n in _iter_nodes(node):
        if isinstance(n, Token):
            if n.term not in out:
                out.append(n.term)
        elif isinstance(n, Phrase):
            for t in n.terms:
                if t not in out:
                    out.append(t)
    return out


def collect_scorable_weights(node: Node) -> dict[str, float]:
    """term -> scoring multiplier.  A term appearing both as an original
    (1.0) and as a rewrite alternative takes its MAX instance weight —
    deterministic, and an original is never down-weighted by also being
    someone's synonym."""
    out: dict[str, float] = {}

    def walk(n: Node) -> None:
        if isinstance(n, Token):
            out[n.term] = max(out.get(n.term, 0.0), n.weight)
        elif isinstance(n, Phrase):
            for t in n.terms:
                out[t] = max(out.get(t, 0.0), n.weight)
        elif isinstance(n, (And, Or, MatchSome)):
            for c in n.children:
                walk(c)
        elif isinstance(n, Optional_):
            walk(n.child)
        # Not: excluded

    walk(node)
    return out


def assign_query_indices(node: Node) -> list[tuple[str, ...]]:
    """Reference query-index geometry (assign_query_indices,
    queries.cpp:1140-1249) as an index -> alternative-terms table, directly
    consumable by ``search_sequence(index_terms=...)`` / sequence_lengths.

    Ported rules:

    - a Token occupies one index; a Phrase occupies ``len(terms)``
      consecutive indices (matched runs may pass through phrase members);
    - And children occupy consecutive index ranges (the toNextSpan
      geometry: the last phrase of the lhs is exactly adjacent to the
      first of the rhs);
    - Or branches OVERLAP: every branch starts at the same index and the
      walk resumes at the LONGEST branch's end (``nextIndex =
      max(maxL, maxR)``) — so a doc matching one branch's token adjacent
      to the token after the group still scores a run, and alternatives
      at the same index merge (the same sharing rewrite provenance uses);
    - Not places no terms and advances the cursor by 4 (the reference's
      guard so content after a NOT is never considered adjacent to
      content before it);
    - MatchSome members get NO index (reference: uint16::max sentinel —
      excluded from sequences);
    - Optional_ (ConstTrueExpr) descends normally.
    """
    slots: dict[int, list[str]] = {}

    def place(i: int, term: str) -> None:
        bucket = slots.setdefault(i, [])
        if term not in bucket:
            bucket.append(term)

    def walk(n: Node, at: int) -> int:
        if isinstance(n, Token):
            place(at, n.term)
            return at + 1
        if isinstance(n, Phrase):
            for j, t in enumerate(n.terms):
                place(at + j, t)
            return at + len(n.terms)
        if isinstance(n, And):
            for c in n.children:
                at = walk(c, at)
            return at
        if isinstance(n, Or):
            return max((walk(c, at) for c in n.children), default=at)
        if isinstance(n, Not):
            return at + 4
        if isinstance(n, Optional_):
            return walk(n.child, at)
        return at  # MatchSome / ConstFalse / MatchAll: no geometry

    end = walk(node, 0)
    out = [tuple(slots.get(i, ())) for i in range(end)]
    while out and not out[-1]:  # trailing NOT gap carries no information
        out.pop()
    return out


def collect_scorable_terms(node: Node) -> list[str]:
    """Distinct terms contributing to BM25 — everything NOT under a Not.

    Our scoring model (documented deviation from the reference's per-iterator
    accumulation, exec.h AccumulatedScoreScheme): score(d) = sum over distinct
    positive query terms t present in d of idf_t * tf/(tf+k1)
    (similarity.h:228-235).  Both the engine and the oracle implement exactly
    this, so rank-identity is well-defined.
    """
    out: list[str] = []

    def walk(n: Node) -> None:
        if isinstance(n, Token):
            if n.term not in out:
                out.append(n.term)
        elif isinstance(n, Phrase):
            for t in n.terms:
                if t not in out:
                    out.append(t)
        elif isinstance(n, (And, Or, MatchSome)):
            for c in n.children:
                walk(c)
        elif isinstance(n, Optional_):
            walk(n.child)
        # Not: excluded

    walk(node)
    return out
