"""Pure-Python reference oracle (SURVEY.md §5 item 1).

A deliberately naive dict-of-lists inverted index + set-based boolean
evaluation + BM25 per the reference formula (similarity.h:165-255, norm
stubbed to k1).  Shares ONLY the tokenizer and the AST with the engine —
matching, scoring, and top-k are implemented independently (Python sets,
math.log, sorted()) so rank-identity tests actually cross-check two
implementations.
"""

from __future__ import annotations

import math
from collections import Counter

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
    collect_scorable_terms,
    parse_query,
)
from trinity_ray.tokenizer import MAX_POSITION, get_tokenizer

K1 = 1.2


class OracleIndex:
    def __init__(self, tokenizer: str = "trinity"):
        self.tokenizer_name = tokenizer
        self.tokenize = get_tokenizer(tokenizer)
        self.postings: dict[str, dict[int, list[int]]] = {}  # term -> doc -> positions
        self.docs: set[int] = set()

    def add(self, doc_id: int, text: str) -> None:
        if doc_id in self.docs:
            raise ValueError(f"duplicate doc {doc_id}")  # indexer.cpp:187-222
        self.docs.add(doc_id)
        toks = self.tokenize(text or "")[: MAX_POSITION - 1]
        for pos, term in enumerate(toks, start=1):
            self.postings.setdefault(term, {}).setdefault(doc_id, []).append(pos)

    def erase(self, doc_id: int) -> None:
        self.docs.discard(doc_id)
        for docs in self.postings.values():
            docs.pop(doc_id, None)

    # -- boolean evaluation (sets) ------------------------------------------
    def term_docs(self, term: str) -> set[int]:
        return set(self.postings.get(term, ()))

    def match(self, node: Node) -> set[int]:
        if isinstance(node, ConstFalse):
            return set()
        if isinstance(node, MatchAll):
            return set(self.docs)
        if isinstance(node, Token):
            return self.term_docs(node.term)
        if isinstance(node, Near):   # before Phrase: Near subclasses it
            return self._match_near(node.terms, node.window)
        if isinstance(node, Phrase):
            return self._match_phrase(node.terms)
        if isinstance(node, Not):
            return self.docs - self.match(node.child)
        if isinstance(node, Optional_):
            return set(self.docs)
        if isinstance(node, And):
            cur = None
            for c in node.children:
                if isinstance(c, Optional_):
                    continue
                if isinstance(c, Not):
                    continue
                s = self.match(c)
                cur = s if cur is None else (cur & s)
            if cur is None:
                cur = set(self.docs)
            for c in node.children:
                if isinstance(c, Not):
                    cur = cur - self.match(c.child)
            return cur
        if isinstance(node, Or):
            out: set[int] = set()
            for c in node.children:
                out |= self.match(c)
            return out
        if isinstance(node, MatchSome):
            cnt: Counter[int] = Counter()
            for c in node.children:
                cnt.update(self.match(c))
            return {d for d, n in cnt.items() if n >= node.min_match}
        raise TypeError(node)

    def _match_near(self, terms: tuple[str, ...], window: int) -> set[int]:
        """Unordered proximity: one occurrence per distinct term with
        position span (max - min) <= window — brute-force anchor sweep."""
        uniq = list(dict.fromkeys(terms))
        docs = None
        for t in uniq:
            s = self.term_docs(t)
            docs = s if docs is None else (docs & s)
        out: set[int] = set()
        for d in docs or ():
            poss = [self.postings[t][d] for t in uniq]
            if any(all(any(a <= q <= a + window for q in p) for p in poss)
                   for anchor in poss for a in anchor):
                out.add(d)
        return out

    def _match_phrase(self, terms: tuple[str, ...]) -> set[int]:
        docs = None
        for t in terms:
            s = self.term_docs(t)
            docs = s if docs is None else docs & s
            if not docs:
                return set()
        out = set()
        for d in docs:
            first = self.postings[terms[0]][d]
            for p in first:
                if all((p + i) in self.postings[terms[i]][d] for i in range(1, len(terms))):
                    out.add(d)
                    break
        return out

    # -- scoring -------------------------------------------------------------
    def idf(self, term: str, scorer: str = "bm25") -> float:
        """Per-term weight; formulas per scorer (similarity.h:56-132,179-181)."""
        df = len(self.postings.get(term, ()))
        if df == 0:
            return 0.0
        n = len(self.docs)
        if scorer == "bm25":
            return math.log(1.0 + (n - df + 0.5) / (df + 0.5))
        if scorer == "tfidf":
            return math.log((n + 1.0) / (df + 1.0)) + 1.0
        if scorer == "trivial":
            return 1.0
        raise ValueError(scorer)

    def search(self, query: str | Node, k: int = 10,
               scorer: str = "bm25") -> list[tuple[int, float]]:
        node = parse_query(query, self.tokenizer_name) if isinstance(query, str) else query
        matched = self.match(node)
        scorable = [(t, self.idf(t, scorer)) for t in collect_scorable_terms(node)]
        results = []
        for d in matched:
            score = 0.0
            for t, w in scorable:
                pos = self.postings.get(t, {}).get(d)
                if pos:
                    tf = float(len(pos))
                    if scorer == "bm25":
                        score += w * tf / (tf + K1)
                    elif scorer == "tfidf":
                        score += w * math.sqrt(tf)
                    else:  # trivial: score = freq (similarity.h:56-72)
                        score += tf
            results.append((d, score))
        results.sort(key=lambda r: (-r[1], r[0]))
        return results[:k] if k else results
