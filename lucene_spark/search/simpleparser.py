"""SimpleQueryParser analog (queryparser/simple/SimpleQueryParser.java:103).

The "never throws" end-user query syntax: ``+`` AND, ``|`` OR, ``-``
NOT, ``"..."`` phrase (``~N`` near), ``(...)`` precedence, ``*`` prefix
(trailing only), ``~N`` fuzzy, ``\\`` escape — any malformed operator
degrades to literal text instead of raising, which is why search boxes
use this parser over the classic one.

Port notes (the state machine mirrors the reference character-for-
character so degradation cases agree):

- ``parse`` returns a plan node; ``"*"`` -> MatchAllQ, empty/all-
  stopword input -> ``None`` (the reference's MatchNoDocsQuery — the
  caller renders zero hits).
- Terms/phrases run through the index analysis chain via
  ``QueryBuilder`` (the reference extends QueryBuilder), so a bare
  token that analyzes to several tokens becomes the default-operator
  boolean, exactly like ``newDefaultQuery``
  (SimpleQueryParser.java:542-556).
- ``weights``: {field: boost} multi-field dispatch — each branch is a
  SHOULD disjunction of per-field queries with BoostQ wrappers
  (SimpleQueryParser.java:544-555). A single unweighted default field
  is the common case and skips the wrapper.
- NOT wraps as BoolQ(must_not=branch, should=MatchAllQ) — the
  reference's exact tree (SimpleQueryParser.java:443-447); double
  negation cancels (``state.not % 2``).
- ``flags`` bitmask gates each operator (SimpleQueryParser.java:110-128);
  a disabled operator's character is consumed as literal text.
- Fuzzy ``~`` with no/invalid number = 2 edits, capped at 2
  (LevenshteinAutomata.MAXIMUM_SUPPORTED_DISTANCE); ``~0`` degrades to
  a plain term (SimpleQueryParser.java:400-407).
"""

from __future__ import annotations

from lucene_spark.search import plans as P
from lucene_spark.search.querybuilder import QueryBuilder

AND_OPERATOR = 1 << 0
NOT_OPERATOR = 1 << 1
OR_OPERATOR = 1 << 2
PREFIX_OPERATOR = 1 << 3
PHRASE_OPERATOR = 1 << 4
PRECEDENCE_OPERATORS = 1 << 5
ESCAPE_OPERATOR = 1 << 6
WHITESPACE_OPERATOR = 1 << 7
FUZZY_OPERATOR = 1 << 8
NEAR_OPERATOR = 1 << 9

_ALL = -1
_MAX_FUZZY = 2  # LevenshteinAutomata.MAXIMUM_SUPPORTED_DISTANCE
_WS = " \t\n\r"


class _State:
    __slots__ = ("data", "index", "length", "top", "current_op",
                 "previous_op", "not_count")

    def __init__(self, data: str, start: int, end: int):
        self.data = data
        self.index = start
        self.length = end
        self.top = None
        self.current_op = None  # 'must' | 'should' | None
        self.previous_op = None
        self.not_count = 0


class SimpleQueryParser:
    """``fields``: None (index default field), a field name, or a
    {field: boost} dict for multi-field dispatch."""

    def __init__(self, analyzer: dict | None = None,
                 fields=None, flags: int = _ALL,
                 default_operator: str = "should"):
        if default_operator not in ("should", "must"):
            raise ValueError(
                "invalid operator: only should or must are allowed")
        self.flags = flags
        self.default_operator = default_operator
        self._qb = QueryBuilder(analyzer=analyzer)
        if fields is None or isinstance(fields, str):
            self.weights = {fields: 1.0}
        else:
            self.weights = dict(fields)

    # -- parse (SimpleQueryParser.java:150) ---------------------------
    def parse(self, text: str):
        if text.strip() == "*":
            return P.MatchAllQ()
        state = _State(text, 0, len(text))
        self._parse_sub(state)
        return state.top  # None == MatchNoDocsQuery

    # -- parseSubQuery (SimpleQueryParser.java:167) --------------------
    def _parse_sub(self, state: _State) -> None:
        f = self.flags
        while state.index < state.length:
            c = state.data[state.index]
            if c == "(" and f & PRECEDENCE_OPERATORS:
                self._consume_subquery(state)
            elif c == ")" and f & PRECEDENCE_OPERATORS:
                state.index += 1  # extraneous, ignored
            elif c == '"' and f & PHRASE_OPERATOR:
                self._consume_phrase(state)
            elif c == "+" and f & AND_OPERATOR:
                if state.current_op is None and state.top is not None:
                    state.current_op = "must"
                state.index += 1
            elif c == "|" and f & OR_OPERATOR:
                if state.current_op is None and state.top is not None:
                    state.current_op = "should"
                state.index += 1
            elif c == "-" and f & NOT_OPERATOR:
                state.not_count += 1
                state.index += 1
                continue  # keep the pending NOT across this iteration
            elif c in _WS and f & WHITESPACE_OPERATOR:
                state.index += 1
            else:
                self._consume_token(state)
            state.not_count = 0

    # -- consumeSubQuery (SimpleQueryParser.java:231) ------------------
    def _consume_subquery(self, state: _State) -> None:
        f = self.flags
        state.index += 1
        start = state.index
        precedence = 1
        escaped = False
        while state.index < state.length:
            c = state.data[state.index]
            if not escaped:
                if c == "\\" and f & ESCAPE_OPERATOR:
                    escaped = True
                    state.index += 1
                    continue
                if c == "(":
                    precedence += 1
                elif c == ")":
                    precedence -= 1
                    if precedence == 0:
                        break
            escaped = False
            state.index += 1
        if state.index == state.length:
            # no closing paren: the opening one was extraneous
            state.index = start
        elif state.index == start:
            # "()": reset the pending operation
            state.current_op = None
            state.index += 1
        else:
            sub = _State(state.data, start, state.index)
            self._parse_sub(sub)
            self._build_tree(state, sub.top)
            state.index += 1

    # -- consumePhrase (SimpleQueryParser.java:289) --------------------
    def _consume_phrase(self, state: _State) -> None:
        f = self.flags
        state.index += 1
        start = state.index
        copied: list[str] = []
        escaped = False
        has_slop = False
        while state.index < state.length:
            c = state.data[state.index]
            if not escaped:
                if c == "\\" and f & ESCAPE_OPERATOR:
                    escaped = True
                    state.index += 1
                    continue
                if c == '"':
                    if (state.length > state.index + 1
                            and state.data[state.index + 1] == "~"
                            and f & NEAR_OPERATOR):
                        state.index += 1
                        if state.length > state.index + 1:
                            has_slop = True
                        break
                    break
            escaped = False
            copied.append(c)
            state.index += 1
        if state.index == state.length:
            state.index = start  # unterminated quote: extraneous
        elif not copied:
            state.current_op = None
            state.index += 1
        else:
            phrase = "".join(copied)
            slop = self._parse_fuzziness(state) if has_slop else 0
            self._build_tree(state, self._new_phrase_query(phrase, slop))
            state.index += 1

    # -- consumeToken (SimpleQueryParser.java:357) ---------------------
    def _consume_token(self, state: _State) -> None:
        f = self.flags
        copied: list[str] = []
        escaped = False
        prefix = False
        fuzzy = False
        while state.index < state.length:
            c = state.data[state.index]
            if not escaped:
                if c == "\\" and f & ESCAPE_OPERATOR:
                    escaped = True
                    prefix = False
                    state.index += 1
                    continue
                if self._token_finished(state):
                    break
                if copied and c == "~" and f & FUZZY_OPERATOR:
                    fuzzy = True
                    break
                prefix = bool(copied) and c == "*" and bool(f & PREFIX_OPERATOR)
            escaped = False
            copied.append(c)
            state.index += 1
        if not copied:
            return
        if fuzzy:
            token = "".join(copied)
            fuzziness = min(self._parse_fuzziness(state), _MAX_FUZZY)
            if fuzziness == 0:
                branch = self._new_default_query(token)
            else:
                branch = self._new_fuzzy_query(token, fuzziness)
        elif prefix:
            branch = self._new_prefix_query("".join(copied[:-1]))
        else:
            branch = self._new_default_query("".join(copied))
        self._build_tree(state, branch)

    # -- buildQueryTree (SimpleQueryParser.java:437) -------------------
    def _build_tree(self, state: _State, branch) -> None:
        if branch is None:
            return
        if state.not_count % 2 == 1:
            branch = P.BoolQ(must_not=(branch,), should=(P.MatchAllQ(),))
        if state.top is None:
            state.top = branch
        else:
            if state.current_op is None:
                state.current_op = self.default_operator
            if state.previous_op != state.current_op:
                # operation changed: existing tree becomes one clause of
                # a fresh parent (the reference's precedence quirk, kept)
                state.top = self._bool([state.top], state.current_op)
            state.top = self._add_clause(state.top, branch, state.current_op)
            state.previous_op = state.current_op
        state.current_op = None

    @staticmethod
    def _bool(clauses: list, occur: str) -> P.BoolQ:
        if occur == "must":
            return P.BoolQ(must=tuple(clauses))
        return P.BoolQ(should=tuple(clauses))

    @staticmethod
    def _add_clause(bq, branch, occur) -> P.BoolQ:
        if not isinstance(bq, P.BoolQ):
            bq = P.BoolQ()
        if occur == "must":
            return P.BoolQ(must=bq.must + (branch,), should=bq.should,
                           must_not=bq.must_not, filter=bq.filter,
                           min_should_match=bq.min_should_match)
        return P.BoolQ(must=bq.must, should=bq.should + (branch,),
                       must_not=bq.must_not, filter=bq.filter,
                       min_should_match=bq.min_should_match)

    # -- parseFuzziness (SimpleQueryParser.java:489) -------------------
    def _parse_fuzziness(self, state: _State) -> int:
        if state.index >= state.length or state.data[state.index] != "~":
            return 0
        digits: list[str] = []
        while state.index < state.length:
            state.index += 1
            if state.index < state.length:
                if self._token_finished(state):
                    break
                digits.append(state.data[state.index])
        try:
            fuzz = int("".join(digits)) if digits else 2
        except ValueError:
            fuzz = 0
        return max(fuzz, 0)

    # -- tokenFinished (SimpleQueryParser.java:526) --------------------
    def _token_finished(self, state: _State) -> bool:
        c = state.data[state.index]
        f = self.flags
        return bool(
            (c == '"' and f & PHRASE_OPERATOR)
            or (c == "|" and f & OR_OPERATOR)
            or (c == "+" and f & AND_OPERATOR)
            or (c in "()" and f & PRECEDENCE_OPERATORS)
            or (c in _WS and f & WHITESPACE_OPERATOR)
        )

    # -- factory methods (SimpleQueryParser.java:542-605) --------------
    def _dispatch(self, make) -> object:
        clauses = []
        for field, boost in self.weights.items():
            q = make(field)
            if q is None:
                continue
            if boost != 1.0:
                q = P.BoostQ(q, boost)
            clauses.append(q)
        if not clauses:
            return None
        if len(clauses) == 1:
            return clauses[0]
        return P.BoolQ(should=tuple(clauses))

    def _new_default_query(self, text: str):
        return self._dispatch(
            lambda fld: self._qb.create_boolean_query(
                fld, text, self.default_operator))

    def _new_phrase_query(self, text: str, slop: int):
        return self._dispatch(
            lambda fld: self._qb.create_phrase_query(fld, text, slop))

    # multi-term atoms skip tokenization and only normalize case —
    # Analyzer#normalize semantics, same as the classic parser's
    # fuzzy/wildcard handling (queryparser.py:235-237)
    def _new_prefix_query(self, text: str):
        return self._dispatch(
            lambda fld: P.PrefixQ(text.lower(), field=fld))

    def _new_fuzzy_query(self, text: str, fuzziness: int):
        return self._dispatch(
            lambda fld: P.FuzzyQ(
                text.lower(), max_edits=fuzziness, field=fld))
