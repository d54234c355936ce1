"""SQL-subset tag-filter expressions.

Behavioral parity with the reference's pyparsing grammar and evaluator
(reference sql.py:9-169) using a hand-rolled recursive-descent parser — no
pyparsing dependency. The parse result is a tree of nested dicts shaped
exactly like pyparsing's ``ParseResults.asDict()`` so that prefix-form
compilation and ``column_names`` extraction have identical semantics,
including the reference's quirks:

* right-associative chains with NO and/or precedence
  (reference sql.py:27,100-116): ``a = '1' AND b = '2' OR c = '3'`` parses
  as ``('and', a, ('or', b, c))`` — NOT standard SQL precedence;
* ``=``/``!=``/``in`` compare raw values with no type coercion
  (reference sql.py:83,87,89): integer tag value 1 does not equal '1';
* ordering operators coerce both sides through ``str()`` and compare
  LEXICOGRAPHICALLY (reference sql.py:91-97): '100' > '20' is False;
* ``IS NOT NULL`` means key presence (reference sql.py:85);
* the empty expression matches nothing (reference sql.py:75-76).

The vectorized counterpart of ``Matcher.matches`` for Arrow batches lives in
``stages/matcher_eval.py``; this module is pure plan-time Python.
"""

import re


class InvalidSQL(Exception):
    pass


class ParseError(Exception):
    """Raised internally on any lex/parse failure (analog of
    pyparsing.ParseException; reference sql.py:45-47 maps it to the single
    error string 'SQL could not be parsed.')."""


_IDENT_RE = re.compile(r"[A-Za-z][A-Za-z0-9_:]*")
_INT_RE = re.compile(r"[0-9]+")
# pyparsing quotedString: single- or double-quoted, backslash escapes allowed,
# no newlines; the rval parse action strips only the outer quotes.
_QUOTED_RE = re.compile(r"'(?:[^'\n\r\\]|\\.)*'|\"(?:[^\"\n\r\\]|\\.)*\"")
_WS_RE = re.compile(r"[ \t\n\r]*")
# longest-first, caseless (pyparsing oneOf sorts alternatives longest-first)
_BINOPS = (">=", "<=", "!=", "=", ">", "<")
# Keyword boundary chars (pyparsing Keyword default identChars)
_KW_BOUNDARY = re.compile(r"[A-Za-z0-9_$]")


class _Cursor:
    __slots__ = ("s", "pos")

    def __init__(self, s):
        self.s = s
        self.pos = 0

    def skip_ws(self):
        self.pos = _WS_RE.match(self.s, self.pos).end()

    def eof(self):
        self.skip_ws()
        return self.pos >= len(self.s)

    def match_re(self, rx):
        self.skip_ws()
        m = rx.match(self.s, self.pos)
        if m is None:
            return None
        self.pos = m.end()
        return m.group(0)

    def match_lit(self, lit):
        self.skip_ws()
        if self.s.startswith(lit, self.pos):
            self.pos += len(lit)
            return lit
        return None

    def match_keyword(self, kw):
        """Caseless keyword with a word-boundary check after it."""
        self.skip_ws()
        end = self.pos + len(kw)
        if self.s[self.pos:end].lower() != kw:
            return None
        if end < len(self.s) and _KW_BOUNDARY.match(self.s[end]):
            return None
        self.pos = end
        return kw


def _parse_column_name(cur):
    tok = cur.match_re(_IDENT_RE)
    if tok is not None:
        return tok
    tok = cur.match_re(_QUOTED_RE)
    if tok is not None:
        return tok  # quotes preserved; stripped later by strip_quotes
    raise ParseError("expected column name")


def _parse_rval(cur):
    tok = cur.match_re(_INT_RE)
    if tok is not None:
        return tok
    tok = cur.match_re(_QUOTED_RE)
    if tok is not None:
        return tok[1:-1]  # parse action strips outer quotes (reference sql.py:20)
    raise ParseError("expected value")


def _parse_condition(cur):
    """One whereCondition alternative, tried in the reference's order
    (reference sql.py:21-26): notnull | binop | in | parenthesized."""
    start = cur.pos

    # columnName IS NOT NULL
    try:
        col = _parse_column_name(cur)
        cur.skip_ws()
        m = re.compile(r"is not null", re.IGNORECASE).match(cur.s, cur.pos)
        if m and not (m.end() < len(cur.s) and _KW_BOUNDARY.match(cur.s[m.end()])):
            cur.pos = m.end()
            return {"columnName": col, "notnull": "is not null"}
        raise ParseError("no notnull")
    except ParseError:
        cur.pos = start

    # columnName binop rval
    try:
        col = _parse_column_name(cur)
        cur.skip_ws()
        op = None
        for cand in _BINOPS:
            if cur.s.startswith(cand, cur.pos):
                op = cand
                cur.pos += len(cand)
                break
        if op is None:
            raise ParseError("no binop")
        rv = _parse_rval(cur)
        return {"columnName": col, "binop": op, "rval": [rv]}
    except ParseError:
        cur.pos = start

    # columnName IN ( rval, rval, ... )
    try:
        col = _parse_column_name(cur)
        if cur.match_keyword("in") is None:
            raise ParseError("no in")
        if cur.match_lit("(") is None:
            raise ParseError("no (")
        vals = [_parse_rval(cur)]
        while cur.match_lit(",") is not None:
            vals.append(_parse_rval(cur))
        if cur.match_lit(")") is None:
            raise ParseError("no )")
        return {"columnName": col, "in": "in", "rval": vals}
    except ParseError:
        cur.pos = start

    # ( expression )
    if cur.match_lit("(") is not None:
        expr = _parse_expression(cur)
        if cur.match_lit(")") is None:
            raise ParseError("no closing paren")
        return {"expression": expr}
    raise ParseError("no condition alternative matched")


def _parse_expression(cur):
    """whereExpression: condition followed by an optional right-recursive
    (and|or) whereExpression tail (reference sql.py:27). The dict mirrors
    asDict(): at most one of 'and'/'or' per level."""
    d = {"condition": _parse_condition(cur)}
    save = cur.pos
    kw = cur.match_keyword("and")
    if kw is None:
        kw = cur.match_keyword("or")
    if kw is not None:
        try:
            d[kw] = kw
            d["expression"] = _parse_expression(cur)
        except ParseError:
            # ZeroOrMore: a failed tail is rolled back, not fatal
            del d[kw]
            cur.pos = save
    return d


def parse_where(s):
    """Parse the full string (parseAll semantics); returns the asDict-shaped
    tree ``{'expression': {...}}`` or raises ParseError."""
    cur = _Cursor(s)
    expr = _parse_expression(cur)
    if not cur.eof():
        raise ParseError("trailing input at %d" % cur.pos)
    return {"expression": expr}


class SQLValidator(object):
    """Validates a user WHERE clause and extracts referenced columns
    (parity: reference sql.py:29-65)."""

    def __init__(self, s):
        self._s = s
        self._errors = []
        self._parse_result = None

    @property
    def valid(self):
        try:
            self._parse_result = parse_where(self._s)
        except InvalidSQL as e:
            self._errors.append(str(e))
            return False
        except ParseError:
            self._errors.append("SQL could not be parsed.")
            return False
        return True

    @property
    def errors(self):
        return self._errors

    @property
    def column_names(self):
        def walk(d):
            found = []
            for key, value in d.items():
                if key == "columnName":
                    found.append(value)
                if isinstance(value, dict):
                    found.extend(walk(value))
            return found

        return walk(self._parse_result)


def strip_quotes(token):
    if token[0] == '"' and token[-1] == '"':
        token = token[1:-1]
    if token[0] == "'" and token[-1] == "'":
        token = token[1:-1]
    return token


def to_prefix(sql):
    """Compile a WHERE clause to the prefix tuple tree. 'or' is tested before
    'and' at each level, matching reference sql.py:100-116."""

    def prefixform(d):
        if "or" in d:
            return ("or", prefixform(d["condition"]), prefixform(d["expression"]))
        if "and" in d:
            return ("and", prefixform(d["condition"]), prefixform(d["expression"]))
        if "condition" in d:
            return prefixform(d["condition"])
        if "expression" in d:
            return prefixform(d["expression"])
        if "binop" in d:
            return (d["binop"], strip_quotes(d["columnName"]), d["rval"][0])
        if "notnull" in d:
            return ("notnull", strip_quotes(d["columnName"]))
        if "in" in d:
            return ("in", strip_quotes(d["columnName"]), d["rval"])

    return prefixform(parse_where(sql))


def _match(d, tags):
    """Evaluate a prefix tree against one tags dict; every comparison quirk
    mirrors reference sql.py:74-98 (see module docstring)."""
    if len(d) == 0:
        return False
    op = d[0]
    if op == "or":
        return _match(d[1], tags) or _match(d[2], tags)
    if op == "and":
        return _match(d[1], tags) and _match(d[2], tags)
    if op == "=":
        return d[1] in tags and tags[d[1]] == d[2]
    if op == "notnull":
        return d[1] in tags
    if op == "in":
        return (d[1] in tags) and (tags[d[1]] in d[2])
    if op == "!=":
        return d[1] not in tags or tags[d[1]] != d[2]
    if op == ">":
        return d[1] in tags and str(tags[d[1]]) > str(d[2])
    if op == "<":
        return d[1] in tags and str(tags[d[1]]) < str(d[2])
    if op == ">=":
        return d[1] in tags and str(tags[d[1]]) >= str(d[2])
    if op == "<=":
        return d[1] in tags and str(tags[d[1]]) <= str(d[2])
    raise Exception("unknown operator: %r" % (op,))


def expr_columns(expr):
    """All tag keys referenced by a prefix tree (drives scan-side column
    pruning / pushdown compilation)."""
    if not expr:
        return []
    op = expr[0]
    if op in ("and", "or"):
        return expr_columns(expr[1]) + expr_columns(expr[2])
    return [expr[1]]


class Matcher:
    """A compiled tag predicate (parity: reference sql.py:118-169)."""

    def __init__(self, expr):
        self.expr = expr

    def matches(self, tags):
        return _match(self.expr, tags)

    def union(self, other_matcher):
        if other_matcher.expr == ():
            return Matcher(self.expr)
        if self.expr == ():
            return Matcher(other_matcher.expr)
        return Matcher(("or", self.expr, other_matcher.expr))

    @classmethod
    def any(cls, tag_name):
        return Matcher(("notnull", tag_name))

    @classmethod
    def null(cls):
        return Matcher(())

    @classmethod
    def from_sql(cls, sql):
        return cls(to_prefix(sql))

    def to_sql(self):
        """Round-trip to SQL text for debugging and for DuckDB-oracle
        generation (reference sql.py:146-169; note ordering ops render their
        rval unquoted, equality ops quoted)."""

        def render(e):
            op = e[0]
            if op == "=":
                return "{0} = '{1}'".format(e[1], e[2])
            if op == "notnull":
                return "{0} IS NOT NULL".format(e[1])
            if op == "!=":
                return "{0} != '{1}'".format(e[1], e[2])
            if op in (">=", "<=", ">", "<"):
                return "{0} {1} {2}".format(e[1], op, e[2])
            if op == "in":
                return "{0} IN ({1})".format(e[1], ",".join("'" + x + "'" for x in e[2]))
            if op == "and":
                return render(e[1]) + " AND " + render(e[2])
            if op == "or":
                return render(e[1]) + " OR " + render(e[2])

        return render(self.expr)
