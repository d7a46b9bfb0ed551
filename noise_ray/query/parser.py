"""Reduced noise query-language parser.

Covers the flat-schema subset of the reference grammar
(/root/reference/src/parser.rs:665-995, 1082-1307): find clauses with
``~=`` (term/phrase), ``~N=`` (proximity), ``==`` / ``!=`` (exact / ranges /
true/false/null), ``>`` ``<`` ``>=`` ``<=``, boolean ``&&`` ``,`` ``||`` ``!``
with parens, per-clause ``^boost``, plus ``order`` (fields and ``score()``,
asc/desc, ``default=``), ``return`` (``._id``, ``.field``, ``score()``, ``.``)
and ``limit``.  Parameterized queries (``params {...};`` then ``@name``,
src/parser.rs:172-215) are supported: primitives substitute into value
position via the ``params`` argument of :func:`parse_query`.

Boolean operators are right-associative with equal precedence, exactly like
the reference's ``obool`` (src/parser.rs:733-746): ``a || b && c`` parses as
``Or(a, And(b, c))``.

Array contexts ``[...]``, bind variables, nested keypaths, geospatial
``&&`` bbox and the full return grammar live in the NESTED parser
(noise_parser.py), used with nested-JSON indexes.
"""

from __future__ import annotations

import json as _json

from . import ast


class ParseError(ValueError):
    pass


_AGG_FUNS = ("group", "sum", "max_array", "max", "min_array", "min",
             "array_flat", "array", "concat", "avg", "count")


class QueryParser:
    def __init__(self, text: str, params: dict | None = None):
        self.params = params or {}
        self._init(text)

    def _init(self, text: str):
        self.text = text
        self.pos = 0

    # ------------------------------------------------------------ lexing

    def _ws(self):
        while self.pos < len(self.text) and self.text[self.pos].isspace():
            self.pos += 1

    def consume(self, tok: str) -> bool:
        self._ws()
        if self.text.startswith(tok, self.pos):
            # keyword tokens must not glue to identifier chars
            if tok[-1].isalpha():
                end = self.pos + len(tok)
                if end < len(self.text) and (
                    self.text[end].isalnum() or self.text[end] == "_"
                ):
                    return False
            self.pos += len(tok)
            return True
        return False

    def must_consume(self, tok: str):
        if not self.consume(tok):
            raise ParseError(f"Expected {tok!r} at offset {self.pos}")

    def consume_key(self) -> str | None:
        self._ws()
        start = self.pos
        if start < len(self.text) and (
            self.text[start].isalpha() or self.text[start] == "_"
        ):
            p = start
            while p < len(self.text) and (
                self.text[p].isalnum() or self.text[p] == "_"
            ):
                p += 1
            self.pos = p
            return self.text[start:p]
        if start < len(self.text) and self.text[start] == '"':
            return self.consume_string_literal()
        return None

    def maybe_param(self):
        """`@name` → ('ok', value) from the params map
        (src/query.rs:384-461: primitives only)."""
        self._ws()
        if self.pos < len(self.text) and self.text[self.pos] == "@":
            self.pos += 1
            name = self.consume_key()
            if name is None:
                raise ParseError(f"Expected parameter name at offset {self.pos}")
            if name not in self.params:
                raise ParseError(f"Unknown parameter @{name}")
            v = self.params[name]
            if isinstance(v, (dict, list)):
                raise ParseError(
                    "Parameterized query values must be String, Number, "
                    "True, False or Null")
            return ("ok", v)
        return None

    def consume_string_literal(self) -> str:
        p = self.maybe_param()
        if p is not None:
            if not isinstance(p[1], str):
                raise ParseError("Expected string parameter")
            return p[1]
        self._ws()
        if self.pos >= len(self.text) or self.text[self.pos] != '"':
            raise ParseError(f"Expected string literal at offset {self.pos}")
        end = self.pos + 1
        while end < len(self.text):
            if self.text[end] == "\\":
                end += 2
                continue
            if self.text[end] == '"':
                break
            end += 1
        raw = self.text[self.pos : end + 1]
        self.pos = end + 1
        try:
            return _json.loads(raw)
        except Exception as e:
            raise ParseError(f"Bad string literal {raw!r}: {e}") from e

    def consume_number(self) -> float | None:
        self._ws()
        start = self.pos
        p = start
        if p < len(self.text) and self.text[p] in "+-":
            p += 1
        digits = p
        while p < len(self.text) and (self.text[p].isdigit() or self.text[p] in ".eE+-"):
            # stop '+-' unless after e/E
            if self.text[p] in "+-" and self.text[p - 1] not in "eE":
                break
            p += 1
        if p == digits:
            return None
        try:
            v = float(self.text[start:p])
        except ValueError:
            return None
        self.pos = p
        return v

    def consume_integer(self) -> int | None:
        v = self.consume_number()
        if v is None:
            return None
        return int(v)

    def consume_boost(self) -> float:
        if self.consume("^"):
            v = self.consume_number()
            if v is None:
                raise ParseError("Expected number after '^'")
            return v
        return 1.0

    def consume_json_primitive(self):
        p = self.maybe_param()
        if p is not None:
            return p[1]
        self._ws()
        if self.pos < len(self.text) and self.text[self.pos] == '"':
            return self.consume_string_literal()
        if self.consume("true"):
            return True
        if self.consume("false"):
            return False
        if self.consume("null"):
            return None
        v = self.consume_number()
        if v is None:
            raise ParseError(f"Expected JSON primitive at offset {self.pos}")
        return v

    # ----------------------------------------------------------- grammar

    def parse(self) -> ast.Query:
        self.must_consume("find")
        node = self.not_object()
        order: list = []
        returns = None
        limit = None
        while True:  # order/return in either order, then limit
            if not order and self.consume("order"):
                order = self.order_keys()
                continue
            if returns is None and self.consume("return"):
                returns = self.return_spec()
                continue
            if limit is None and self.consume("limit"):
                limit = self.consume_integer()
                if limit is None:
                    raise ParseError("Expected integer after 'limit'")
                continue
            break
        self.consume(";")
        self._ws()
        if self.pos != len(self.text):
            raise ParseError(f"Trailing input at offset {self.pos}")
        q = ast.Query(filter=node, order=order, limit=limit, returns=returns)
        _validate_returns(q)
        return q

    def not_object(self) -> ast.Node:
        if self.consume("!"):
            return ast.Not(self.object())
        return self.object()

    def object(self) -> ast.Node:
        if self.consume("{"):
            if self.consume("}"):
                left: ast.Node = ast.AllDocs()
            else:
                left = self.obool()
                self.must_consume("}")
            boost = self.consume_boost()
            if boost != 1.0:
                left = ast.Boost(left, boost)
            if self.consume("&&"):
                return ast.And([left, self.not_object()])
            if self.consume("||"):
                return ast.Or(left, self.not_object())
            return left
        return self.parens()

    def parens(self) -> ast.Node:
        if self.consume("!"):
            return ast.Not(self.parens())
        self.must_consume("(")
        f = self.object()
        self.must_consume(")")
        boost = self.consume_boost()
        return ast.Boost(f, boost) if boost != 1.0 else f

    def obool(self) -> ast.Node:
        left = self.ocompare()
        if self.consume("&&") or self.consume(","):
            return ast.And([left, self.obool()])
        if self.consume("||"):
            return ast.Or(left, self.obool())
        return left

    def ocompare(self) -> ast.Node:
        f = self.oparens()
        if f is not None:
            return f
        key = self.consume_key()
        if key is None:
            raise ParseError(f"Expected object key or '(' at offset {self.pos}")
        self.must_consume(":")
        f = self.oparens(field=key)
        if f is not None:
            return f
        return self.compare(key)

    def oparens(self, field: str | None = None) -> ast.Node | None:
        save = self.pos
        if self.consume("!"):
            f = self.oparens(field=field)
            if f is not None:
                return ast.Not(f)
            self.pos = save
            return None
        if self.consume("("):
            f = self.obool() if field is None else self._field_bool(field)
            self.must_consume(")")
            boost = self.consume_boost()
            return ast.Boost(f, boost) if boost != 1.0 else f
        self._ws()
        if self.pos < len(self.text) and self.text[self.pos] == "{":
            if field is not None:
                raise ParseError("nested objects are not supported (flat schema)")
            return self.object()
        return None

    def _field_bool(self, field: str) -> ast.Node:
        """``field: (compare || compare ...)`` — the field distributes."""
        left = self._field_compare_or_parens(field)
        if self.consume("&&") or self.consume(","):
            return ast.And([left, self._field_bool(field)])
        if self.consume("||"):
            return ast.Or(left, self._field_bool(field))
        return left

    def _field_compare_or_parens(self, field: str) -> ast.Node:
        if self.consume("!"):
            return ast.Not(self._field_compare_or_parens(field))
        if self.consume("("):
            f = self._field_bool(field)
            self.must_consume(")")
            boost = self.consume_boost()
            return ast.Boost(f, boost) if boost != 1.0 else f
        return self.compare(field)

    def compare(self, field: str) -> ast.Node:
        # == / !=
        not_equal = self.consume("!=")
        if not_equal or self.consume("=="):
            v = self.consume_json_primitive()
            boost = self.consume_boost()
            if isinstance(v, str):
                f: ast.Node = ast.Exact(field, v, boost)
            elif v is True:
                f = ast.RangeQ(field, special="true")
            elif v is False:
                f = ast.RangeQ(field, special="false")
            elif v is None:
                f = ast.RangeQ(field, special="null")
            else:
                f = ast.RangeQ(field, min=v, max=v)
            return ast.Not(f) if not_equal else f
        # !~= / ~= / ~N=
        not_stemmed = self.consume("!~=")
        if not_stemmed or self.consume("~="):
            literal = self.consume_string_literal()
            boost = self.consume_boost()
            toks = _analyze(literal)
            if len(toks) == 1:
                f = ast.Term(field, literal, boost)
            else:
                f = ast.Phrase(field, literal, boost)
            return ast.Not(f) if not_stemmed else f
        if self.consume("~"):
            dist = self.consume_integer()
            if dist is None:
                raise ParseError("Expected integer for proximity search")
            self.must_consume("=")
            literal = self.consume_string_literal()
            boost = self.consume_boost()
            return ast.Proximity(field, literal, dist, boost)
        if self.consume(">="):
            return ast.RangeQ(field, min=self._must_number(), min_inclusive=True)
        if self.consume("<="):
            return ast.RangeQ(field, max=self._must_number(), max_inclusive=True)
        if self.consume(">"):
            return ast.RangeQ(field, min=self._must_number(), min_inclusive=False)
        if self.consume("<"):
            return ast.RangeQ(field, max=self._must_number(), max_inclusive=False)
        raise ParseError(f"Expected comparison operator at offset {self.pos}")

    def _must_number(self) -> float:
        p = self.maybe_param()
        if p is not None:
            if not isinstance(p[1], (int, float)) or isinstance(p[1], bool):
                raise ParseError("Expected number parameter")
            return float(p[1])
        v = self.consume_number()
        if v is None:
            raise ParseError("Expected number")
        return v

    # ------------------------------------------------- order/return/limit

    def order_keys(self) -> list[ast.OrderKey]:
        keys = []
        while True:
            if self.consume("score"):
                self.must_consume("(")
                self.must_consume(")")
                desc = self._asc_desc()
                keys.append(ast.OrderKey(score=True, desc=desc))
            elif self.consume("."):
                field = self.consume_key()
                if field is None:
                    raise ParseError("Expected field after '.'")
                desc = self._asc_desc()
                default = None
                if self.consume("default"):
                    self.must_consume("=")
                    default = self.consume_json_primitive()
                keys.append(ast.OrderKey(field=field, desc=desc, default=default))
            else:
                raise ParseError(f"Expected order key at offset {self.pos}")
            if not self.consume(","):
                break
        return keys

    def _asc_desc(self) -> bool:
        if self.consume("desc"):
            return True
        self.consume("asc")
        return False

    def return_spec(self):
        """Returnable: `{...}` / `[...]` / aggregate expr → RetExpr tree
        (src/parser.rs:1157-1288); otherwise the legacy comma list of
        paths / score()."""
        self._ws()
        if self.pos < len(self.text) and self.text[self.pos] == "{":
            return self.ret_object()
        if self.pos < len(self.text) and self.text[self.pos] == "[":
            return self.ret_array()
        agg = self.try_agg()
        if agg is not None:
            return agg
        cols = []
        while True:
            if self.consume("score"):
                self.must_consume("(")
                self.must_consume(")")
                cols.append("score()")
            elif self.consume("._id"):
                cols.append("_id")
            elif self.consume("."):
                field = self.consume_key()
                cols.append(field if field else ".")
            else:
                raise ParseError(f"Expected return spec at offset {self.pos}")
            if not self.consume(","):
                break
        return cols

    # --------------------------------------- returnable tree (aggregates)

    def ret_object(self) -> ast.RetObject:
        self.must_consume("{")
        items = []
        if not self.consume("}"):
            while True:
                name = self.consume_key()
                if name is None:
                    raise ParseError(f"Expected field name at {self.pos}")
                self.must_consume(":")
                items.append((name, self.ret_value()))
                if not self.consume(","):
                    break
            self.must_consume("}")
        return ast.RetObject(items)

    def ret_array(self) -> ast.RetArray:
        self.must_consume("[")
        items = []
        if not self.consume("]"):
            while True:
                items.append(self.ret_value())
                if not self.consume(","):
                    break
            self.must_consume("]")
        return ast.RetArray(items)

    def ret_value(self):
        self._ws()
        if self.pos < len(self.text) and self.text[self.pos] == "{":
            return self.ret_object()
        if self.pos < len(self.text) and self.text[self.pos] == "[":
            return self.ret_array()
        agg = self.try_agg()
        if agg is not None:
            return agg
        save = self.pos
        if self.consume("score"):
            if self.consume("("):
                self.must_consume(")")
                return ast.RetScore()
            self.pos = save
        if self.consume("."):
            field = self.consume_key()
            if field is None:
                raise ParseError(f"Expected field after '.' at {self.pos}")
            default = None
            if self.consume("default"):
                self.must_consume("=")
                default = self.consume_json_primitive()
            return ast.RetPath(field, default)
        try:
            return ast.RetLiteral(self.consume_json_primitive())
        except ParseError:
            raise ParseError(f"Expected return value at offset {self.pos}")

    def try_agg(self) -> ast.RetAgg | None:
        """Aggregate call per src/parser.rs:250-340; None if the next token
        isn't an aggregate function application."""
        save = self.pos
        fun = None
        for f in _AGG_FUNS:
            if self.consume(f):
                fun = f
                break
        if fun is None:
            return None
        if not self.consume("("):
            self.pos = save
            return None
        if fun == "count":
            self.must_consume(")")
            agg = ast.RetAgg("count")
        elif fun == "concat":
            self.must_consume(".")
            field = self.consume_key()
            if field is None:
                raise ParseError("Expected keypath in concat()")
            sep = ","
            if self.consume("sep"):
                self.must_consume("=")
                sep = self.consume_string_literal()
            self.must_consume(")")
            agg = ast.RetAgg("concat", field, sep=sep)
        else:
            self.must_consume(".")
            field = self.consume_key()
            if field is None:
                raise ParseError(f"Expected keypath in {fun}()")
            desc = False
            if fun == "group" and self.consume("order"):
                self.must_consume("=")
                if self.consume("desc"):
                    desc = True
                elif not self.consume("asc"):
                    raise ParseError("Expected asc or desc")
            self.must_consume(")")
            agg = ast.RetAgg(fun, field, desc=desc)
        if self.consume("default"):
            self.must_consume("=")
            agg.default = self.consume_json_primitive()
        return agg


def _analyze(literal: str):
    from ..analysis.tokenizer import tokenize

    return tokenize(literal)


def ret_leaves(expr) -> list:
    """Flatten a RetExpr tree to its leaf slots, left to right."""
    if isinstance(expr, ast.RetObject):
        out = []
        for _name, e in expr.items:
            out.extend(ret_leaves(e))
        return out
    if isinstance(expr, ast.RetArray):
        out = []
        for e in expr.items:
            out.extend(ret_leaves(e))
        return out
    return [expr]


def _validate_returns(q: ast.Query):
    """src/query.rs:242-290: aggregates exclude ordering, and when any
    aggregate is present every fetched leaf must be aggregated/grouped."""
    if not isinstance(q.returns, (ast.RetObject, ast.RetArray, ast.RetAgg,
                                  ast.RetPath, ast.RetScore, ast.RetLiteral)):
        return
    leaves = ret_leaves(q.returns)
    has_ags = any(isinstance(l, ast.RetAgg) for l in leaves)
    if not has_ags:
        return
    if q.order:
        raise ParseError(
            "Cannot have aggregates and ordering in the same query")
    for l in leaves:
        if isinstance(l, (ast.RetPath, ast.RetScore)):
            raise ParseError(
                "Return keypaths must either all have aggregate functions, "
                "or none can them.")


def parse_query(text: str, params: dict | None = None) -> ast.Query:
    return QueryParser(text, params).parse()
