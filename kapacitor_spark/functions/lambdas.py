"""TICK lambda-expression → Spark Column compiler.

The reference evaluates lambdas per point with a compiled AST walker
(/root/reference/tick/stateful/expr.go, eval_binary_node.go; syntax
/root/reference/tick/ast/node.go). Here the same grammar compiles ONCE into
a Spark ``Column`` tree — Catalyst codegen then vectorizes it, replacing the
reference's per-point interpreter loop.

Grammar (tick/ast operator precedence):

    expr    := or
    or      := and (OR and)*
    and     := cmp (AND cmp)*
    cmp     := add ((> >= < <= == !=) add | (=~ !~) regex)*
    add     := mul ((+ -) mul)*
    mul     := unary ((* / %) unary)*
    unary   := (! -) unary | primary
    primary := NUMBER | DURATION | STRING | "field_ref" | TRUE | FALSE
             | ident(args...) | ident | ( expr )

Literals: numbers; single-quoted strings; double-quoted field/tag refs;
/regex/; durations (1s, 10m, …) → nanoseconds int64 (matching unixNano
scale, functions.go:224). ``lambda:`` prefix is optional.

Stateful functions sigma/count/spread (functions.go:1131-1213) need an
event-time ordering — pass ``ordered_window`` (Pipeline does this
automatically) and they compile to running-window aggregates.
"""

from __future__ import annotations

import re

from pyspark.sql import Column, Window
from pyspark.sql import functions as F

from kapacitor_spark.durations import parse_duration
from kapacitor_spark.functions import FUNCTIONS

__all__ = ["compile_lambda", "is_lambda"]

_TOKEN_RE = re.compile(
    r"""\s*(?:
      (?P<dur>\d+(?:\.\d+)?(?:ns|us|µs|ms|s|m|h|d|w))(?![\w.])
    | (?P<num>\d+(?:\.\d+)?(?:[eE][+-]?\d+)?)
    | (?P<str>'(?:[^'\\]|\\.)*')
    | (?P<ref>"(?:[^"\\]|\\.)*")
    | (?P<regex>/(?:[^/\\]|\\.)+/)
    | (?P<op><=|>=|==|!=|=~|!~|[-+*/%!<>(),])
    | (?P<ident>[A-Za-z_][A-Za-z0-9_]*)
    )""",
    re.VERBOSE,
)


def is_lambda(s: str) -> bool:
    return isinstance(s, str) and s.lstrip().startswith("lambda:")


def _tokenize(src: str) -> list[tuple[str, str]]:
    out, pos = [], 0
    while pos < len(src):
        m = _TOKEN_RE.match(src, pos)
        if not m:
            if src[pos:].strip() == "":
                break
            raise ValueError(f"lambda: cannot tokenize at {src[pos:pos+20]!r}")
        pos = m.end()
        for kind in ("dur", "num", "str", "ref", "regex", "op", "ident"):
            v = m.group(kind)
            if v is not None:
                out.append((kind, v))
                break
    out.append(("eof", ""))
    return out


# string-returning registry functions: their results participate in the
# reference's `+`-as-concatenation rule (tick/ast string concat via '+')
_STR_RETURNING = {
    "string", "strToUpper", "strToLower", "strTrim", "strTrimLeft",
    "strTrimRight", "strTrimPrefix", "strTrimSuffix", "strTrimSpace",
    "strReplace", "strSubstring", "regexReplace", "humanBytes",
}


class _Parser:
    def __init__(
        self,
        tokens,
        ordered_window: Window | None,
        time_col: str,
        schema: dict | None = None,
        variables: dict | None = None,
    ):
        self.toks = tokens
        self.i = 0
        self.w = ordered_window
        self.time_col = time_col
        self.schema = schema or {}
        # TICKscript var scope: bare identifiers resolve here FIRST
        # (reference lambdas close over script vars — tick/eval.go;
        # golden TestStream_VarWhereRegex/String)
        self.vars = variables or {}
        # ids of sub-expression Columns known to be strings — drives the
        # reference's '+'-is-concat rule for string operands
        self._strs: set[int] = set()

    def _mark_str(self, c: Column) -> Column:
        self._strs.add(id(c))
        return c

    def _is_str(self, c: Column) -> bool:
        return id(c) in self._strs

    def peek(self):
        return self.toks[self.i]

    def next(self):
        t = self.toks[self.i]
        self.i += 1
        return t

    def expect_op(self, op):
        k, v = self.next()
        if k != "op" or v != op:
            raise ValueError(f"lambda: expected {op!r}, got {v!r}")

    # --- precedence climb ------------------------------------------------
    def parse(self) -> Column:
        c = self.or_()
        k, v = self.peek()
        if k != "eof":
            raise ValueError(f"lambda: trailing input at {v!r}")
        return c

    def or_(self) -> Column:
        c = self.and_()
        while self.peek() == ("ident", "OR"):
            self.next()
            c = c | self.and_()
        return c

    def and_(self) -> Column:
        c = self.cmp()
        while self.peek() == ("ident", "AND"):
            self.next()
            c = c & self.cmp()
        return c

    def cmp(self) -> Column:
        c = self.add()
        while True:
            k, v = self.peek()
            if k == "op" and v in (">", ">=", "<", "<=", "==", "!="):
                self.next()
                r = self.add()
                c = {
                    ">": c.__gt__, ">=": c.__ge__, "<": c.__lt__,
                    "<=": c.__le__, "==": c.__eq__, "!=": c.__ne__,
                }[v](r)
            elif k == "op" and v in ("=~", "!~"):
                self.next()
                rk, rv = self.next()
                if rk == "regex":
                    pat = rv[1:-1]
                elif rk == "str":
                    pat = rv[1:-1]
                elif rk == "ident" and rv in self.vars:
                    # regex held in a script var (TestStream_VarWhereRegex)
                    val = self.vars[rv]
                    pat = getattr(val, "pat", val)
                    if not isinstance(pat, str):
                        raise ValueError(f"lambda: var {rv!r} is not a regex/string")
                else:
                    raise ValueError(f"lambda: {v} needs a /regex/, got {rv!r}")
                m = c.rlike(pat)
                c = m if v == "=~" else ~m
            else:
                return c

    def add(self) -> Column:
        c = self.mul()
        while True:
            k, v = self.peek()
            if k == "op" and v in ("+", "-"):
                self.next()
                r = self.mul()
                if v == "+" and (self._is_str(c) or self._is_str(r)):
                    # reference: '+' concatenates strings (tick/ast binary
                    # ops; used as "str" + 'suffix' in eval lambdas)
                    c = self._mark_str(F.concat(c, r))
                else:
                    c = (c + r) if v == "+" else (c - r)
            else:
                return c

    def mul(self) -> Column:
        c = self.unary()
        while True:
            k, v = self.peek()
            if k == "op" and v in ("*", "/", "%"):
                self.next()
                r = self.unary()
                if v == "*":
                    c = c * r
                else:
                    # division/modulo by zero is an EVAL ERROR in the
                    # reference (point dropped, integrations
                    # TestStream_EvalDivisionByZero expects no output);
                    # try_* yields NULL instead of the ANSI exception so
                    # eval(drop_errors=True) can drop the point. (Float /0
                    # is +Inf in Go — documented divergence: NULL here.)
                    c = F.try_divide(c, r) if v == "/" else F.try_mod(c, r)
            else:
                return c

    def unary(self) -> Column:
        k, v = self.peek()
        if k == "op" and v == "!":
            self.next()
            return ~self.unary()
        if k == "op" and v == "-":
            self.next()
            return -self.unary()
        return self.primary()

    def primary(self) -> Column:
        k, v = self.next()
        if k == "num":
            return F.lit(float(v) if ("." in v or "e" in v or "E" in v) else int(v))
        if k == "dur":
            # durations compare against unixNano deltas → int64 nanoseconds
            return F.lit(int(parse_duration(v) * 1_000_000_000))
        if k == "str":
            return self._mark_str(F.lit(v[1:-1].replace("\\'", "'")))
        if k == "ref":
            name = v[1:-1]
            # the lambda scope always exposes "time" = the point time
            # (tick/stateful scope; reference lambdas write hour("time"))
            # even when the pipeline's event-time column has another name
            if name == "time" and name not in self.schema:
                name = self.time_col
            # backtick-quote: join-prefixed refs like "errors.value" are
            # flat column names, not struct field access
            c = F.col(f"`{name}`")
            return self._mark_str(c) if self.schema.get(name) == "string" else c
        if k == "op" and v == "(":
            c = self.or_()
            self.expect_op(")")
            return c
        if k == "ident":
            if v == "TRUE":
                return F.lit(True)
            if v == "FALSE":
                return F.lit(False)
            if self.peek() == ("op", "("):
                return self.call(v)
            if v in self.vars:
                lit = self._var_lit(self.vars[v])
                if lit is not None:
                    return lit
            # bare identifier = column ref (convenience beyond the reference)
            c = F.col(v)
            return self._mark_str(c) if self.schema.get(v) == "string" else c
        raise ValueError(f"lambda: unexpected token {v!r}")

    def _var_lit(self, val) -> Column | None:
        """A script var as a literal: strings stay string-marked (concat
        rule), durations become int64 NANOSECONDS (the lambda language's
        duration representation, matching unixNano comparisons). Non-scalar
        vars (pipelines/nodes) return None → column-ref fallback."""
        if hasattr(val, "seconds"):  # tick._Duration
            return F.lit(int(round(val.seconds * 1e9)))
        if isinstance(val, str):
            return self._mark_str(F.lit(val))
        if isinstance(val, (bool, int, float)):
            return F.lit(val)
        return None

    def call(self, name: str) -> Column:
        self.expect_op("(")
        args: list[Column] = []
        if self.peek() != ("op", ")"):
            args.append(self.or_())
            while self.peek() == ("op", ","):
                self.next()
                args.append(self.or_())
        self.expect_op(")")

        if name in ("sigma", "count", "spread"):
            return self.stateful(name, args)
        if name == "now":
            return F.current_timestamp()
        fn = FUNCTIONS.get(name)
        if fn is None:
            raise ValueError(f"lambda: unknown function {name!r}")
        out = fn(*args)
        return self._mark_str(out) if name in _STR_RETURNING else out

    def stateful(self, name: str, args: list[Column]) -> Column:
        """Running-state functions over the pipeline's event order
        (/root/reference/tick/stateful/functions.go:1131-1213)."""
        if self.w is None:
            raise ValueError(
                f"lambda: stateful {name}() needs event ordering — call via "
                f"Pipeline.eval/where (or pass ordered_window)"
            )
        run = self.w.rowsBetween(Window.unboundedPreceding, 0)
        if name == "count":
            return F.count(F.lit(1)).over(run).cast("double")
        x = args[0]
        if name == "spread":
            return F.max(x).over(run) - F.min(x).over(run)
        # sigma: |x - running_mean| / running_stddev_samp, both including x;
        # 0 while n<2 or variance==0 (functions.go:1146-1163)
        mean = F.avg(x).over(run)
        sd = F.stddev_samp(x).over(run)
        n = F.count(x).over(run)
        return (
            F.when((n < 2) | sd.isNull() | (sd == 0), F.lit(0.0))
            .otherwise(F.abs(x - mean) / sd)
        )


def compile_lambda(
    src: str,
    ordered_window: Window | None = None,
    time_col: str = "time",
    schema: dict | None = None,
    variables: dict | None = None,
) -> Column:
    """Compile ``lambda: "value" > 10.0 AND sigma("value") > 3`` to a Column.

    ``schema`` (column name → Spark dtype string, e.g. dict(df.dtypes))
    enables the reference's string semantics for ``+`` (concatenation
    when either operand is a string column/literal/function result).
    ``variables``: TICKscript var scope — bare identifiers resolve to
    these values before falling back to column refs."""
    body = src.lstrip()
    if body.startswith("lambda:"):
        body = body[len("lambda:"):]
    return _Parser(
        _tokenize(body), ordered_window, time_col, schema, variables
    ).parse()
