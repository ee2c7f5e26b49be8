"""Lambda-language built-in functions (SURVEY §2.7).

The reference's TICK lambda expressions run per point against the fields/
tags scope with the function registry in
/root/reference/tick/stateful/functions.go:145-253. Here each function is a
Spark ``Column`` builder — JVM-side, codegen'd, vectorized — registered in
``FUNCTIONS``. The TICK-lambda *syntax* is handled by
:mod:`kapacitor_spark.functions.lambdas`.

Stateless functions map ~1:1 onto ``pyspark.sql.functions``. The handful Go
has but the JVM lacks (Bessel j0/y0/jn/yn) go through an Arrow-batched
pandas UDF gated behind a scipy import-try — they are off the hot path.

Stateful functions (sigma / count / spread — per-expression running state,
functions.go:1131-1213) have no per-row scalar analog in a distributed
engine; they are exposed as Pipeline methods compiling to running-window
aggregates over ``partitionBy(dims).orderBy(time)`` (see
``Pipeline.sigma`` et al.), and as streaming state in
``kapacitor_spark.streaming``.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = ["FUNCTIONS", "spark_fn", "SQL_NAME_MAP"]


def _c(x) -> Column:
    return x if isinstance(x, Column) else (F.col(x) if isinstance(x, str) else F.lit(x))


def _pandas_math(name: str):
    """Bessel/special functions absent from the JVM: scipy-backed pandas UDF
    (Arrow-batched). Raises at call time if scipy is unavailable."""

    def build(*cols: Column) -> Column:
        try:
            import scipy.special  # noqa: F401
        except ImportError as e:  # pragma: no cover - scipy absent in container
            raise NotImplementedError(
                f"{name} requires scipy (not installed); all other lambda "
                f"functions are JVM-side"
            ) from e
        from pyspark.sql.functions import pandas_udf

        import scipy.special as sp

        fn = getattr(sp, name)

        if name in ("jn", "yn"):
            @pandas_udf("double")
            def udf(n, x):
                return fn(n, x)

            return udf(*[_c(c) for c in cols])

        @pandas_udf("double")
        def udf1(x):
            return fn(x)

        return udf1(_c(cols[0]))

    return build


def _human_bytes(x) -> Column:
    """humanBytes (functions.go:234): power-of-2 units, one decimal."""
    x = _c(x).cast("double")
    units = ["B", "KiB", "MiB", "GiB", "TiB", "PiB", "EiB"]
    expr = F.concat(F.format_number(x, 1), F.lit(" B"))
    for i, u in enumerate(units[1:], start=1):
        bound = float(2 ** (10 * i))
        expr = F.when(
            x >= bound, F.concat(F.format_number(x / F.lit(bound), 1), F.lit(" " + u))
        ).otherwise(expr)
    return expr


# name -> Column builder. Signatures follow the Go registry.
FUNCTIONS: dict = {
    # conversions (functions.go:145-149)
    "bool": lambda x: _c(x).cast("boolean"),
    "int": lambda x: _c(x).cast("long"),
    "float": lambda x: _c(x).cast("double"),
    # Go strconv.FormatFloat(-1) renders integral floats without the
    # trailing ".0" (golden TestStream_Eval_Tags expects tag "0", not
    # "0.0") — strip it when the rendering is exactly <digits>.0
    "string": lambda x: F.regexp_replace(
        _c(x).cast("string"), r"^(-?\d+)\.0$", r"$1"
    ),
    "duration": lambda x, unit=1.0: _c(x).cast("double") * F.lit(unit),
    # math (functions.go:152-193)
    "abs": lambda x: F.abs(_c(x)),
    "acos": lambda x: F.acos(_c(x)),
    "acosh": lambda x: F.log(_c(x) + F.sqrt(_c(x) * _c(x) - 1)),
    "asin": lambda x: F.asin(_c(x)),
    "asinh": lambda x: F.log(_c(x) + F.sqrt(_c(x) * _c(x) + 1)),
    "atan": lambda x: F.atan(_c(x)),
    "atan2": lambda y, x: F.atan2(_c(y), _c(x)),
    "atanh": lambda x: F.log((1 + _c(x)) / (1 - _c(x))) / 2,
    "cbrt": lambda x: F.cbrt(_c(x)),
    "ceil": lambda x: F.ceil(_c(x)).cast("double"),
    "cos": lambda x: F.cos(_c(x)),
    "cosh": lambda x: F.cosh(_c(x)),
    "erf": _pandas_math("erf"),
    "erfc": _pandas_math("erfc"),
    "exp": lambda x: F.exp(_c(x)),
    "exp2": lambda x: F.pow(F.lit(2.0), _c(x)),
    "expm1": lambda x: F.expm1(_c(x)),
    "floor": lambda x: F.floor(_c(x)).cast("double"),
    "gamma": lambda x: F.exp(F.expr(f"ln(gamma({'__X__'}))")),  # replaced below
    "hypot": lambda x, y: F.hypot(_c(x), _c(y)),
    "j0": _pandas_math("j0"),
    "j1": _pandas_math("j1"),
    "jn": _pandas_math("jn"),
    "log": lambda x: F.log(_c(x)),
    "log10": lambda x: F.log10(_c(x)),
    "log1p": lambda x: F.log1p(_c(x)),
    "log2": lambda x: F.log2(_c(x)),
    "logb": lambda x: F.floor(F.log2(F.abs(_c(x)))).cast("double"),
    "max": lambda x, y: F.greatest(_c(x), _c(y)),
    "min": lambda x, y: F.least(_c(x), _c(y)),
    "mod": lambda x, y: _c(x) % _c(y),
    "pow": lambda x, y: F.pow(_c(x), _c(y)),
    "pow10": lambda n: F.pow(F.lit(10.0), _c(n)),
    "sin": lambda x: F.sin(_c(x)),
    "sinh": lambda x: F.sinh(_c(x)),
    "sqrt": lambda x: F.sqrt(_c(x)),
    "tan": lambda x: F.tan(_c(x)),
    "tanh": lambda x: F.tanh(_c(x)),
    "trunc": lambda x: F.expr("0"),  # replaced below
    "y0": _pandas_math("y0"),
    "y1": _pandas_math("y1"),
    "yn": _pandas_math("yn"),
    # strings (functions.go:196-215); Go is 0-indexed, SQL 1-indexed
    "strContains": lambda s, sub: _c(s).contains(_c(sub)),
    "strContainsAny": lambda s, chars: F.arrays_overlap(
        F.split(_c(s), ""), F.split(_c(chars), "")
    ),
    "strCount": lambda s, sub: (
        (F.length(_c(s)) - F.length(F.replace(_c(s), _c(sub), F.lit(""))))
        / F.length(_c(sub))
    ).cast("long"),
    "strHasPrefix": lambda s, p: _c(s).startswith(_c(p)),
    "strHasSuffix": lambda s, p: _c(s).endswith(_c(p)),
    "strIndex": lambda s, sub: (F.instr(_c(s), _c(sub)) - 1).cast("long"),
    "strIndexAny": lambda s, chars: _str_index_any(s, chars, last=False),
    "strLastIndex": lambda s, sub: _str_last_index(s, sub),
    "strLastIndexAny": lambda s, chars: _str_index_any(s, chars, last=True),
    "strLength": lambda s: F.length(_c(s)).cast("long"),
    "strReplace": lambda s, old, new, n=-1: F.replace(_c(s), _c(old), _c(new)),
    "strSubstring": lambda s, start, stop: F.substring(
        _c(s), _c(start).cast("int") + 1, (_c(stop) - _c(start)).cast("int")
    ),
    "strToLower": lambda s: F.lower(_c(s)),
    "strToUpper": lambda s: F.upper(_c(s)),
    "strTrim": lambda s, cut: F.btrim(_c(s), _c(cut)),
    "strTrimLeft": lambda s, cut: F.ltrim(_c(s), _c(cut)),
    "strTrimPrefix": lambda s, p: F.when(
        _c(s).startswith(_c(p)), F.substring(_c(s), F.length(_c(p)) + 1, F.lit(2**31 - 1))
    ).otherwise(_c(s)),
    "strTrimRight": lambda s, cut: F.rtrim(_c(s), _c(cut)),
    "strTrimSpace": lambda s: F.trim(_c(s)),
    "strTrimSuffix": lambda s, p: F.when(
        _c(s).endswith(_c(p)),
        F.substring(_c(s), F.lit(1), F.length(_c(s)) - F.length(_c(p))),
    ).otherwise(_c(s)),
    # regex (functions.go:218)
    "regexReplace": lambda pat, s, repl: F.regexp_replace(_c(s), pat, repl),
    # missing (functions.go:221)
    "isPresent": lambda x: _c(x).isNotNull(),
    # time (functions.go:224-231)
    "unixNano": lambda t: (F.unix_micros(_c(t)) * 1000).cast("long"),
    "minute": lambda t: F.minute(_c(t)).cast("long"),
    "hour": lambda t: F.hour(_c(t)).cast("long"),
    "weekday": lambda t: (F.dayofweek(_c(t)) - 1).cast("long"),  # Go: Sunday=0
    "day": lambda t: F.dayofmonth(_c(t)).cast("long"),
    "month": lambda t: F.month(_c(t)).cast("long"),
    "year": lambda t: F.year(_c(t)).cast("long"),
    "now": lambda: F.current_timestamp(),
    # humanize + conditional (functions.go:234-237)
    "humanBytes": _human_bytes,
    "if": lambda cond, a, b: F.when(_c(cond), _c(a)).otherwise(_c(b)),
    # rand (functions.go rand.Int63/Int63n; golden TestStream_EvalRand):
    # rand() → int64 in [0, 2^63); rand(n) → [0, n), rand(0) → 0.
    # DIVERGENCE (documented, MIGRATION.md): the reference draws from one
    # sequential seeded RNG stream — inherently single-threaded. Here the
    # draw is Spark's per-partition RNG, so values differ run-to-run
    # unless the plan seeds it; the CONTRACT (ranges, rand(0)==0) holds.
    "rand": lambda n=None: (
        # full [0, 2^63) range per rand.Int63. The clamp must wrap the
        # DOUBLE (before the cast): rand()*2^63 can round up to exactly
        # 2^63, and under ANSI mode the long cast would throw on it.
        # 2^63-1024 is the largest double below 2^63 (ulp there is 1024).
        F.least(
            F.rand() * F.lit(float(2**63)), F.lit(float(2**63 - 1024))
        ).cast("long")
        if n is None
        else F.floor(F.rand() * F.greatest(_c(n).cast("double"), F.lit(1.0))).cast("long")
    ),
}


def _str_index_any(s, chars, last: bool) -> Column:
    """Index of first/last char of s present in chars (Go strings.IndexAny)."""
    arr = F.split(_c(s), "")
    idxs = F.filter(
        F.transform(arr, lambda ch, i: F.when(F.contains(_c(chars), ch), i).otherwise(F.lit(-1))),
        lambda v: v >= 0,
    )
    pick = F.array_max(idxs) if last else F.array_min(idxs)
    return F.coalesce(pick, F.lit(-1)).cast("long")


def _str_last_index(s, sub) -> Column:
    """Go strings.LastIndex via reversed instr."""
    rev_pos = F.instr(F.reverse(_c(s)), F.reverse(_c(sub)))
    return (
        F.when(rev_pos > 0, F.length(_c(s)) - rev_pos - F.length(_c(sub)) + 1)
        .otherwise(F.lit(-1))
        .cast("long")
    )


# fix the two placeholders that need expr-composition
FUNCTIONS["trunc"] = lambda x: (
    F.when(_c(x) >= 0, F.floor(_c(x))).otherwise(F.ceil(_c(x))).cast("double")
)
FUNCTIONS["gamma"] = _pandas_math("gamma")


# TICK fn name -> Spark SQL function name, for the lambda translator's
# pass-through of simple renames (everything else goes through FUNCTIONS).
SQL_NAME_MAP = {
    "strToLower": "lower",
    "strToUpper": "upper",
    "strLength": "length",
    "strTrimSpace": "trim",
    "regexReplace": "regexp_replace",
    "isPresent": "isnotnull",
}


def spark_fn(name: str):
    """Look up a lambda built-in; raises KeyError with the known-name list."""
    try:
        return FUNCTIONS[name]
    except KeyError:
        raise KeyError(
            f"unknown lambda function {name!r}; known: {sorted(FUNCTIONS)}"
        ) from None
