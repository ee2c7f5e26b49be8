"""Lambda expression language tests (SURVEY §2.7) — mirrors the shape of
/root/reference/tick/stateful/expr_test.go + functions_test.go: evaluate
expressions over known rows, assert exact results, and check error cases."""

import math

import pytest
from pyspark.sql import functions as F

from kapacitor_spark import Pipeline
from kapacitor_spark.functions.lambdas import compile_lambda, is_lambda


@pytest.fixture(scope="module")
def pts(spark):
    rows = [
        (1, "2024-01-01 00:00:00", "serverA", 10.0, "web"),
        (2, "2024-01-01 00:00:10", "serverA", 20.0, "web"),
        (3, "2024-01-01 00:00:20", "serverA", 90.0, "api"),
        (4, "2024-01-01 00:00:30", "serverB", -5.0, "api"),
    ]
    df = spark.createDataFrame(rows, "id long, t string, host string, value double, svc string")
    return df.withColumn("t", F.to_timestamp("t"))


def _vals(df, col="r"):
    return [r[col] for r in df.orderBy("id").collect()]


def test_is_lambda():
    assert is_lambda('lambda: "v" > 1')
    assert not is_lambda("v > 1")


def test_comparison_and_logic(pts):
    c = compile_lambda('lambda: "value" > 5.0 AND ("host" == \'serverA\' OR "svc" == \'api\')')
    out = pts.filter(c)
    assert sorted(r.id for r in out.collect()) == [1, 2, 3]


def test_regex_match(pts):
    keep = pts.filter(compile_lambda('lambda: "host" =~ /^server[AB]$/'))
    assert keep.count() == 4
    neg = pts.filter(compile_lambda('lambda: "host" !~ /A$/'))
    assert sorted(r.id for r in neg.collect()) == [4]


def test_arithmetic_precedence(pts):
    out = pts.withColumn("r", compile_lambda('lambda: "value" * 2.0 + 1.0'))
    assert _vals(out) == [21.0, 41.0, 181.0, -9.0]
    out2 = pts.withColumn("r", compile_lambda('lambda: 2.0 + "value" * 2.0'))
    assert _vals(out2) == [22.0, 42.0, 182.0, -8.0]


def test_unary_not_and_neg(pts):
    out = pts.filter(compile_lambda('lambda: !("value" >= 10.0)'))
    assert [r.id for r in out.collect()] == [4]
    out2 = pts.withColumn("r", compile_lambda('lambda: -"value"'))
    assert _vals(out2) == [-10.0, -20.0, -90.0, 5.0]


def test_math_functions(pts):
    out = pts.withColumn("r", compile_lambda('lambda: sqrt(abs("value"))'))
    assert _vals(out) == pytest.approx([math.sqrt(10), math.sqrt(20), math.sqrt(90), math.sqrt(5)])
    out2 = pts.withColumn("r", compile_lambda('lambda: pow(2.0, 3.0)'))
    assert _vals(out2) == [8.0] * 4
    out3 = pts.withColumn("r", compile_lambda('lambda: if("value" > 15.0, \'big\', \'small\')'))
    assert _vals(out3) == ["small", "big", "big", "small"]


def test_string_functions(pts):
    cases = {
        'strToUpper("host")': ["SERVERA", "SERVERA", "SERVERA", "SERVERB"],
        'strLength("svc")': [3, 3, 3, 3],
        'strHasPrefix("host", \'server\')': [True] * 4,
        'strContains("svc", \'eb\')': [True, True, False, False],
        'strIndex("host", \'ver\')': [3, 3, 3, 3],
        'strIndex("host", \'zz\')': [-1] * 4,
        'strLastIndex("host", \'r\')': [5, 5, 5, 5],
        'strSubstring("host", 0, 6)': ["server"] * 4,
        'strReplace("svc", \'w\', \'W\', -1)': ["Web", "Web", "api", "api"],
        'strTrimPrefix("host", \'server\')': ["A", "A", "A", "B"],
        'strTrimSuffix("host", \'A\')': ["server", "server", "server", "serverB"],
    }
    for expr, want in cases.items():
        got = _vals(pts.withColumn("r", compile_lambda(f"lambda: {expr}")))
        assert got == want, expr


def test_conversion_and_time(pts):
    out = pts.withColumn("r", compile_lambda('lambda: int("value")'))
    assert _vals(out) == [10, 20, 90, -5]
    out2 = pts.withColumn("r", compile_lambda('lambda: minute("t")'))
    assert _vals(out2) == [0, 0, 0, 0]
    out3 = pts.withColumn("r", compile_lambda('lambda: year("t")'))
    assert _vals(out3) == [2024] * 4


def test_duration_literal_vs_unixnano(pts):
    # 10s duration literal = 10e9 ns; points are 10s apart
    df = pts.withColumn("ns", compile_lambda('lambda: unixNano("t")'))
    rows = _vals(df, "ns")
    assert rows[1] - rows[0] == 10_000_000_000
    # points at :00/:10/:20/:30 — only :00 and :20 are 20s-aligned
    keep = pts.filter(compile_lambda('lambda: unixNano("t") % 20s == 0'))
    assert sorted(r.id for r in keep.collect()) == [1, 3]


def test_stateful_sigma_count_spread(pts):
    p = Pipeline.from_df(pts, time_col="t", dims=("host",), tiebreak=("id",))
    out = p.eval(
        n='lambda: count()',
        sp='lambda: spread("value")',
        sg='lambda: sigma("value")',
    ).result()
    rows = {r.id: r for r in out.collect()}
    assert [rows[i]["n"] for i in (1, 2, 3)] == [1.0, 2.0, 3.0]
    assert rows[4]["n"] == 1.0  # serverB = separate group state
    assert [rows[i]["sp"] for i in (1, 2, 3)] == [0.0, 10.0, 80.0]
    assert rows[1]["sg"] == 0.0
    assert rows[2]["sg"] == pytest.approx(abs(20 - 15) / math.sqrt(50))
    mean3, sd3 = 40.0, math.sqrt(((10 - 40) ** 2 + (20 - 40) ** 2 + (90 - 40) ** 2) / 2)
    assert rows[3]["sg"] == pytest.approx(abs(90 - mean3) / sd3)


def test_stateful_requires_ordering(pts):
    with pytest.raises(ValueError, match="stateful"):
        pts.filter(compile_lambda('lambda: sigma("value") > 1.0'))


def test_errors():
    with pytest.raises(ValueError, match="unknown function"):
        compile_lambda("lambda: nosuch(1)")
    with pytest.raises(ValueError, match="tokenize"):
        compile_lambda('lambda: "v" > 10 @')
    with pytest.raises(ValueError, match="trailing"):
        compile_lambda("lambda: 1 2")
