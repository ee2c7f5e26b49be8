"""Task-store + replay REST layer (kapacitor_spark.server) — the
reference's HTTP CRUD surface (services/task_store/service.go routes,
services/replay) driven over a real local socket: define/list/update/
delete tasks and templates, template-task instantiation, JSON-file
persistence across restarts, enable→execution through an injected
run_tickscript executor, and POST /replays over a real .srpl recording.
"""

import json
import urllib.error
import urllib.request

import pytest
from pyspark.sql import functions as F

from kapacitor_spark.server import BASE_PATH, TaskStoreService

SCRIPT = """
stream
    |from()
        .measurement('cpu')
    |window()
        .period(4s)
        .every(4s)
    |mean('value')
        .as('mean_value')
    |httpOut('out')
"""

TEMPLATE = """
var period = 4s
var field = 'value'
stream
    |from()
        .measurement('cpu')
    |window()
        .period(period)
        .every(period)
    |mean(field)
        .as('mean_value')
    |httpOut('out')
"""


def _req(port, method, path, body=None, expect_error=False):
    url = f"http://127.0.0.1:{port}{BASE_PATH}{path}"
    data = json.dumps(body).encode() if body is not None else None
    req = urllib.request.Request(url, data=data, method=method)
    if data:
        req.add_header("Content-Type", "application/json")
    try:
        with urllib.request.urlopen(req) as resp:
            raw = resp.read()
            return resp.status, json.loads(raw) if raw else None
    except urllib.error.HTTPError as e:
        if not expect_error:
            raise
        raw = e.read()
        return e.code, json.loads(raw) if raw else None


@pytest.fixture()
def svc(tmp_path):
    service = TaskStoreService(store_dir=str(tmp_path / "store"))
    port = service.start()
    yield service, port
    service.stop()


def test_ping_and_task_crud_roundtrip(svc):
    _, port = svc
    status, _ = _req(port, "GET", "/ping")
    assert status == 204
    status, task = _req(
        port, "POST", "/tasks",
        {"id": "t1", "type": "stream", "script": SCRIPT,
         "dbrps": [{"db": "telegraf", "rp": "autogen"}]},
    )
    assert status == 200
    assert task["id"] == "t1" and task["status"] == "disabled"
    assert task["link"]["href"].endswith("/tasks/t1")
    assert "digraph" in task["dot"]  # task_dot rendered on read
    status, got = _req(port, "GET", "/tasks/t1")
    assert status == 200 and got["script"] == SCRIPT
    status, upd = _req(port, "PATCH", "/tasks/t1", {"script": SCRIPT.replace("4s", "8s")})
    assert status == 200 and "8s" in upd["script"]
    assert upd["modified"] >= upd["created"]
    status, _ = _req(port, "DELETE", "/tasks/t1")
    assert status == 204
    status, err = _req(port, "GET", "/tasks/t1", expect_error=True)
    assert status == 404 and "no task exists" in err["error"]


def test_list_pattern_offset_limit(svc):
    _, port = svc
    for tid in ("alpha", "alert-a", "alert-b", "beta"):
        _req(port, "POST", "/tasks", {"id": tid, "script": SCRIPT})
    _, all_tasks = _req(port, "GET", "/tasks")
    assert [t["id"] for t in all_tasks["tasks"]] == ["alert-a", "alert-b", "alpha", "beta"]
    _, filtered = _req(port, "GET", "/tasks?pattern=alert-*")
    assert [t["id"] for t in filtered["tasks"]] == ["alert-a", "alert-b"]
    _, page = _req(port, "GET", "/tasks?offset=1&limit=2")
    assert [t["id"] for t in page["tasks"]] == ["alert-b", "alpha"]


def test_create_validation_errors(svc):
    _, port = svc
    status, err = _req(port, "POST", "/tasks", {"id": "bad id!", "script": SCRIPT},
                       expect_error=True)
    assert status == 400 and "letters, numbers" in err["error"]
    status, err = _req(port, "POST", "/tasks", {"id": "t2"}, expect_error=True)
    assert status == 400 and "must provide TICKscript" in err["error"]
    status, err = _req(port, "POST", "/tasks",
                       {"id": "t3", "script": "stream |nosuchnode()"}, expect_error=True)
    assert status == 400 and "invalid TICKscript" in err["error"]
    _req(port, "POST", "/tasks", {"id": "dup", "script": SCRIPT})
    status, err = _req(port, "POST", "/tasks", {"id": "dup", "script": SCRIPT},
                       expect_error=True)
    assert status == 400 and "already exists" in err["error"]
    # invalid update must not clobber the stored script
    status, err = _req(port, "PATCH", "/tasks/dup", {"script": "stream |zzz()"},
                       expect_error=True)
    assert status == 400
    _, got = _req(port, "GET", "/tasks/dup")
    assert got["script"] == SCRIPT


def test_templates_and_template_tasks(svc):
    _, port = svc
    status, tpl = _req(port, "POST", "/templates",
                       {"id": "tmpl1", "type": "stream", "script": TEMPLATE})
    assert status == 200
    # declared vars with reference type names (template.go Vars)
    assert tpl["vars"]["period"] == {"value": "4s", "type": "duration"}
    assert tpl["vars"]["field"] == {"value": "value", "type": "string"}
    status, task = _req(port, "POST", "/tasks",
                        {"id": "from-tmpl", "template-id": "tmpl1",
                         "vars": {"period": "8s"}})
    assert status == 200
    assert task["script"] == TEMPLATE and task["type"] == "stream"
    assert task["vars"] == {"period": "8s"}
    status, err = _req(port, "POST", "/tasks",
                       {"id": "x", "template-id": "nope"}, expect_error=True)
    assert status == 400 and "unknown template" in err["error"]


def test_store_persists_across_restart(tmp_path):
    d = str(tmp_path / "store")
    s1 = TaskStoreService(store_dir=d)
    p1 = s1.start()
    _req(p1, "POST", "/tasks", {"id": "durable", "script": SCRIPT})
    s1.stop()
    s2 = TaskStoreService(store_dir=d)
    p2 = s2.start()
    try:
        status, got = _req(p2, "GET", "/tasks/durable")
        assert status == 200 and got["script"] == SCRIPT
    finally:
        s2.stop()


def test_enable_executes_task_via_run_tickscript(spark, tmp_path):
    """The CRUD layer drives the ENGINE: enabling a task hands it to the
    injected executor, which runs the stored TICKscript with
    run_tickscript over a real DataFrame; httpOut results land where the
    executor puts them, and template vars stored on the task apply."""
    from kapacitor_spark.tick import run_tickscript

    rows = [(i, f"2024-01-01 00:00:{i:02d}", 90.0 + i) for i in range(8)]
    cpu = spark.createDataFrame(rows, "id long, time string, value double").withColumn(
        "time", F.to_timestamp("time")
    )
    results = {}

    def executor(task):
        outs = run_tickscript(
            task["script"], sources={"cpu": cpu}, time_col="time",
            tiebreak=("id",), template_vars=task.get("vars") or None,
        )
        results[task["id"]] = {k: v.collect() for k, v in outs.items()}

    service = TaskStoreService(store_dir=str(tmp_path / "store"), executor=executor)
    port = service.start()
    try:
        _req(port, "POST", "/tasks", {"id": "winmean", "script": SCRIPT})
        status, task = _req(port, "PATCH", "/tasks/winmean", {"status": "enabled"})
        assert status == 200 and task["executing"] and task["error"] == ""
        got = sorted(r["mean_value"] for r in results["winmean"]["out"])
        assert got == [pytest.approx((90 + 91 + 92 + 93) / 4),
                       pytest.approx((94 + 95 + 96 + 97) / 4)]
        # create-with-enabled executes immediately too, with stored vars
        _req(port, "POST", "/templates", {"id": "tm", "script": TEMPLATE})
        status, t2 = _req(port, "POST", "/tasks",
                          {"id": "tmpl-run", "template-id": "tm",
                           "vars": {"period": "8s"}, "status": "enabled"})
        assert status == 200 and t2["executing"]
        got2 = [r["mean_value"] for r in results["tmpl-run"]["out"]]
        assert got2 == [pytest.approx(sum(90.0 + i for i in range(8)) / 8)]
        # executor failure surfaces on the task, not as a 500
        def boom(task):
            raise RuntimeError("no such source")

        service.executor = boom
        _req(port, "POST", "/tasks", {"id": "failing", "script": SCRIPT})
        status, t3 = _req(port, "PATCH", "/tasks/failing", {"status": "enabled"})
        assert status == 200
        assert not t3["executing"] and "no such source" in t3["error"]
    finally:
        service.stop()


def test_recordings_and_replays(spark, tmp_path):
    """POST /replays runs a stored task against a real .srpl recording
    through the injected replayer (replay_srpl + run_tickscript) — the
    reference's services/replay HTTP surface over this repo's replay
    engine."""
    from kapacitor_spark.sources.line_protocol import promote, replay_srpl
    from kapacitor_spark.tick import run_tickscript

    rec_dir = tmp_path / "recordings"
    rec_dir.mkdir()
    lines = []
    for i in range(8):
        lines += ["telegraf", "autogen", f"cpu,host=serverA value={90 + i} {i}"]
    (rec_dir / "rec1.srpl").write_text("\n".join(lines) + "\n")

    results = {}

    def replayer(task, path, kind):
        assert kind == "srpl"
        raw = replay_srpl(spark, path, precision="s")
        cpu = promote(raw, "cpu", float_fields=["value"], keep_name=True)
        outs = run_tickscript(task["script"], sources={"cpu": cpu}, time_col="time")
        results[task["id"]] = {k: v.collect() for k, v in outs.items()}

    service = TaskStoreService(
        store_dir=str(tmp_path / "store"), replayer=replayer,
        recordings_dir=str(rec_dir),
    )
    port = service.start()
    try:
        _, recs = _req(port, "GET", "/recordings")
        assert [r["id"] for r in recs["recordings"]] == ["rec1"]
        assert recs["recordings"][0]["type"] == "stream"
        _req(port, "POST", "/tasks", {"id": "rtask", "script": SCRIPT})
        status, rep = _req(port, "POST", "/replays",
                           {"task": "rtask", "recording": "rec1"})
        assert status == 201 and rep["status"] == "finished" and rep["error"] == ""
        vals = sorted(r["mean_value"] for r in results["rtask"]["out"])
        assert vals == [pytest.approx((90 + 91 + 92 + 93) / 4),
                        pytest.approx((94 + 95 + 96 + 97) / 4)]
        _, lst = _req(port, "GET", "/replays")
        assert [r["id"] for r in lst["replays"]] == [rep["id"]]
        status, err = _req(port, "POST", "/replays",
                           {"task": "rtask", "recording": "nope"}, expect_error=True)
        assert status == 404
        service.replayer = None
        status, err = _req(port, "POST", "/replays",
                           {"task": "rtask", "recording": "rec1"}, expect_error=True)
        assert status == 501 and "no replayer" in err["error"]
    finally:
        service.stop()


def test_client_input_hardening(svc):
    """Round-9 review fixes: malformed pagination is a 400 (not a 500),
    replay recording ids reject path traversal, and a disabled task no
    longer reports executing=true."""
    _, port = svc
    status, err = _req(port, "GET", "/tasks?limit=abc", expect_error=True)
    assert status == 400 and "integer" in err["error"]
    _req(port, "POST", "/tasks", {"id": "h1", "script": SCRIPT})
    status, err = _req(
        port, "POST", "/replays",
        {"task": "h1", "recording": "../../../etc/passwd"},
        expect_error=True,
    )
    assert status == 400 and "invalid recording id" in err["error"]
    status, err = _req(
        port, "POST", "/replays", {"task": "h1", "recording": ".."},
        expect_error=True,
    )
    assert status == 400
    # executing resets when the task leaves enabled
    _req(port, "PATCH", "/tasks/h1", {"status": "enabled"})
    _req(port, "PATCH", "/tasks/h1", {"status": "disabled"})
    _, got = _req(port, "GET", "/tasks/h1")
    assert got["status"] == "disabled" and got["executing"] is False


def test_concurrent_duplicate_create_single_winner(svc):
    """put_new makes exists-check + insert atomic: N threads racing the
    same id yield exactly one 200 and N-1 'already exists' 400s."""
    import threading

    _, port = svc
    results = []

    def create():
        status, _ = _req(
            port, "POST", "/tasks", {"id": "race", "script": SCRIPT},
            expect_error=True,
        )
        results.append(status)

    threads = [threading.Thread(target=create) for _ in range(8)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert sorted(results) == [200] + [400] * 7


def test_streaming_task_end_to_end(spark, tmp_path):
    """VERDICT r9 #6: one STREAMING TICK task through the REST loop —
    POST a stream|from|window|mean|httpOut task, enable it against a
    live file-stream landing dir via the streaming compile target
    (run_tickscript_stream -> Structured Streaming window aggregation,
    driven deterministically with run_available_now), then land MORE
    data and replay a .srpl recording into the same landing dir and
    re-drive: the checkpoint carries streaming state across runs, so the
    second pass processes only the newly-arrived files yet (complete
    mode) emits every window."""
    from kapacitor_spark.sources.line_protocol import replay_srpl
    from kapacitor_spark.streaming import run_available_now
    from kapacitor_spark.tick import run_tickscript_stream

    landing = tmp_path / "landing"
    landing.mkdir()
    ckpt = str(tmp_path / "ckpt")

    def write_batch(rows, name):
        df = spark.createDataFrame(
            rows, "id long, time string, host string, value double"
        ).withColumn("time", F.to_timestamp("time"))
        df.coalesce(1).write.mode("append").parquet(str(landing / name))

    write_batch(
        [(i, f"2024-01-01 00:00:{i:02d}", "serverA", 90.0 + i) for i in range(8)],
        "b1",
    )
    schema = "id long, time timestamp, host string, value double"

    STREAM_SCRIPT = """
var period = 4s
stream
    |from()
        .measurement('cpu')
        .where(lambda: "host" == 'serverA')
    |window()
        .period(period)
        .every(period)
    |mean('value')
        .as('mean_value')
    |httpOut('win')
"""
    results = {}

    def executor(task):
        sdf = (
            spark.readStream.schema(schema)
            .option("recursiveFileLookup", "true")
            .parquet(str(landing))
        )
        outs = run_tickscript_stream(
            task["script"], sources={"cpu": sdf}, time_col="time"
        )
        res = run_available_now(
            outs["win"], f"tick_stream_{task['id']}", ckpt,
            output_mode="complete",
        )
        results[task["id"]] = res.collect()

    rec_dir = tmp_path / "recordings"
    rec_dir.mkdir()
    lines = []
    for i in range(4):
        lines += ["telegraf", "autogen",
                  f"cpu,host=serverA value={200 + i} {i}"]
    (rec_dir / "live.srpl").write_text("\n".join(lines) + "\n")

    def replayer(task, path, kind):
        # replay = land the recorded points into the task's data plane
        # (rebased so the recording starts at 00:00:12 — one more 4s
        # window [12,16)), then re-drive the query off its checkpoint
        raw = replay_srpl(spark, path, precision="s", zero="2024-01-01 00:00:12")
        pts = raw.selectExpr(
            "monotonically_increasing_id() + 1000 AS id",
            "time",
            "tags['host'] AS host",
            "fields_f['value'] AS value",
        )
        pts.coalesce(1).write.mode("append").parquet(str(landing / "replayed"))
        executor(task)

    service = TaskStoreService(
        store_dir=str(tmp_path / "store"), executor=executor,
        replayer=replayer, recordings_dir=str(rec_dir),
    )
    port = service.start()
    try:
        _req(port, "POST", "/tasks", {"id": "swin", "script": STREAM_SCRIPT})
        status, task = _req(port, "PATCH", "/tasks/swin", {"status": "enabled"})
        assert status == 200 and task["executing"] and task["error"] == ""
        got = sorted(r["mean_value"] for r in results["swin"])
        assert got == [pytest.approx((90 + 91 + 92 + 93) / 4),
                       pytest.approx((94 + 95 + 96 + 97) / 4)]

        # more data lands; replay drives the SAME checkpointed query —
        # only new files process, complete mode re-emits all windows
        status, rep = _req(port, "POST", "/replays",
                           {"task": "swin", "recording": "live"})
        assert status == 201 and rep["status"] == "finished" and rep["error"] == ""
        got2 = sorted(r["mean_value"] for r in results["swin"])
        assert got2 == [pytest.approx(91.5), pytest.approx(95.5),
                        pytest.approx((200 + 201 + 202 + 203) / 4)]
    finally:
        service.stop()


def test_streaming_alert_task_end_to_end(spark, tmp_path):
    """VERDICT r10 #2, task-store leg: the canonical live task —
    alert().crit().stateChangesOnly() — enables through the REST loop
    onto the streaming compile target (keyed alert state machine), not
    the batch replay."""
    from kapacitor_spark.streaming import run_available_now
    from kapacitor_spark.tick import run_tickscript_stream

    landing = tmp_path / "landing"
    landing.mkdir()
    vals = [10.0, 95.0, 96.0, 20.0, 97.0]
    df = spark.createDataFrame(
        [(i, f"2024-01-01 00:00:{i:02d}", "serverA", v)
         for i, v in enumerate(vals)],
        "id long, time string, host string, value double",
    ).withColumn("time", F.to_timestamp("time"))
    df.coalesce(1).write.parquet(str(landing / "b1"))

    SCRIPT = """
stream
    |from()
        .measurement('cpu')
        .groupBy('host')
    |alert()
        .crit(lambda: "value" > 90)
        .stateChangesOnly()
    |httpOut('alerts')
"""
    results = {}

    def executor(task):
        sdf = (
            spark.readStream.schema(
                "id long, time timestamp, host string, value double"
            )
            .option("recursiveFileLookup", "true")
            .parquet(str(landing))
        )
        outs = run_tickscript_stream(
            task["script"], sources={"cpu": sdf}, time_col="time"
        )
        res = run_available_now(
            outs["alerts"], f"tick_salert_{task['id']}",
            str(tmp_path / "ckpt"),
        )
        results[task["id"]] = res.collect()

    service = TaskStoreService(
        store_dir=str(tmp_path / "store"), executor=executor
    )
    port = service.start()
    try:
        _req(port, "POST", "/tasks", {"id": "salert", "script": SCRIPT})
        status, task = _req(port, "PATCH", "/tasks/salert",
                            {"status": "enabled"})
        assert status == 200 and task["executing"] and task["error"] == ""
        got = sorted((r["id"], r["level"]) for r in results["salert"])
        # transitions only: 95 CRIT, 20 OK recovery, 97 CRIT (96 steady
        # suppressed, initial 10=OK not a transition)
        assert got == [(1, "CRITICAL"), (3, "OK"), (4, "CRITICAL")]
    finally:
        service.stop()


def test_streaming_compile_subset_is_honest(spark):
    """Chain methods outside the streaming subset raise TickError naming
    the batch alternative — never a silently-wrong streaming plan."""
    from kapacitor_spark.tick import TickError, run_tickscript_stream

    sdf = spark.readStream.format("rate").load()
    # flatten()/combine() joined the subset in the r11 2nd wave;
    # sink nodes beyond httpOut (httpPost et al.) stay out
    with pytest.raises(TickError, match="streaming compile subset"):
        run_tickscript_stream(
            "stream|from()|httpPost('http://localhost:1')|httpOut('x')",
            sources={"cpu": sdf}, time_col="timestamp",
        )
    with pytest.raises(TickError, match="no httpOut"):
        run_tickscript_stream(
            "stream|from().measurement('cpu')",
            sources={"cpu": sdf}, time_col="timestamp",
        )


def test_streaming_alert_levels(spark, tmp_path):
    """|alert() in the streaming subset: stateless crit/warn level CASE
    on windowed aggregates (crit wins over warn regardless of prop
    order); the stateful alert knobs raise toward the batch replay."""
    from kapacitor_spark.streaming import run_available_now
    from kapacitor_spark.tick import TickError, run_tickscript_stream

    rows = (
        [(i, f"2024-01-01 00:00:{i:02d}", "h", 10.0) for i in range(4)]
        + [(i + 10, f"2024-01-01 00:00:{4 + i:02d}", "h", 60.0) for i in range(4)]
        + [(i + 20, f"2024-01-01 00:00:{8 + i:02d}", "h", 95.0) for i in range(4)]
    )
    df = spark.createDataFrame(
        rows, "id long, time string, host string, value double"
    ).withColumn("time", F.to_timestamp("time"))
    src = tmp_path / "in"
    df.coalesce(1).write.parquet(str(src))
    sdf = spark.readStream.schema(
        "id long, time timestamp, host string, value double"
    ).parquet(str(src))
    script = """
stream
    |from()
        .measurement('cpu')
    |window()
        .period(4s)
        .every(4s)
    |mean('value')
        .as('mv')
    |alert()
        .warn(lambda: "mv" > 50)
        .crit(lambda: "mv" > 90)
    |httpOut('alerts')
"""
    outs = run_tickscript_stream(script, sources={"cpu": sdf}, time_col="time")
    res = run_available_now(
        outs["alerts"], "tick_stream_alert", str(tmp_path / "ck"),
        output_mode="complete",
    )
    got = {str(r["time"]): (round(r["mv"], 3), r["level"]) for r in res.collect()}
    assert got == {
        "2024-01-01 00:00:00": (10.0, "OK"),
        "2024-01-01 00:00:04": (60.0, "WARNING"),
        "2024-01-01 00:00:08": (95.0, "CRITICAL"),
    }
    # .stateChangesOnly() AFTER a windowed aggregation compiles since
    # the r11 2nd wave — as the FUSED single keyed operator
    # (window_alert_stream). The UNGROUPED form compiles too since the
    # r11 3rd wave: one synthetic group key, serial at the fused stage
    # like the reference's ungrouped stream task.
    # (Grouped stream==batch parity: test_tick_stream.py.)
    ungrouped = run_tickscript_stream(
        script.replace("|httpOut('alerts')",
                       ".stateChangesOnly()\n    |httpOut('alerts')"),
        sources={"cpu": sdf}, time_col="time",
    )
    assert ungrouped["alerts"].isStreaming
    uplan = ungrouped["alerts"]._jdf.queryExecution().analyzed().toString()
    assert uplan.count("FlatMapGroupsInPandasWithState") == 1
    grouped = run_tickscript_stream(
        script.replace("|httpOut('alerts')",
                       ".stateChangesOnly()\n    |httpOut('alerts')")
        .replace(".measurement('cpu')",
                 ".measurement('cpu')\n        .groupBy('host')"),
        sources={"cpu": sdf}, time_col="time",
    )
    assert grouped["alerts"].isStreaming


def test_alert_topics_and_handlers_api(tmp_path):
    """The alert REST surface (/root/reference/services/alert/api.go;
    JSON shapes per client/v1/client.go Topics/TopicEvents/TopicHandler):
    topic listing with min-level + pattern, per-topic events, handler
    CRUD incl. the JSON-Patch subset, topic DELETE, and handler
    persistence across a service restart."""
    from kapacitor_spark.topics import TopicStore

    ts = TopicStore(str(tmp_path / "topics"))
    ts.collect("cpu", "h1", "CRITICAL", message="cpu hot",
               time="2024-01-01 00:00:05", duration_ns=5_000_000_000)
    ts.collect("cpu", "h2", "WARNING")
    ts.collect("mem", "h1", "OK")
    service = TaskStoreService(
        store_dir=str(tmp_path / "store"), topic_store=ts
    )
    port = service.start()
    try:
        st, topics = _req(port, "GET", "/alerts/topics")
        assert st == 200
        ids = {t["id"]: t for t in topics["topics"]}
        assert set(ids) == {"cpu", "mem"}
        assert ids["cpu"]["level"] == "CRITICAL"
        assert ids["cpu"]["collected"] == 2
        assert ids["cpu"]["events-link"]["href"].endswith(
            "/alerts/topics/cpu/events"
        )
        # min-level + glob pattern filters (the reference's list opts)
        st, warn = _req(
            port, "GET", "/alerts/topics?min-level=WARNING"
        )
        assert [t["id"] for t in warn["topics"]] == ["cpu"]
        st, pat = _req(port, "GET", "/alerts/topics?pattern=m*")
        assert [t["id"] for t in pat["topics"]] == ["mem"]

        st, topic = _req(port, "GET", "/alerts/topics/cpu")
        assert st == 200 and topic["level"] == "CRITICAL"
        st, err = _req(
            port, "GET", "/alerts/topics/nope", expect_error=True
        )
        assert st == 404

        st, evs = _req(port, "GET", "/alerts/topics/cpu/events")
        assert st == 200 and evs["topic"] == "cpu"
        by_id = {e["id"]: e["state"] for e in evs["events"]}
        assert by_id["h1"]["level"] == "CRITICAL"
        assert by_id["h1"]["duration"] == 5_000_000_000
        assert by_id["h1"]["message"] == "cpu hot"
        st, one = _req(port, "GET", "/alerts/topics/cpu/events/h2")
        assert st == 200 and one["state"]["level"] == "WARNING"
        st, evs = _req(
            port, "GET", "/alerts/topics/cpu/events?min-level=CRITICAL"
        )
        assert [e["id"] for e in evs["events"]] == ["h1"]

        # handler CRUD
        st, h = _req(
            port, "POST", "/alerts/topics/cpu/handlers",
            {"id": "slack1", "kind": "slack",
             "options": {"channel": "#ops"},
             "match": "level() == CRITICAL"},
        )
        assert st == 200 and h["kind"] == "slack"
        assert h["link"]["href"].endswith(
            "/alerts/topics/cpu/handlers/slack1"
        )
        st, err = _req(
            port, "POST", "/alerts/topics/cpu/handlers",
            {"id": "slack1", "kind": "slack"}, expect_error=True,
        )
        assert st == 400 and "exists" in err["error"]
        st, err = _req(
            port, "POST", "/alerts/topics/cpu/handlers",
            {"id": "bad", "kind": "log", "match": "level() === X"},
            expect_error=True,
        )
        assert st == 400 and "match" in err["error"]

        st, hs = _req(port, "GET", "/alerts/topics/cpu/handlers")
        assert [x["id"] for x in hs["handlers"]] == ["slack1"]
        # JSON-Patch subset (the reference's client.JSONPatch)
        st, h = _req(
            port, "PATCH", "/alerts/topics/cpu/handlers/slack1",
            [{"op": "replace", "path": "/kind", "value": "log"},
             {"op": "replace", "path": "/options/path",
              "value": "/tmp/alerts.log"},
             {"op": "remove", "path": "/options/channel"}],
        )
        assert st == 200 and h["kind"] == "log"
        assert h["options"] == {"path": "/tmp/alerts.log"}
        # PUT replaces wholesale
        st, h = _req(
            port, "PUT", "/alerts/topics/cpu/handlers/slack1",
            {"kind": "post", "options": {"url": "http://example.com"}},
        )
        assert st == 200 and h["kind"] == "post" and h["match"] == ""
    finally:
        service.stop()

    # handlers persist across restart (same store dir)
    s2 = TaskStoreService(
        store_dir=str(tmp_path / "store"), topic_store=ts
    )
    p2 = s2.start()
    try:
        st, hs = _req(p2, "GET", "/alerts/topics/cpu/handlers")
        assert [x["id"] for x in hs["handlers"]] == ["slack1"]
        assert hs["handlers"][0]["kind"] == "post"
        # DELETE topic removes its state AND its handlers
        st, _ = _req(p2, "DELETE", "/alerts/topics/cpu")
        assert st == 204
        st, topics = _req(p2, "GET", "/alerts/topics")
        assert [t["id"] for t in topics["topics"]] == ["mem"]
        st, hs = _req(p2, "GET", "/alerts/topics/cpu/handlers")
        assert hs["handlers"] == []
    finally:
        s2.stop()


def test_rest_registered_handlers_receive_events(spark, tmp_path):
    """REST-registered handler specs are LIVE: dispatch_events routes an
    alert-event DataFrame through them via the same
    register_handler_spec path the YAML define-topic-handler contract
    uses — match conditions and topic scoping included."""
    import datetime as dt

    Z = dt.timezone.utc
    rows = [
        (dt.datetime(2024, 1, 1, 0, 0, 5, tzinfo=Z), "cpu", "CRITICAL",
         "OK", "c1", 0, "cpu-alerts"),
        (dt.datetime(2024, 1, 1, 0, 0, 20, tzinfo=Z), "cpu", "WARNING",
         "CRITICAL", "w1", 0, "cpu-alerts"),
        (dt.datetime(2024, 1, 1, 0, 0, 40, tzinfo=Z), "mem", "CRITICAL",
         "OK", "m1", 0, "mem-alerts"),
    ]
    ev = spark.createDataFrame(
        rows,
        "ts timestamp, name string, level string, prev string, "
        "message string, duration long, topic string",
    )
    service = TaskStoreService(store_dir=str(tmp_path / "store"))
    port = service.start()
    log_a = tmp_path / "cpu.jsonl"
    log_b = tmp_path / "crit.jsonl"
    try:
        _req(port, "POST", "/alerts/topics/cpu-alerts/handlers",
             {"id": "all-log", "kind": "log",
              "options": {"path": str(log_a)}})
        _req(port, "POST", "/alerts/topics/cpu-alerts/handlers",
             {"id": "crit-log", "kind": "log",
              "options": {"path": str(log_b)},
              "match": "level() == CRITICAL"})
        service.dispatch_events(ev)
    finally:
        service.stop()
    msgs = lambda p: sorted(
        json.loads(l)["message"] for l in p.read_text().splitlines()
    )
    assert msgs(log_a) == ["c1", "w1"]   # topic-scoped, all levels
    assert msgs(log_b) == ["c1"]         # + match condition


def test_alert_api_hardening(tmp_path):
    """The review fixes: bad min-level 400s (not 500), unsupported
    handler kinds are rejected at create, and a failed PATCH leaves the
    stored spec untouched (deep-copy before applying patch ops)."""
    service = TaskStoreService(store_dir=str(tmp_path / "store"))
    port = service.start()
    try:
        st, err = _req(
            port, "GET", "/alerts/topics?min-level=warn",
            expect_error=True,
        )
        assert st == 400 and "min-level" in err["error"]
        st, err = _req(
            port, "POST", "/alerts/topics/t/handlers",
            {"id": "h", "kind": "nosuch"}, expect_error=True,
        )
        assert st == 400 and "unsupported handler kind" in err["error"]

        _req(port, "POST", "/alerts/topics/t/handlers",
             {"id": "h", "kind": "post",
              "options": {"url": "http://127.0.0.1:1/x"}})
        # a patch whose match is invalid must not half-apply the
        # nested option ops it carried
        st, err = _req(
            port, "PATCH", "/alerts/topics/t/handlers/h",
            [{"op": "replace", "path": "/options/url",
              "value": "http://mutated/"},
             {"op": "replace", "path": "/match", "value": "level() === X"}],
            expect_error=True,
        )
        assert st == 400
        st, h = _req(port, "GET", "/alerts/topics/t/handlers/h")
        assert h["options"]["url"] == "http://127.0.0.1:1/x"
        st, err = _req(
            port, "GET", "/alerts/topics/t/events?min-level=zz",
            expect_error=True,
        )
        assert st == 400
    finally:
        service.stop()


def test_dispatch_events_changed_match_and_isolation(spark, tmp_path):
    """changed() match conditions read the prev-level column
    (auto-detected as 'prev'), and one unbuildable spec is skipped with
    a report instead of aborting delivery for working handlers."""
    import datetime as dt

    Z = dt.timezone.utc
    rows = [
        (dt.datetime(2024, 1, 1, tzinfo=Z), "cpu", "CRITICAL", "OK",
         "fresh", 0, "t"),
        (dt.datetime(2024, 1, 1, 0, 1, tzinfo=Z), "cpu", "CRITICAL",
         "CRITICAL", "steady", 0, "t"),
    ]
    ev = spark.createDataFrame(
        rows,
        "ts timestamp, name string, level string, prev string, "
        "message string, duration long, topic string",
    )
    service = TaskStoreService(store_dir=str(tmp_path / "store"))
    port = service.start()
    log = tmp_path / "changed.jsonl"
    try:
        _req(port, "POST", "/alerts/topics/t/handlers",
             {"id": "ch", "kind": "log", "options": {"path": str(log)},
              "match": "changed() == TRUE"})
        # a spec that validates (kind known) but cannot BUILD (log with
        # no path) must not abort the working handler
        _req(port, "POST", "/alerts/topics/t/handlers",
             {"id": "broken", "kind": "log", "options": {}})
        skipped = service.dispatch_events(ev)
    finally:
        service.stop()
    assert [k for k, _ in skipped] == ["t/broken"]
    msgs = [json.loads(l)["message"] for l in log.read_text().splitlines()]
    assert msgs == ["fresh"]  # changed() passes only the transition row
