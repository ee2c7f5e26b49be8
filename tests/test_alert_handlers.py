"""Alert handler payload parity — field-for-field against the
reference's own handler integration goldens (TestStream_AlertSlack,
TestStream_AlertPagerDuty2, TestStream_AlertOpsGenie2,
TestStream_AlertVictorOps, TestStream_AlertTeams,
TestStream_AlertTelegram, TestStream_AlertAlerta, TestStream_AlertSensu,
TestStream_AlertPushover, TestStream_AlertHipChat,
TestStream_AlertDiscord, TestStream_AlertTalk —
/root/reference/integrations/streamer_test.go)."""

import datetime as dt
import http.server
import json
import os
import socketserver
import sys
import threading

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from kapacitor_spark.handlers import (
    AlertEvent,
    alerta_payload,
    bigpanda_payload,
    opsgenie_payload,
    pagerduty_payload,
    servicenow_event,
    zenoss_event,
    discord_payload,
    hipchat_payload,
    opsgenie2_payload,
    pagerduty2_payload,
    post_payload,
    pushover_payload,
    sensu_payload,
    slack_payload,
    talk_payload,
    teams_payload,
    telegram_payload,
    victorops_payload,
)

Z = dt.timezone.utc
T10 = dt.datetime(1971, 1, 1, 0, 0, 10, tzinfo=Z)
DATA = {
    "series": [
        {
            "name": "cpu",
            "tags": {"host": "serverA"},
            "columns": ["time", "count"],
            "values": [[T10, 10.0]],
        }
    ]
}
EV = AlertEvent(
    id="kapacitor/cpu/serverA",
    message="kapacitor/cpu/serverA is CRITICAL",
    time=T10,
    level="CRITICAL",
    task_name="TestStream_Alert",
    data=DATA,
)
# the Go-marshaled details string every service embeds
GO_DATA = (
    '{"series":[{"name":"cpu","tags":{"host":"serverA"},'
    '"columns":["time","count"],"values":[["1971-01-01T00:00:10Z",10]]}]}'
)


def test_slack_golden():
    """TestStream_AlertSlack: attachment fallback/text = message, color
    danger, mrkdwn_in [text], default username kapacitor."""
    p = slack_payload(EV, channel="@jim")
    assert p == {
        "channel": "@jim",
        "text": "",
        "attachments": [
            {
                "fallback": "kapacitor/cpu/serverA is CRITICAL",
                "color": "danger",
                "text": "kapacitor/cpu/serverA is CRITICAL",
                "mrkdwn_in": ["text"],
            }
        ],
        "username": "kapacitor",
        "icon_emoji": "",
    }
    assert slack_payload(
        AlertEvent(**{**EV.__dict__, "level": "WARNING"}), channel="#alerts"
    )["attachments"][0]["color"] == "warning"


def test_pagerduty2_golden():
    """TestStream_AlertPagerDuty2: PD-CEF with severity critical, source
    = host tag, class = task name, ns-precision RFC3339 timestamp."""
    ev = AlertEvent(**{**EV.__dict__, "message": "CRITICAL alert for kapacitor/cpu/serverA"})
    p = pagerduty2_payload(ev, routing_key="routing_key", client_url="http://kapacitor")
    assert p["event_action"] == "trigger"
    assert p["dedup_key"] == "kapacitor/cpu/serverA"
    assert p["client"] == "kapacitor"
    pl = p["payload"]
    assert pl["summary"] == "CRITICAL alert for kapacitor/cpu/serverA"
    assert pl["source"] == "serverA"
    assert pl["severity"] == "critical"
    assert pl["class"] == "TestStream_Alert"
    assert pl["timestamp"] == "1971-01-01T00:00:10.000000000Z"
    assert pl["custom_details"] == {"result": DATA}
    # OK → resolve, severity info
    ok = pagerduty2_payload(
        AlertEvent(**{**EV.__dict__, "level": "OK"}), routing_key="k"
    )
    assert ok["event_action"] == "resolve" and ok["payload"]["severity"] == "info"


def test_opsgenie2_golden():
    """TestStream_AlertOpsGenie2: urlsafe-base64 alias, P1 priority,
    details carry tags + task name, responders teams-then-users,
    description = Go-marshaled result."""
    path, p = opsgenie2_payload(
        EV, teams=["test_team", "another_team"],
        recipients=["test_recipient", "another_recipient"],
    )
    assert path == "/"
    assert p["message"] == "kapacitor/cpu/serverA is CRITICAL"
    assert p["entity"] == "kapacitor/cpu/serverA"
    assert p["alias"] == "a2FwYWNpdG9yL2NwdS9zZXJ2ZXJB"
    assert p["note"] == "" and p["priority"] == "P1"
    assert p["details"] == {
        "Level": "CRITICAL",
        "Monitoring Tool": "Kapacitor",
        "Kapacitor Task Name": "cpu",
        "host": "serverA",
    }
    assert p["description"] == GO_DATA
    assert p["responders"] == [
        {"name": "test_team", "type": "team"},
        {"name": "another_team", "type": "team"},
        {"username": "test_recipient", "type": "user"},
        {"username": "another_recipient", "type": "user"},
    ]
    # TestStream_AlertOpsGenie2_Recovery: OK routes to the alias recovery
    # endpoint with the message as a note
    rpath, rp = opsgenie2_payload(
        AlertEvent(**{**EV.__dict__, "level": "OK",
                      "message": "kapacitor/cpu/serverA is OK"}),
        recovery_action="notes",
    )
    assert rpath == "/a2FwYWNpdG9yL2NwdS9zZXJ2ZXJB/notes?identifierType=alias"
    assert rp == {"note": "kapacitor/cpu/serverA is OK"}


def test_victorops_golden():
    """TestStream_AlertVictorOps (+_JSON_Data): unix-seconds timestamp
    31536010, data as a Go-marshaled string (or raw JSON when the
    json-data config is on)."""
    p = victorops_payload(EV)
    assert p == {
        "message_type": "CRITICAL",
        "entity_id": "kapacitor/cpu/serverA",
        "state_message": "kapacitor/cpu/serverA is CRITICAL",
        "timestamp": 31536010,
        "monitoring_tool": "kapacitor",
        "data": GO_DATA,
    }
    assert victorops_payload(EV, json_data=True)["data"] == DATA


def test_teams_golden():
    """TestStream_AlertTeams: MessageCard with level-bracketed title and
    70-char summary cutoff."""
    p = teams_payload(EV)
    assert p == {
        "@type": "MessageCard",
        "@context": "http://schema.org/extensions",
        "title": "CRITICAL: [kapacitor/cpu/serverA]",
        "text": "kapacitor/cpu/serverA is CRITICAL",
        "summary": "CRITICAL: [kapacitor/cpu/serverA] - "
                   "kapacitor/cpu/serverA is CRITICAL...",
        "themeColor": "CC4A31",
    }


def test_telegram_golden():
    """TestStream_AlertTelegram: chat_id + text; parse_mode only when
    set; disable flags only when true; invalid parse mode rejected."""
    p = telegram_payload(
        EV, chat_id="12345678", parse_mode="HTML",
        disable_web_page_preview=True, disable_notification=True,
    )
    assert p == {
        "chat_id": "12345678",
        "text": "kapacitor/cpu/serverA is CRITICAL",
        "parse_mode": "HTML",
        "disable_web_page_preview": True,
        "disable_notification": True,
    }
    p2 = telegram_payload(EV, chat_id="87654321", disable_web_page_preview=True)
    assert p2 == {
        "chat_id": "87654321",
        "text": "kapacitor/cpu/serverA is CRITICAL",
        "disable_web_page_preview": True,
    }
    with pytest.raises(ValueError, match="parseMode"):
        telegram_payload(EV, chat_id="1", parse_mode="bogus")


def test_alerta_golden():
    """TestStream_AlertAlerta: both handler configs — defaults (origin
    Kapacitor, service [measurement], 1h timeout) and the fully
    templated override."""
    p = alerta_payload(
        EV, resource="cpu", event="serverA", environment="production",
        group="host=serverA", service=["cpu"], correlate=["cpu"],
        timeout_s=3600,
    )
    assert p["resource"] == "cpu" and p["event"] == "serverA"
    assert p["environment"] == "production"
    assert p["group"] == "host=serverA"
    assert p["text"] == (
        "kapacitor/cpu/serverA is CRITICAL @1971-01-01 00:00:10 +0000 UTC"
    )
    assert p["origin"] == "Kapacitor"
    assert p["service"] == ["cpu"] and p["correlate"] == ["cpu"]
    assert p["timeout"] == 3600 and "attributes" not in p
    assert p["severity"] == "critical"

    p2 = alerta_payload(
        EV, resource="resource: serverA", event="event: TestStream_Alert",
        environment="serverA", group="serverA", value="10",
        origin="override", service=["serviceA", "serviceB", "cpu"],
        correlate=["cpu"],
        attributes={"attributeA": "cpu", "attributeB": True, "attributeC": 9001.0},
        timeout_s=86400,
    )
    assert p2["origin"] == "override" and p2["value"] == "10"
    assert p2["attributes"] == {
        "attributeA": "cpu", "attributeB": True, "attributeC": 9001.0,
    }
    assert p2["timeout"] == 86400


def test_sensu_golden():
    """TestStream_AlertSensu: status 2 for CRITICAL; metadata merges
    without clobbering core fields."""
    ev = AlertEvent(**{**EV.__dict__,
                       "id": "kapacitor.cpu.serverA",
                       "message": "kapacitor.cpu.serverA is CRITICAL"})
    p = sensu_payload(
        ev, name="kapacitor.cpu.serverA",
        metadata={"k1": "v1", "k2": 5, "name": "ignored"},
    )
    assert p == {
        "name": "kapacitor.cpu.serverA",
        "source": "Kapacitor",
        "output": "kapacitor.cpu.serverA is CRITICAL",
        "status": 2,
        "handlers": [],
        "k1": "v1",
        "k2": 5,
    }


def test_pushover_golden():
    """TestStream_AlertPushover: priority by level (CRITICAL → 1), the
    @go-time message suffix, device/title/url/sound pass-through."""
    p = pushover_payload(
        EV, token="KzGDORePKggMaC0QOYAMyEEuzJnyUi", user_key="user",
        device="mydev", title="mytitle", url="http://example.com",
        url_title="myurltitle", sound="siren",
    )
    assert p == {
        "token": "KzGDORePKggMaC0QOYAMyEEuzJnyUi",
        "user": "user",
        "message": "kapacitor/cpu/serverA is CRITICAL "
                   "@1971-01-01 00:00:10 +0000 UTC",
        "device": "mydev",
        "title": "mytitle",
        "url": "http://example.com",
        "url_title": "myurltitle",
        "sound": "siren",
        "priority": 1,
    }
    assert pushover_payload(
        AlertEvent(**{**EV.__dict__, "level": "INFO"}), token="t", user_key="u"
    )["priority"] == -1


def test_hipchat_discord_talk_goldens():
    """TestStream_AlertHipChat / TestStream_AlertDiscord /
    TestStream_AlertTalk payload shapes."""
    assert hipchat_payload(EV) == {
        "from": "kapacitor",
        "color": "red",
        "message": "kapacitor/cpu/serverA is CRITICAL",
        "notify": True,
    }
    d = discord_payload(EV, username="testy")
    assert d == {
        "username": "testy",
        "avatar_url": "",
        "embeds": [
            {
                "color": 0xF95F53,
                "description": "kapacitor/cpu/serverA is CRITICAL",
                "title": "",
                "timestamp": "",
            }
        ],
    }
    t = talk_payload(AlertEvent(**{**EV.__dict__}))
    assert t == {
        "title": "kapacitor/cpu/serverA",
        "text": "kapacitor/cpu/serverA is CRITICAL",
        "authorName": "Kapacitor",
    }


def test_post_payload_delivery_and_go_json():
    """Delivery glue: the wire bytes are Go-marshal-compatible (integral
    floats as ints, RFC3339 Z times, no spaces)."""
    received = []

    class H(http.server.BaseHTTPRequestHandler):
        def do_POST(self):
            n = int(self.headers["Content-Length"])
            received.append(self.rfile.read(n))
            self.send_response(200)
            self.end_headers()

        def log_message(self, *a):
            pass

    with socketserver.TCPServer(("127.0.0.1", 0), H) as srv:
        port = srv.server_address[1]
        th = threading.Thread(target=srv.serve_forever, daemon=True)
        th.start()
        post_payload(
            f"http://127.0.0.1:{port}/", victorops_payload(EV),
        )
        srv.shutdown()
    body = json.loads(received[0])
    assert body["timestamp"] == 31536010
    assert body["data"] == GO_DATA
    # tolerant mode swallows connection errors
    post_payload("http://127.0.0.1:1/unreachable", {}, tolerant=True)
    with pytest.raises(Exception):
        post_payload("http://127.0.0.1:1/unreachable", {})


def test_pagerduty_v1_golden():
    """TestStream_AlertPagerDuty (+ TestStream_AlertPagerDuty2_ServiceKey
    covers the v2 routing-key override already asserted above): v1 events
    are service_key + event_type trigger/resolve; INFO is rejected."""
    ev = AlertEvent(**{**EV.__dict__,
                       "message": "CRITICAL alert for kapacitor/cpu/serverA"})
    p = pagerduty_payload(ev, service_key="service_key", client_url="http://kap")
    assert p == {
        "service_key": "service_key",
        "event_type": "trigger",
        "description": "CRITICAL alert for kapacitor/cpu/serverA",
        "incident_key": "",
        "client": "kapacitor",
        "client_url": "http://kap",
        "details": GO_DATA,
    }
    assert pagerduty_payload(
        AlertEvent(**{**EV.__dict__, "level": "OK"}), service_key="k"
    )["event_type"] == "resolve"
    with pytest.raises(ValueError, match="info"):
        pagerduty_payload(AlertEvent(**{**EV.__dict__, "level": "INFO"}), "k")


def test_opsgenie_v1_golden():
    """TestStream_AlertOpsGenie: v1 payload — plain-id alias, flat
    teams/recipients, two-key details."""
    p = opsgenie_payload(
        EV, api_key="api_key", teams=["test_team", "another_team"],
        recipients=["test_recipient", "another_recipient"],
    )
    assert p == {
        "apiKey": "api_key",
        "entity": "kapacitor/cpu/serverA",
        "alias": "kapacitor/cpu/serverA",
        "message": "kapacitor/cpu/serverA is CRITICAL",
        "note": "",
        "details": {"Level": "CRITICAL", "Monitoring Tool": "Kapacitor"},
        "description": GO_DATA,
        "teams": ["test_team", "another_team"],
        "recipients": ["test_recipient", "another_recipient"],
    }


def test_servicenow_golden():
    """TestStream_AlertServiceNow: em/jsonv2 record — severity '1' for
    CRITICAL, templated node/type/resource/metric fields, message_key
    defaulting to the alert id, additional_info as marshaled JSON."""
    p = servicenow_event(
        EV, node="serverA", type_="CPU", resource="CPU-Total",
        metric_name="idle", message_key="Alert: kapacitor/cpu/serverA",
        additional_info={
            "link": "http://push/alert?id=kapacitor/cpu/serverA",
            "ticks": "666",
        },
    )
    assert p == {
        "source": "Kapacitor",
        "node": "serverA",
        "type": "CPU",
        "resource": "CPU-Total",
        "metric_name": "idle",
        "message_key": "Alert: kapacitor/cpu/serverA",
        "severity": "1",
        "description": "kapacitor/cpu/serverA is CRITICAL",
        "additional_info":
            '{"link":"http://push/alert?id=kapacitor/cpu/serverA","ticks":"666"}',
    }
    bare = servicenow_event(EV)
    assert bare == {
        "source": "Kapacitor",
        "message_key": "kapacitor/cpu/serverA",
        "severity": "1",
        "description": "kapacitor/cpu/serverA is CRITICAL",
    }


def test_zenoss_goldens():
    """TestStream_AlertZenoss / TestStream_AlertZenoss_Custom: the
    default add_event RPC envelope with named severities, and the custom
    handler with a numeric severity map, ScriptsRouter action, and extra
    data fields."""
    p = zenoss_event(EV, device="#DEVICE001", component="CPU",
                     event_class="/App")
    assert p == {
        "action": "EventsRouter",
        "method": "add_event",
        "data": [{
            "summary": "kapacitor/cpu/serverA is CRITICAL",
            "device": "#DEVICE001",
            "component": "CPU",
            "severity": "Critical",
            "evclasskey": "",
            "evclass": "/App",
        }],
        "type": "rpc",
        "tid": 1,
    }
    c = zenoss_event(
        EV, event_class="/App",
        severity_map={"OK": 0, "INFO": 2, "WARNING": 3, "CRITICAL": 5},
        action="ScriptsRouter", method="kapa_handler",
        collector="serverA",
        message="This is message for alert kapacitor/cpu/serverA",
        extra={
            "data": {
                "id": "kapacitor/cpu/serverA",
                "level": "CRITICAL",
                "message": "kapacitor/cpu/serverA is CRITICAL",
                "time": "1971-01-01 00:00:10 +0000 UTC",
                "duration": "0s",
                "recoverable": True,
            },
            "ticks": 33,
        },
    )
    assert c["action"] == "ScriptsRouter" and c["method"] == "kapa_handler"
    d = c["data"][0]
    assert d["severity"] == 5 and d["collector"] == "serverA"
    assert d["data"]["time"] == "1971-01-01 00:00:10 +0000 UTC"
    assert d["ticks"] == 33


def test_bigpanda_golden():
    """TestStream_AlertBigPanda: status critical, '@go-time' description
    suffix, task '<task>:<measurement>', unix timestamp, app key +
    primary/secondary property; JSON default details are dropped while
    plain-text details pass through."""
    p = bigpanda_payload(
        AlertEvent(**{**EV.__dict__, "details": "https://example.org/link"}),
        app_key="111111", primary_property="host",
        attributes={"host": "serverA"},
    )
    assert p == {
        "description": "kapacitor/cpu/serverA is CRITICAL "
                       "@1971-01-01 00:00:10 +0000 UTC",
        "details": "https://example.org/link",
        "check": "kapacitor/cpu/serverA",
        "task": "TestStream_Alert:cpu",
        "timestamp": 31536010,
        "status": "critical",
        "primary_property": "host",
        "app_key": "111111",
        "host": "serverA",
    }
    # a JSON-shaped details blob (the default full-event template) is NOT
    # forwarded as details
    pj = bigpanda_payload(
        AlertEvent(**{**EV.__dict__, "details": '{"full": "event"}'}),
        app_key="012345",
    )
    assert "details" not in pj


def test_victorops_json_data_full_name():
    """TestStream_AlertVictorOps_JSON_Data: with the json-data config the
    payload embeds the raw result object instead of a marshaled string."""
    assert victorops_payload(EV, json_data=True)["data"] is DATA


def test_email_golden():
    """TestStream_AlertEmail: Subject = message, quoted-printable
    text/html body from .details(), joined To header."""
    ev = AlertEvent(**{**EV.__dict__,
                       "id": "kapacitor.cpu.serverA",
                       "message": "kapacitor.cpu.serverA is CRITICAL",
                       "details": '\n<b>kapacitor.cpu.serverA is CRITICAL</b>\n'
                                  'Value: 10\n'
                                  '<a href="http://graphs.example.com/host/serverA">'
                                  'Details</a>\n'})
    from kapacitor_spark.handlers import email_message

    msg = email_message(ev, to=["user1@example.com", "user2@example.com"],
                        from_="test@example.com")
    assert msg["To"] == "user1@example.com, user2@example.com"
    assert msg["From"] == "test@example.com"
    assert msg["Subject"] == "kapacitor.cpu.serverA is CRITICAL"
    assert msg["Content-Type"] == "text/html; charset=UTF-8"
    assert msg["Content-Transfer-Encoding"] == "quoted-printable"
    body = msg.get_payload()
    # quoted-printable escapes '=' as =3D, the golden body's marker
    assert 'href=3D"http://graphs.example.com/host/serverA"' in body


def test_snmptrap_golden():
    """TestStream_AlertSNMPTrap: sysUpTime + snmpTrapOID varbinds first,
    then the .data() rows with c/i/n/s/t type codes — both golden trap
    shapes."""
    from kapacitor_spark.handlers import snmptrap_varbinds

    b1 = snmptrap_varbinds(
        EV, "1.1.1",
        [("1.1.1.2", "c", "1"),
         ("1.1.1.2", "s", "SNMP ALERT"),
         ("1.1.1.2", "s", EV.message)],
    )
    assert b1 == [
        {"oid": "1.3.6.1.2.1.1.3.0", "type": "TimeTicks", "value": "1000"},
        {"oid": "1.3.6.1.6.3.1.1.4.1.0", "type": "Oid", "value": "1.1.1"},
        {"oid": "1.1.1.2", "type": "Counter64", "value": "1"},
        {"oid": "1.1.1.2", "type": "OctetString", "value": "SNMP ALERT"},
        {"oid": "1.1.1.2", "type": "OctetString",
         "value": "kapacitor/cpu/serverA is CRITICAL"},
    ]
    b2 = snmptrap_varbinds(
        EV, "1.1.2",
        [("1.1.2.3", "i", "10"), ("1.1.2.3", "n", ""),
         ("1.1.2.3", "t", "20000"), ("1.1.2.3", "s", "here/cpu")],
    )
    assert [x["type"] for x in b2[2:]] == [
        "Integer", "Null", "TimeTicks", "OctetString"
    ]
    with pytest.raises(ValueError, match="type code"):
        snmptrap_varbinds(EV, "1.1.1", [("1.1.1.2", "x", "1")])


def test_kafka_record_golden():
    """TestStream_AlertKafka: key = alert id (the partitioning key),
    value = the rendered template ('{{.Message}}' → the message)."""
    from kapacitor_spark.handlers import kafka_record

    r = kafka_record(EV, "testTopic", template_message=EV.message)
    assert r == {
        "topic": "testTopic",
        "key": "kapacitor/cpu/serverA",
        "value": "kapacitor/cpu/serverA is CRITICAL",
    }
    full = kafka_record(EV, "t")
    assert json.loads(full["value"])["level"] == "CRITICAL"


def test_events_from_alert_df_end_to_end(spark):
    """Alert DataFrame → AlertEvent → service payload, end to end (the
    reference's AlertNode → handler fan-out): a windowed-count alert on
    the SimpleMR shape renders the same slack payload the golden
    expects."""
    import datetime as dtm

    from kapacitor_spark import Pipeline
    from kapacitor_spark.handlers import events_from_alert_df

    Zu = dtm.timezone.utc
    rows = [
        (dtm.datetime(1971, 1, 1, 0, 0, s, tzinfo=Zu), "serverA", 100.0)
        for s in range(3)
    ]
    df = spark.createDataFrame(rows, "time timestamp, host string, value double")
    alerts = (
        Pipeline.from_df(df, time_col="time", dims=("host",))
        .alert(crit="value > 90", state_changes_only=True)
        .result()
    )
    evs = events_from_alert_df(
        alerts, "time", dims=["host"], measurement="cpu",
        value_cols=["value"],
    )
    assert len(evs) == 1
    ev = evs[0]
    assert ev.id == "cpu:host=serverA" and ev.level == "CRITICAL"
    assert ev.tags == {"host": "serverA"}
    p = slack_payload(ev, channel="#alerts")
    assert p["attachments"][0]["fallback"] == "cpu:host=serverA is CRITICAL"

    # the runaway-stream guard
    from pyspark.sql import functions as F

    big = spark.range(30).select(
        F.current_timestamp().alias("time"),
        F.lit("h").alias("host"),
        F.lit("CRITICAL").alias("level"),
    )
    with pytest.raises(ValueError, match="unfiltered"):
        events_from_alert_df(big, "time", dims=["host"], limit=10)


def test_tickscript_slack_handler_chain_golden(spark):
    """The ACTUAL TestStream_AlertSlack script (streamer_test.go:8824)
    through the TICK front-end: two .slack() handler chains — default
    workspace (url1, no auth) to '@jim', 'company_private' workspace
    (url2, Bearer token) to '#alerts' — each receives the golden
    CRITICAL payload for kapacitor/cpu/serverA."""
    import http.server
    import socketserver
    import threading

    from kapacitor_spark.sources.line_protocol import promote, replay_srpl
    from kapacitor_spark.tick import run_tickscript

    received = []

    class H(http.server.BaseHTTPRequestHandler):
        def do_POST(self):
            n = int(self.headers["Content-Length"])
            received.append(
                (self.path, self.headers.get("Authorization", ""),
                 json.loads(self.rfile.read(n)))
            )
            self.send_response(200)
            self.end_headers()

        def log_message(self, *a):
            pass

    with socketserver.TCPServer(("127.0.0.1", 0), H) as srv:
        port = srv.server_address[1]
        threading.Thread(target=srv.serve_forever, daemon=True).start()
        raw = replay_srpl(
            spark,
            "/root/reference/integrations/testdata/TestStream_Alert.srpl",
        )
        cpu = promote(
            raw, "cpu", float_fields=["value"], tag_cols=["host"],
            keep_name=True,
        )
        run_tickscript(
            """
stream
    |from()
        .measurement('cpu')
        .where(lambda: "host" == 'serverA')
        .groupBy('host')
    |window()
        .period(10s)
        .every(10s)
    |count('value')
    |alert()
        .id('kapacitor/{{ .Name }}/{{ index .Tags "host" }}')
        .info(lambda: "count" > 6.0)
        .warn(lambda: "count" > 7.0)
        .crit(lambda: "count" > 8.0)
        .slack()
        .workspace('company_private')
        .channel('#alerts')
        .slack()
        .channel('@jim')
""",
            sources={"cpu": cpu},
            time_col="time",
            alert_services={
                "slack": {
                    "url": f"http://127.0.0.1:{port}/test/slack/url",
                    "channel": "#channel",
                    "workspaces": {
                        "company_private": {
                            "url": f"http://127.0.0.1:{port}/test/slack/url2",
                            "token": "my_secret_token",
                            "channel": "#channel",
                        }
                    },
                }
            },
        )
        srv.shutdown()
    # 2 specs × 2 events: the CRITICAL fire AND the OK recovery — the
    # reference delivers recoveries to handlers (its TestStream_Alert run
    # stops at 13s before the recovering window emits; ours replays it)
    assert len(received) == 4

    def attach(level, color):
        msg = f"kapacitor/cpu/serverA is {level}"
        return [{
            "fallback": msg, "color": color, "text": msg,
            "mrkdwn_in": ["text"],
        }]

    by_path: dict = {}
    for path, auth, body in received:
        by_path.setdefault(path, []).append((auth, body))
    for path, posts in by_path.items():
        assert [b["attachments"] for _, b in posts] == [
            attach("CRITICAL", "danger"), attach("OK", "good"),
        ]
    auths1 = {a for a, b in by_path["/test/slack/url"]}
    chans1 = {b["channel"] for _, b in by_path["/test/slack/url"]}
    assert auths1 == {""} and chans1 == {"@jim"}
    auths2 = {a for a, b in by_path["/test/slack/url2"]}
    chans2 = {b["channel"] for _, b in by_path["/test/slack/url2"]}
    assert auths2 == {"Bearer my_secret_token"} and chans2 == {"#alerts"}


def test_tickscript_victorops_handler_chain_golden(spark):
    """TestStream_AlertVictorOps (streamer_test.go:9462) through the TICK
    front-end: default handler uses the config routing key, the second
    chain overrides with .routingKey('test_key2') — both POST the golden
    CRITICAL state to /<api_key>/<routing_key>."""
    import http.server
    import socketserver
    import threading

    from kapacitor_spark.sources.line_protocol import promote, replay_srpl
    from kapacitor_spark.tick import run_tickscript

    received = []

    class H(http.server.BaseHTTPRequestHandler):
        def do_POST(self):
            n = int(self.headers["Content-Length"])
            received.append((self.path, json.loads(self.rfile.read(n))))
            self.send_response(200)
            self.end_headers()

        def log_message(self, *a):
            pass

    with socketserver.TCPServer(("127.0.0.1", 0), H) as srv:
        port = srv.server_address[1]
        threading.Thread(target=srv.serve_forever, daemon=True).start()
        raw = replay_srpl(
            spark,
            "/root/reference/integrations/testdata/TestStream_Alert.srpl",
        )
        cpu = promote(
            raw, "cpu", float_fields=["value"], tag_cols=["host"],
            keep_name=True,
        )
        run_tickscript(
            """
stream
    |from()
        .measurement('cpu')
        .where(lambda: "host" == 'serverA')
        .groupBy('host')
    |window()
        .period(10s)
        .every(10s)
    |count('value')
    |alert()
        .id('kapacitor/{{ .Name }}/{{ index .Tags "host" }}')
        .info(lambda: "count" > 6.0)
        .warn(lambda: "count" > 7.0)
        .crit(lambda: "count" > 8.0)
        .victorOps()
        .victorOps()
        .routingKey('test_key2')
""",
            sources={"cpu": cpu},
            time_col="time",
            alert_services={
                "victorOps": {
                    "url": f"http://127.0.0.1:{port}",
                    "api_key": "api_key",
                    "routing_key": "test_key",
                }
            },
        )
        srv.shutdown()
    # each routing key gets the CRITICAL fire and the OK RECOVERY
    # (victorops/service.go:196 maps alert.OK → message_type RECOVERY)
    assert sorted(p for p, _ in received) == [
        "/api_key/test_key", "/api_key/test_key",
        "/api_key/test_key2", "/api_key/test_key2",
    ]
    for _, body in received:
        assert body["message_type"] in ("CRITICAL", "RECOVERY")
        level = "CRITICAL" if body["message_type"] == "CRITICAL" else "OK"
        assert body["entity_id"] == "kapacitor/cpu/serverA"
        assert body["state_message"] == f"kapacitor/cpu/serverA is {level}"
        assert body["monitoring_tool"] == "kapacitor"
    crit = [b for _, b in received if b["message_type"] == "CRITICAL"]
    assert len(crit) == 2
    for body in crit:
        assert body["timestamp"] == 31536000  # window start 1971-01-01T00:00:00Z


def test_tickscript_opsgenie2_handler_chain(spark):
    """TestStream_AlertOpsGenie2 through the TICK front-end: the GenieKey
    auth header and golden alias/priority/responders payload."""
    import http.server
    import socketserver
    import threading

    from kapacitor_spark.sources.line_protocol import promote, replay_srpl
    from kapacitor_spark.tick import run_tickscript

    received = []

    class H(http.server.BaseHTTPRequestHandler):
        def do_POST(self):
            n = int(self.headers["Content-Length"])
            received.append(
                (self.path, self.headers.get("Authorization", ""),
                 json.loads(self.rfile.read(n)))
            )
            self.send_response(200)
            self.end_headers()

        def log_message(self, *a):
            pass

    with socketserver.TCPServer(("127.0.0.1", 0), H) as srv:
        port = srv.server_address[1]
        threading.Thread(target=srv.serve_forever, daemon=True).start()
        raw = replay_srpl(
            spark,
            "/root/reference/integrations/testdata/TestStream_Alert.srpl",
        )
        cpu = promote(
            raw, "cpu", float_fields=["value"], tag_cols=["host"],
            keep_name=True,
        )
        run_tickscript(
            """
stream
    |from()
        .measurement('cpu')
        .where(lambda: "host" == 'serverA')
        .groupBy('host')
    |window()
        .period(10s)
        .every(10s)
    |count('value')
    |alert()
        .id('kapacitor/{{ .Name }}/{{ index .Tags "host" }}')
        .crit(lambda: "count" > 8.0)
        .opsGenie2()
""",
            sources={"cpu": cpu},
            time_col="time",
            alert_services={
                "opsGenie2": {
                    "url": f"http://127.0.0.1:{port}",
                    "api_key": "api_key",
                    "teams": ["test_team"],
                    "recipients": ["test_recipient"],
                }
            },
        )
        srv.shutdown()
    # the CRITICAL create plus the OK recovery's close call
    # (opsgenie2/service.go recovery path — alias-addressed /close)
    assert len(received) == 2
    path, auth, body = received[0]
    assert path == "/" and auth == "GenieKey api_key"
    assert body["entity"] == "kapacitor/cpu/serverA"
    assert body["alias"] == "a2FwYWNpdG9yL2NwdS9zZXJ2ZXJB"
    assert body["priority"] == "P1"
    assert body["responders"] == [
        {"name": "test_team", "type": "team"},
        {"username": "test_recipient", "type": "user"},
    ]
    path2, auth2, body2 = received[1]
    assert path2 == (
        "/a2FwYWNpdG9yL2NwdS9zZXJ2ZXJB/close?identifierType=alias"
    )
    assert auth2 == "GenieKey api_key"
    assert body2 == {"note": "kapacitor/cpu/serverA is OK"}


def test_tickscript_opsgenie2_teams_option_not_msteams(spark):
    """`.opsGenie2().teams('t1','t2')` (pipeline/alert.go:2043): `teams`
    is an OPTION of the open opsGenie2 spec, not the MS-Teams handler —
    the typed receiver disambiguates in the reference; the flat prop scan
    must too. The teams land as responders and NO MS-Teams spec opens
    (which would raise TickError: no 'teams' service config)."""
    import http.server
    import socketserver
    import threading

    from kapacitor_spark.sources.line_protocol import promote, replay_srpl
    from kapacitor_spark.tick import run_tickscript

    received = []

    class H(http.server.BaseHTTPRequestHandler):
        def do_POST(self):
            n = int(self.headers["Content-Length"])
            received.append((self.path, json.loads(self.rfile.read(n))))
            self.send_response(200)
            self.end_headers()

        def log_message(self, *a):
            pass

    with socketserver.TCPServer(("127.0.0.1", 0), H) as srv:
        port = srv.server_address[1]
        threading.Thread(target=srv.serve_forever, daemon=True).start()
        raw = replay_srpl(
            spark,
            "/root/reference/integrations/testdata/TestStream_Alert.srpl",
        )
        cpu = promote(
            raw, "cpu", float_fields=["value"], tag_cols=["host"],
            keep_name=True,
        )
        run_tickscript(
            """
stream
    |from()
        .measurement('cpu')
        .where(lambda: "host" == 'serverA')
        .groupBy('host')
    |window()
        .period(10s)
        .every(10s)
    |count('value')
    |alert()
        .id('kapacitor/{{ .Name }}/{{ index .Tags "host" }}')
        .crit(lambda: "count" > 8.0)
        .opsGenie2()
        .teams('test_team', 'another_team')
""",
            sources={"cpu": cpu},
            time_col="time",
            alert_services={
                "opsGenie2": {
                    "url": f"http://127.0.0.1:{port}",
                    "api_key": "api_key",
                }
            },
        )
        srv.shutdown()
    creates = [b for p, b in received if p == "/"]
    assert len(creates) == 1
    assert creates[0]["responders"] == [
        {"name": "test_team", "type": "team"},
        {"name": "another_team", "type": "team"},
    ]


def test_kafka_partitioning_golden(spark):
    """TestStream_AlertKafka_Partitioning (streamer_test.go:8929): with
    partitionById, every record key maps to EXACTLY ONE partition. Run the
    same script shape (.id = host tag, crit TRUE), render kafka records,
    and drive the reference's partitioners (services/kafka/hash.go +
    config.go:104-121) over a simulated 12-partition topic — no broker
    needed; the contract is the key->partition function itself."""
    from kapacitor_spark.handlers import (
        events_from_alert_df,
        kafka_partition,
        kafka_record,
    )
    from kapacitor_spark.pipeline import Pipeline
    from kapacitor_spark.sources.line_protocol import promote, replay_srpl

    raw = replay_srpl(
        spark, "/root/reference/integrations/testdata/TestStream_Alert.srpl"
    )
    cpu = promote(
        raw, "cpu", float_fields=["value"], tag_cols=["host"], keep_name=True
    )
    out = (
        Pipeline.from_df(cpu, time_col="time", dims=("host",))
        .alert(crit="TRUE", events_only=False, id_template="{{ index .Tags \"host\" }}")
    )
    events = events_from_alert_df(out.df, "time", dims=["host"])
    assert len(events) > 1 and len({e.id for e in events}) >= 1

    for algo in ("crc32", "murmur2", "murmur3", "fnv-1a"):
        seen: dict = {}
        for ev in events:
            rec = kafka_record(ev, topic="testTopic", template_message=ev.message)
            part = kafka_partition(rec["key"], 12, algorithm=algo)
            assert 0 <= part < 12
            seen.setdefault(rec["key"], set()).add(part)
        # the reference's assertion: one partition per key
        assert all(len(ps) == 1 for ps in seen.values()), (algo, seen)


def test_kafka_partition_hash_vectors():
    """Known-answer cross-checks for the hash primitives behind
    kafka_partition, plus the sarama/librdkafka edge rules."""
    import zlib

    from kapacitor_spark.handlers import (
        _fnv1a_32,
        _murmur2,
        _murmur3_32,
        kafka_partition,
    )

    # CRC-32/IEEE published check value
    assert zlib.crc32(b"123456789") == 0xCBF43926
    # FNV-1a 32 published values
    assert _fnv1a_32(b"") == 0x811C9DC5
    assert _fnv1a_32(b"a") == 0xE40C292C
    # MurmurHash3 x86-32 published values (mmh3.hash("hello") == 613153351)
    assert _murmur3_32(b"") == 0
    assert _murmur3_32(b"hello") == 0x248BFA47
    # murmur2: deterministic, full 32-bit, and the partition rule masks the
    # sign bit exactly as hash.go:39 does
    h = _murmur2(b"kapacitor/cpu/serverA")
    assert 0 <= h <= 0xFFFFFFFF and h == _murmur2(b"kapacitor/cpu/serverA")
    assert kafka_partition("kapacitor/cpu/serverA", 7, "murmur2") == (
        (h & 0x7FFFFFFF) % 7
    )
    # empty-ish keys still partition deterministically; bad algorithm and
    # non-positive partition counts raise like the reference
    assert kafka_partition("", 5, "crc32") == kafka_partition("", 5, "crc32")
    with pytest.raises(ValueError):
        kafka_partition("k", 0, "crc32")
    with pytest.raises(ValueError):
        kafka_partition("k", 5, "sha1")


def test_mqtt_record_formats():
    """mqtt/service.go:136-150 + handler topic templates: payload is the
    rendered MESSAGE, topic templates render {{ .ID }}/{{ .Name }}/
    {{ .Level }}/{{ index .Tags "k" }}, empty topics and bad QoS raise."""
    import pytest as _pytest

    from kapacitor_spark.handlers import AlertEvent, mqtt_record

    ev = AlertEvent(
        id="cpu:nil", message="cpu is high", time=dt.datetime(2024, 1, 1),
        level="CRITICAL",
        data={"series": [{"name": "cpu", "tags": {"host": "h1"}}]},
    )
    rec = mqtt_record(ev, "alerts/static", qos=1, retained=True)
    assert rec == {"topic": "alerts/static", "qos": 1, "retained": True,
                   "payload": "cpu is high"}
    rec = mqtt_record(ev, 'alerts/{{ .Name }}/{{ index .Tags "host" }}/{{ .Level }}')
    assert rec["topic"] == "alerts/cpu/h1/CRITICAL"
    assert mqtt_record(ev, "{{ .ID }}")["topic"] == "cpu:nil"
    with _pytest.raises(ValueError, match="missing MQTT topic"):
        mqtt_record(ev, "")
    with _pytest.raises(ValueError, match="invalid QoS"):
        mqtt_record(ev, "t", qos=7)


def test_mqtt_tick_handler_publishes(spark):
    """.mqtt('topic') through the TICKscript alert chain: publishes one
    message per alert event via the injected broker seam."""
    from kapacitor_spark.tick import run_tickscript

    from pyspark.sql import functions as F

    rows = [("2024-01-01 00:00:00", "h1", 99.0), ("2024-01-01 00:00:01", "h1", 10.0)]
    df = spark.createDataFrame(rows, "time string, host string, value double")
    df = df.withColumn("time", F.to_timestamp("time"))
    published = []
    outs = run_tickscript(
        """
stream
    |from().measurement('cpu').groupBy('host')
    |alert()
        .crit(lambda: "value" > 90.0)
        .stateChangesOnly()
        .message('{{ .Level }}: high cpu')
        .mqtt('alerts/{{ .Level }}')
        .qos(1)
    |httpOut('a')
""",
        {"cpu": df}, time_col="time",
        alert_services={"mqtt": {"publish": lambda t, q, r, p: published.append((t, q, r, p))}},
    )
    assert ("alerts/CRITICAL", 1, False, "CRITICAL: high cpu") in published
    assert ("alerts/OK", 1, False, "OK: high cpu") in published


def test_email_kafka_snmptrap_tick_transports(spark):
    """.email()/.kafka()/.snmpTrap() through the TICKscript alert chain
    deliver via injected transport callables (SMTP/broker/BER stay
    external, exactly like the mqtt seam); payload formats are the
    golden-tested handlers formatters."""
    from pyspark.sql import functions as F

    from kapacitor_spark.tick import run_tickscript

    rows = [("2024-01-01 00:00:00", "h1", 99.0)]
    df = spark.createDataFrame(rows, "time string, host string, value double")
    df = df.withColumn("time", F.to_timestamp("time"))
    sent_mail, produced, traps = [], [], []
    run_tickscript(
        """
stream
    |from().measurement('cpu').groupBy('host')
    |alert()
        .crit(lambda: "value" > 90.0)
        .message('high cpu on {{ index .Tags "host" }}')
        .id('cpu:{{ index .Tags "host" }}')
        .email('ops@example.com')
            .to('oncall@example.com')
        .kafka()
            .kafkaTopic('alerts')
        .snmpTrap('1.3.6.1.4.1.33333.1')
            .data('1.3.6.1.4.1.33333.1.1', 's', 'level')
            .data('1.3.6.1.4.1.33333.1.2', 's', 'id')
    |httpOut('a')
""",
        {"cpu": df}, time_col="time",
        alert_services={
            "email": {"send": sent_mail.append, "from": "kapacitor@example.com"},
            "kafka": {"produce": lambda t, p, k, v: produced.append((t, p, k, v)),
                      "partitions": 4},
            "snmpTrap": {"send": traps.append},
        },
    )
    assert len(sent_mail) == 1
    msg = sent_mail[0]
    assert msg["To"] == "ops@example.com, oncall@example.com"
    assert msg["Subject"] == "high cpu on h1"
    assert len(produced) == 1
    topic, part, key, value = produced[0]
    assert topic == "alerts" and key == "cpu:h1" and 0 <= part < 4
    assert '"message":"high cpu on h1"' in value
    assert len(traps) == 1
    binds = traps[0]
    assert binds[1]["value"] == "1.3.6.1.4.1.33333.1"  # snmpTrapOID varbind
    assert {b["oid"] for b in binds} >= {
        "1.3.6.1.4.1.33333.1.1", "1.3.6.1.4.1.33333.1.2"}


def test_render_event_template_fields():
    from kapacitor_spark.handlers import AlertEvent, render_event_template

    ev = AlertEvent(
        id="i1", message="msg here", details="det", time=dt.datetime(2024, 1, 1),
        level="WARNING", task_name="t",
        data={"series": [{"name": "cpu", "tags": {"host": "h9"}}]},
    )
    assert render_event_template(ev, "plain") == "plain"
    assert render_event_template(ev, "{{ .Message }}") == "msg here"
    assert render_event_template(ev, "{{ .Details }}/{{ .TaskName }}") == "det/t"
    assert render_event_template(
        ev, '{{ .ID }}:{{ .Name }}:{{ index .Tags "host" }}:{{ .Level }}'
    ) == "i1:cpu:h9:WARNING"


def test_kafka_snmp_templates_render_and_to_accumulates(spark):
    """The reference executes .template() / .data() value templates per
    alert (kafka service.go:407-410, snmptrap service.go:220-246) and
    .to() appends across calls (alert.go 'Multiple calls append')."""
    from pyspark.sql import functions as F

    from kapacitor_spark.tick import run_tickscript

    rows = [("2024-01-01 00:00:00", "h1", 99.0)]
    df = spark.createDataFrame(rows, "time string, host string, value double")
    df = df.withColumn("time", F.to_timestamp("time"))
    produced, traps, mails = [], [], []
    run_tickscript(
        """
stream
    |from().measurement('cpu').groupBy('host')
    |alert()
        .crit(lambda: "value" > 90.0)
        .message('high cpu')
        .id('cpu:h1')
        .email('a@x.com')
            .to('b@x.com')
            .to('c@x.com')
        .kafka()
            .kafkaTopic('alerts')
            .template('{{ .Message }}')
        .snmpTrap('1.3.6.1.4.1.33333.1')
            .data('1.1.1.2', 's', '{{ .Message }}')
            .data('1.1.2.3', 's', '{{ .Details }}')
            .data('1.1.2.4', 's', 'static')
    |httpOut('a')
""",
        {"cpu": df}, time_col="time",
        alert_services={
            "email": {"send": mails.append, "from": "k@x.com"},
            "kafka": {"produce": lambda t, p, k, v: produced.append(v)},
            "snmpTrap": {"send": traps.append},
        },
    )
    assert mails[0]["To"] == "a@x.com, b@x.com, c@x.com"
    assert produced == ["high cpu"]  # rendered, not the literal template
    vals = {b["oid"]: b["value"] for b in traps[0]}
    assert vals["1.1.1.2"] == "high cpu"
    assert vals["1.1.2.4"] == "static"


def test_pagerduty2_links_from_tick(spark):
    """.pagerDuty2().link(href, text).link(href2) entries reach the
    payload's links array (pipeline/alert.go:1166 append semantics)."""
    import http.server
    import socketserver
    import threading

    from pyspark.sql import functions as F

    from kapacitor_spark.tick import run_tickscript

    received = []

    class H(http.server.BaseHTTPRequestHandler):
        def do_POST(self):
            n = int(self.headers.get("Content-Length", 0))
            received.append(json.loads(self.rfile.read(n)))
            self.send_response(200)
            self.end_headers()

        def log_message(self, *a):
            pass

    rows = [("2024-01-01 00:00:00", "h1", 99.0)]
    df = spark.createDataFrame(rows, "time string, host string, value double")
    df = df.withColumn("time", F.to_timestamp("time"))
    with socketserver.TCPServer(("127.0.0.1", 0), H) as srv:
        port = srv.server_address[1]
        threading.Thread(target=srv.serve_forever, daemon=True).start()
        try:
            run_tickscript(
                """
stream
    |from().measurement('cpu').groupBy('host')
    |alert()
        .crit(lambda: "value" > 90.0)
        .message('m')
        .id('i')
        .pagerDuty2()
            .routingKey('rk')
            .link('https://grafana/d/1', 'Graph')
            .link('https://runbook/x')
    |httpOut('a')
""",
                {"cpu": df}, time_col="time",
                alert_services={
                    "pagerDuty2": {"url": f"http://127.0.0.1:{port}/v2"}
                },
            )
        finally:
            srv.shutdown()
    assert received and received[0]["links"] == [
        {"href": "https://grafana/d/1", "text": "Graph"},
        {"href": "https://runbook/x", "text": ""},
    ]
