"""TICKscript front-end: parse the reference's DSL and compile it onto the
Pipeline DataFrame compiler.

Reference grammar: /root/reference/tick/ast/ (lexer lex.go, parser
parser.go); evaluation semantics /root/reference/tick/eval.go — statements
are ``var name = expr`` or bare chain expressions; a chain starts from
``stream``/``batch``/a var and applies *chain methods* (``|method(...)``),
*property methods* (``.prop(...)``), and UDF methods (``@name``).

This implementation executes the script directly against Pipeline (the
reference likewise interprets the AST reflectively against pipeline.*Node
objects — there is no separate IR). Lambdas pass through to
functions.lambdas.compile_lambda; durations to durations.parse_duration.

Usage:
    outs = run_tickscript(script, sources={"cpu": df_or_pipeline})
    outs["TestStream_Window"]   # DataFrame named by |httpOut(name)

``kapacitorLoopback()`` registers its points as ``loopback:<db>.<rp>`` in
the returned outputs — feed that DataFrame to the subscribed script's
sources (the reference's DBRP routing, task_master.go forkPoint).

``@name()`` chain methods dispatch to UDFs registered via
``run_tickscript(udfs={...})`` — properties become kwargs (the
reference's InitRequest option list, udf/agent/udf.proto).

``sideload()`` supports ``file://`` sources with order templates
(sources/sideload.py); HTTP sideload endpoints are out of scope — pass a
lookup DataFrame in ``sources`` instead.

``batch|query('SELECT ...')`` runs the InfluxQL projection engine-side:
windows enumerate deterministically over the source's event-time range,
``groupBy(time(d), tags...)`` buckets inside each window, and rows carry
their window's ``query_start`` as a group key (per-batch state, the
reference's batch edges).

Autoscale nodes (k8sAutoscale/swarmAutoscale/ec2Autoscale) run the full
decision state machine (operators/autoscale.py) against clients passed
via ``run_tickscript(autoscale_clients={'k8s': client, ...})``.
`batch|queryFlux()` ships the Flux script to an injected InfluxDB 2.x
client (`run_tickscript(flux_client=fn)`) — the engine never interprets
Flux, exactly like the reference's FluxQueryService seam.
"""

from __future__ import annotations

import re
from typing import Any, Callable

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from kapacitor_spark.durations import parse_duration
from kapacitor_spark.pipeline import Pipeline

__all__ = ["run_tickscript", "task_dot", "template_vars", "TickError"]


class TickError(ValueError):
    pass


# alert-node service handler kinds (pipeline/alert.go:39-61 chain list)
_ALERT_HANDLER_KINDS = {
    "slack", "victorOps", "pagerDuty", "pagerDuty2", "opsGenie", "opsGenie2",
    "telegram", "teams", "talk", "hipChat", "discord", "pushover", "alerta",
    "sensu", "serviceNow", "zenoss", "bigPanda", "email", "snmpTrap", "kafka",
    "mqtt",
}
# alert-node OWN props — anything here closes a pending handler spec
_ALERT_LEVEL_PROPS = {
    "crit", "warn", "info", "critReset", "warnReset", "infoReset",
    "stateChangesOnly", "noRecoveries", "flapping", "history", "all",
    "levelField", "levelTag", "idField", "idTag", "durationField",
    "topic", "id", "message", "messageField", "details", "inhibit",
    "log", "post", "tcp", "exec",
}
# Option names that collide with handler-kind names: while a spec of the
# keyed kind is open, these parse as ITS options, not a new handler —
# .opsGenie2().teams('t1') routes teams to OpsGenie, not MS-Teams
# (reference pipeline/alert.go:1957,2043 — the typed receiver disambiguates
# there; the flat prop scan needs this whitelist).
_HANDLER_KIND_OPTIONS = {
    "opsGenie": {"teams", "recipients"},
    "opsGenie2": {"teams", "recipients"},
}


def _parse_handler_specs(props) -> list[tuple[str, dict]]:
    """Parse service-handler chains off an alert node's prop list
    (pipeline/alert.go:39-61): each handler kind prop (.slack() etc.)
    OPENS a handler spec; the props that follow (.channel/.workspace/
    .routingKey/...) configure THAT handler until the next handler kind
    or alert-level prop. Shared by the batch compile and the streaming
    compile (r11 2nd wave) so both paths parse identically."""
    specs: list[tuple[str, dict]] = []
    current: dict | None = None
    cur_kind: str | None = None
    for name, args in props:
        if (
            current is not None
            and name in _HANDLER_KIND_OPTIONS.get(cur_kind, ())
            and args
        ):
            # collides with a handler-kind name but belongs to the open
            # spec (.opsGenie2().teams('t1')). A ZERO-ARG .teams() is
            # the MS-Teams handler itself (its options are config-
            # driven), so only an argumented call binds as an option.
            current[name] = args[0] if len(args) == 1 else list(args)
        elif name in _ALERT_HANDLER_KINDS:
            # the kind call's own positional args ride as '_arg'
            # (.mqtt(topic) takes one, .email(to...) is variadic —
            # pipeline/alert.go:1376, :1493)
            current = (
                {"_arg": args[0] if len(args) == 1 else list(args)}
                if args else {}
            )
            cur_kind = name
            specs.append((name, current))
        elif current is not None and name not in _ALERT_LEVEL_PROPS:
            val = args[0] if len(args) == 1 else list(args)
            if name in ("data", "link") and name in current:
                # multi-arg APPEND options ("Multiple calls append",
                # pipeline/alert.go .Data/.Link): list of entries
                prev = current[name]
                if not (prev and isinstance(prev[0], (list, tuple))):
                    prev = [prev]
                prev.append(val)
                current[name] = prev
            elif name == "to" and name in current:
                # flat-append option (.to(a).to(b).to(c) — alert.go
                # Email/To docs: "Multiple calls append")
                prev = current[name]
                flat = prev if isinstance(prev, list) else [prev]
                flat.extend(val if isinstance(val, list) else [val])
                current[name] = flat
            else:
                # every other option overwrites (last wins), like the
                # reference's plain property setters
                current[name] = val
        else:
            current = None
            cur_kind = None
    return specs


def _dispatch_alert_handlers(out, specs, services, time_col,
                             level_col="level"):
    """Deliver alert events through the service-handler chains parsed off
    the alert node (pipeline/alert.go handler list → services/<kind>).

    Events collect driver-side (tiny by construction — the filtered alert
    output) and each spec renders through the matching
    kapacitor_spark.handlers formatter; delivery is handlers.post_payload
    against the URL from ``run_tickscript(alert_services={kind: cfg})``
    (the reference's service config section). Unconfigured kinds raise —
    a silently dropped page is the one failure mode alerting must not
    have."""
    dims = [d for d in out.dims if d != "name"]
    return _dispatch_alert_handlers_df(
        out.df, dims, specs, services, time_col, level_col=level_col
    )


def _dispatch_alert_handlers_df(df, dims, specs, services, time_col,
                                level_col="level"):
    """DataFrame-level handler dispatch — the shared core of the batch
    path and the streaming foreachBatch path (each micro-batch of the
    live alert stream is a small batch DataFrame of triggered events)."""
    from kapacitor_spark import handlers as H
    value_cols = [
        c for c in df.columns
        if c not in (time_col, level_col, "alert_id", "message", "details",
                     "topic", "name", *dims)
        and not c.startswith("__")
    ]
    # OK rows pass through: the alert node's events_only/stateChangesOnly
    # logic already restricts OK to genuine recovery transitions, and the
    # reference delivers those to handlers (pagerduty2 'resolve', opsGenie2
    # close, victorops RECOVERY — streamer_test.go expects alert.OK events)
    events = H.events_from_alert_df(
        df,
        time_col,
        dims=dims,
        level_col=level_col,
        id_col="alert_id" if "alert_id" in df.columns else None,
        message_col="message" if "message" in df.columns else None,
        details_col="details" if "details" in df.columns else None,
        duration_col=None,
        measurement="",
        value_cols=value_cols[:4],
    )
    for kind, opts in specs:
        cfg = dict(services.get(kind) or {})
        if not cfg:
            raise TickError(
                f"alert handler .{kind}() used but no config passed via "
                f"run_tickscript(alert_services={{{kind!r}: {{...}}}})"
            )
        if kind == "slack":
            ws = opts.get("workspace", "")
            c = (cfg.get("workspaces", {}) or {}).get(ws, cfg) if ws else cfg
            headers = (
                {"Authorization": f"Bearer {c['token']}"} if c.get("token") else {}
            )
            for ev in events:
                H.post_payload(
                    c["url"],
                    H.slack_payload(
                        ev,
                        channel=opts.get("channel", c.get("channel", "")),
                        username=opts.get("username", c.get("username", "kapacitor")),
                        icon_emoji=opts.get("iconEmoji", c.get("icon_emoji", "")),
                    ),
                    headers,
                )
        elif kind == "victorOps":
            rk = opts.get("routingKey", cfg.get("routing_key", ""))
            base = cfg["url"].rstrip("/")
            for ev in events:
                H.post_payload(
                    f"{base}/{cfg.get('api_key', '')}/{rk}",
                    H.victorops_payload(ev, json_data=cfg.get("json_data", False)),
                )
        elif kind == "pagerDuty2":
            rk = opts.get("routingKey", cfg.get("routing_key", ""))
            # .link(href[, text]) entries append (pipeline/alert.go:1166)
            raw_links = opts.get("link", [])
            if isinstance(raw_links, str):
                raw_links = [[raw_links]]  # single .link('href')
            elif raw_links and not isinstance(raw_links[0], (list, tuple)):
                raw_links = [raw_links]    # single .link('href', 'text')
            links = [
                {"href": l[0] if isinstance(l, (list, tuple)) else l,
                 "text": (l[1] if isinstance(l, (list, tuple)) and len(l) > 1
                          else "")}
                for l in raw_links
            ]
            for ev in events:
                H.post_payload(
                    cfg["url"],
                    H.pagerduty2_payload(
                        ev, routing_key=rk,
                        client_url=cfg.get("client_url", ""),
                        links=links or None,
                    ),
                )
        elif kind == "telegram":
            for ev in events:
                H.post_payload(
                    f"{cfg['url'].rstrip('/')}/bot{cfg.get('token', '')}/sendMessage",
                    H.telegram_payload(
                        ev,
                        chat_id=opts.get("chatId", cfg.get("chat_id", "")),
                        parse_mode=opts.get("parseMode", cfg.get("parse_mode", "")),
                        disable_web_page_preview=bool(
                            opts.get("disableWebPagePreview",
                                     cfg.get("disable_web_page_preview", False))
                        ),
                        disable_notification=bool(
                            opts.get("disableNotification",
                                     cfg.get("disable_notification", False))
                        ),
                    ),
                )
        elif kind == "teams":
            for ev in events:
                H.post_payload(
                    opts.get("channelURL", cfg["url"]), H.teams_payload(ev)
                )
        elif kind == "talk":
            for ev in events:
                H.post_payload(
                    cfg["url"],
                    H.talk_payload(ev, author_name=cfg.get("author_name", "Kapacitor")),
                )
        elif kind == "discord":
            for ev in events:
                H.post_payload(
                    cfg["url"],
                    H.discord_payload(
                        ev, username=opts.get("username", cfg.get("username", "kapacitor"))
                    ),
                )
        elif kind == "hipChat":
            room = opts.get("room", cfg.get("room", ""))
            token = opts.get("token", cfg.get("token", ""))
            for ev in events:
                H.post_payload(
                    f"{cfg['url'].rstrip('/')}/{room}/notification?auth_token={token}",
                    H.hipchat_payload(ev),
                )
        elif kind == "pushover":
            for ev in events:
                H.post_payload(
                    cfg["url"],
                    H.pushover_payload(
                        ev, token=cfg.get("token", ""),
                        user_key=opts.get("userKey", cfg.get("user_key", "")),
                        device=opts.get("device", ""),
                        title=opts.get("title", ""),
                        url=opts.get("URL", ""),
                        url_title=opts.get("URLTitle", ""),
                        sound=opts.get("sound", ""),
                    ),
                )
        elif kind == "opsGenie2":
            headers = {"Authorization": f"GenieKey {cfg.get('api_key', '')}"}
            teams_ = opts.get("teams", cfg.get("teams", []))
            recips = opts.get("recipients", cfg.get("recipients", []))
            for ev in events:
                path, payload = H.opsgenie2_payload(
                    ev,
                    teams=teams_ if isinstance(teams_, list) else [teams_],
                    recipients=recips if isinstance(recips, list) else [recips],
                )
                H.post_payload(cfg["url"].rstrip("/") + path, payload, headers)
        elif kind == "alerta":
            headers = {
                "Authorization": f"{cfg.get('token_prefix', 'Bearer')} "
                                 f"{opts.get('token', cfg.get('token', ''))}"
            }
            for ev in events:
                H.post_payload(
                    cfg["url"].rstrip("/") + "/alert",
                    H.alerta_payload(
                        ev,
                        resource=opts.get("resource", ""),
                        event=opts.get("event", ""),
                        environment=opts.get(
                            "environment", cfg.get("environment", "")
                        ),
                        group=opts.get("group", ""),
                        value=opts.get("value", ""),
                        origin=opts.get("origin", cfg.get("origin", "Kapacitor")),
                        service=opts.get("services", []),
                    ),
                    headers,
                )
        elif kind == "bigPanda":
            headers = (
                {"Authorization": f"Bearer {cfg['token']}"}
                if cfg.get("token") else {}
            )
            for ev in events:
                H.post_payload(
                    cfg["url"],
                    H.bigpanda_payload(
                        ev,
                        app_key=opts.get("appKey", cfg.get("app_key", "")),
                        primary_property=opts.get(
                            "primaryProperty", cfg.get("primary_property", "")
                        ),
                        secondary_property=opts.get(
                            "secondaryProperty", cfg.get("secondary_property", "")
                        ),
                    ),
                    headers,
                )
        elif kind == "serviceNow":
            for ev in events:
                H.post_payload(
                    cfg["url"],
                    {"records": [
                        H.servicenow_event(
                            ev,
                            source=opts.get("source", cfg.get("source", "Kapacitor")),
                            node=opts.get("node", ""),
                            type_=opts.get("type", ""),
                            resource=opts.get("resource", ""),
                            metric_name=opts.get("metricName", ""),
                            message_key=opts.get("messageKey", ""),
                        )
                    ]},
                )
        elif kind == "zenoss":
            for ev in events:
                H.post_payload(
                    cfg["url"],
                    H.zenoss_event(
                        ev,
                        device=opts.get("device", ""),
                        component=opts.get("component", ""),
                        event_class=opts.get(
                            "eventClass", cfg.get("event_class", "")
                        ),
                        collector=opts.get("collector", cfg.get("collector", "")),
                    ),
                )
        elif kind == "email":
            # .email('to'...) — SMTP transport is external: the config
            # supplies ``send(email.message.Message)`` (smtplib
            # send_message seam); the message itself is the golden-tested
            # handlers.email_message format
            send = cfg.get("send")
            if send is None:
                raise TickError(
                    "alert handler .email(): pass a send callable via "
                    "alert_services={'email': {'send': fn, 'from': ..., "
                    "'to': [...]}} — SMTP transport is external"
                )
            def _aslist(x):
                return [x] if isinstance(x, str) else list(x or [])

            to = (
                _aslist(opts.get("_arg"))
                + _aslist(opts.get("to"))
                + ([] if ("_arg" in opts or "to" in opts)
                   else _aslist(cfg.get("to")))
            )
            if not to:
                raise TickError("alert handler .email(): no recipients")
            for ev in events:
                send(H.email_message(ev, to=to, from_=cfg.get("from", "")))
        elif kind == "kafka":
            # .kafka().cluster(c).template(t) — broker transport external:
            # config supplies ``produce(topic, partition, key, value)``;
            # record format + partitionById mapping are the golden-tested
            # handlers.kafka_record / kafka_partition
            produce = cfg.get("produce")
            if produce is None:
                raise TickError(
                    "alert handler .kafka(): pass a produce callable via "
                    "alert_services={'kafka': {'produce': fn, 'topic': ..., "
                    "'partitions': N}} — the broker transport is external"
                )
            topic = opts.get("kafkaTopic", cfg.get("topic", ""))
            nparts = int(cfg.get("partitions", 1))
            algo = cfg.get("partition_algorithm", "crc32")
            tmpl = opts.get("template")
            for ev in events:
                rec = H.kafka_record(
                    ev, topic,
                    # the reference executes .template() per alert
                    # (services/kafka/service.go:407-410)
                    template_message=(
                        H.render_event_template(ev, tmpl)
                        if tmpl is not None else None
                    ),
                )
                part = (
                    H.kafka_partition(rec["key"], nparts, algo)
                    if cfg.get("partition_by_id", True) and nparts > 1
                    else 0
                )
                produce(rec["topic"], part, rec["key"], rec["value"])
        elif kind == "snmpTrap":
            # .snmpTrap('oid').data(oid, type, value)... — wire encoding
            # (BER) external: config supplies ``send(varbinds)``; the
            # varbind list is the golden-tested handlers.snmptrap_varbinds
            send = cfg.get("send")
            if send is None:
                raise TickError(
                    "alert handler .snmpTrap(): pass a send callable via "
                    "alert_services={'snmpTrap': {'send': fn}} — the SNMP "
                    "wire transport is external"
                )
            trap_oid = opts.get("_arg", cfg.get("trap_oid", ""))
            data = opts.get("data", [])
            if data and not isinstance(data[0], (list, tuple)):
                data = [tuple(data)]
            for ev in events:
                # .data() VALUES are templates executed per event
                # (services/snmptrap/service.go:220-246)
                rows = [
                    (oid, typ, H.render_event_template(ev, str(value)))
                    for oid, typ, value in (tuple(d) for d in data)
                ]
                send(H.snmptrap_varbinds(ev, trap_oid, rows))
        elif kind == "mqtt":
            # .mqtt('topic').qos(n).retained(): the broker transport is
            # external (like kafka) — the config supplies ``publish``
            # (topic, qos, retained, payload) just as the reference's
            # mqtttest client seam does
            publish = cfg.get("publish")
            if publish is None:
                raise TickError(
                    "alert handler .mqtt(): pass a publish callable via "
                    "alert_services={'mqtt': {'publish': fn}} — the broker "
                    "transport itself is external"
                )
            topic = opts.get("_arg", opts.get("topic", cfg.get("topic", "")))
            for ev in events:
                rec = H.mqtt_record(
                    ev,
                    topic,
                    qos=int(opts.get("qos", cfg.get("qos", 0))),
                    retained=bool(opts.get("retained", cfg.get("retained", False))),
                )
                publish(rec["topic"], rec["qos"], rec["retained"], rec["payload"])
        else:
            raise TickError(
                f"alert handler .{kind}(): payload formatter exists in "
                "kapacitor_spark.handlers — call it directly with "
                "events_from_alert_df (TICK-chain delivery covers the HTTP "
                "services plus mqtt/kafka/snmpTrap/email via injected "
                "transport callables in alert_services)"
            )


# --------------------------------------------------------------------- #
# lexer
# --------------------------------------------------------------------- #

_TOK = re.compile(
    r"""\s*(?:
      (?P<comment>//[^\n]*)
    | (?P<dur>-?\d+(?:\.\d+)?(?:ns|us|µs|ms|s|m|h|d|w))(?![\w.])
    | (?P<num>-?\d+(?:\.\d+)?(?:[eE][+-]?\d+)?)
    | (?P<str3>'''(?:[^']|'(?!''))*''')
    | (?P<str>'(?:[^'\\]|\\.)*')
    | (?P<regex>/(?:[^/\\\n]|\\.)+/)
    | (?P<op>\|\||[|.@(),\[\]=*-])
    | (?P<ident>[A-Za-z_][A-Za-z0-9_]*)
    )""",
    re.VERBOSE,
)


_STMT_START = re.compile(
    r"\s*(?://[^\n]*\s*)*(?:var\s|[A-Za-z_][A-Za-z0-9_]*\s*[|@.])"
)


def _scan_lambda_body(src: str, start: int) -> int:
    """Return the end offset of a ``lambda: ...`` body beginning at
    ``start`` (offset of the 'lambda' keyword): scan to the first comma or
    close-paren at depth 0, skipping quoted strings/field refs. A bare
    ``var x = lambda: ...`` statement instead ends at a depth-0 newline
    whose next line begins a new statement (``var ...`` or an
    identifier starting a chain) — the template-task declaration form."""
    j = src.index(":", start) + 1
    depth = 0
    while j < len(src):
        c = src[j]
        if c == "'":
            j = src.index("'", j + 1)
        elif c == '"':
            j = src.index('"', j + 1)
        elif c == "(":
            depth += 1
        elif c == ")":
            if depth == 0:
                break
            depth -= 1
        elif c == "," and depth == 0:
            break
        elif c == "\n" and depth == 0 and _STMT_START.match(src, j):
            break
        j += 1
    return j


def _tokenize(src: str):
    toks, pos = [], 0
    while pos < len(src):
        m = _TOK.match(src, pos)
        if not m:
            if src[pos:].strip() == "":
                break
            raise TickError(f"cannot tokenize at {src[pos:pos+30]!r}")
        if m.group("ident") == "lambda":
            end = _scan_lambda_body(src, m.start("ident"))
            toks.append(("lambda", src[m.start("ident"):end], m.start("ident")))
            pos = end
            continue
        pos = m.end()
        if m.group("comment"):
            continue
        for kind in ("dur", "num", "str3", "str", "regex", "op", "ident"):
            v = m.group(kind)
            if v is not None:
                toks.append((kind, v, m.start()))
                break
    toks.append(("eof", "", len(src)))
    return toks, src


# --------------------------------------------------------------------- #
# parser/evaluator (single pass, like tick/eval.go's stack machine)
# --------------------------------------------------------------------- #


class _P:
    def __init__(self, toks, src, env):
        self.toks, self.src, self.i = toks, src, 0
        self.env = env

    def peek(self):
        return self.toks[self.i]

    def next(self):
        t = self.toks[self.i]
        self.i += 1
        return t

    def at_op(self, *ops):
        k, v, _ = self.peek()
        return k == "op" and v in ops

    def expect(self, op):
        k, v, p = self.next()
        if k != "op" or v != op:
            raise TickError(f"expected {op!r} at offset {p}, got {v!r}")

    def run(self):
        while self.peek()[0] != "eof":
            k, v, _ = self.peek()
            if k == "ident" and v == "var":
                self.next()
                _, name, _ = self.next()
                self.expect("=")
                val = self.expr()
                # template semantics (reference template.go): script vars
                # are DEFAULTS; definition-supplied vars override them
                preset = getattr(self.env, "preset_vars", None) or {}
                if name in preset:
                    pv = preset[name]
                    if isinstance(pv, _Lambda) and not pv.vars:
                        # bind the full script scope, like default lambdas
                        pv = _Lambda(pv.src, self.env.vars)
                    val = pv
                self.env.vars[name] = val
            else:
                res = self.expr()
                # terminal sink builders (kapacitorLoopback, httpPost with
                # endpoint/header props, alert nodes ending in handler
                # chains like .slack()) fire their side effect when the
                # statement ends without further chaining
                if isinstance(res, _Node) and res.name in (
                    "kapacitorLoopback", "httpPost", "influxDBOut", "alert"
                ):
                    self.env._materialize(res)

    def expr(self):
        node = self.primary()
        while True:
            if self.at_op("|"):
                self.next()
                _, name, _ = self.next()
                args = self.call_args()
                node = self.env.chain(node, name, args)
            elif self.at_op("."):
                self.next()
                _, name, _ = self.next()
                args = self.call_args()
                node = self.env.prop(node, name, args)
            elif self.at_op("@"):
                # @UDF chain method (/root/reference/task_master.go:497-525
                # dynamic UDF scope methods): dispatched to a registered
                # @udf_node via run_tickscript(udfs={name: fn})
                self.next()
                _, name, _ = self.next()
                args = self.call_args()
                node = self.env.chain(node, "@" + name, args)
            else:
                return node

    def primary(self):
        k, v, p = self.next()
        if k == "op" and v == "*":
            # groupBy(*) / groupBy(*).exclude(...) — group by every tag
            # (pipeline/group_by.go:139)
            return "*"
        if k == "op" and v == "-":
            # unary minus on a literal or var (e.g. shift(-period))
            inner = self.primary()
            if isinstance(inner, (int, float)):
                return -inner
            if isinstance(inner, _Duration):
                return _Duration(
                    inner.text[1:] if inner.text.startswith("-") else "-" + inner.text
                )
            raise TickError(f"cannot negate {inner!r} at offset {p}")
        if k == "ident":
            if v == "time" and self.at_op("("):
                # groupBy(time(2s[, offset])) — InfluxQL time bucketing
                # inside a batch query's groupBy (pipeline/batch.go GroupBy)
                return _TimeGroup(*self.call_args())
            if v in ("stream", "batch"):
                return _Source(v)
            if v in ("TRUE", "FALSE"):
                return v == "TRUE"
            if v in self.env.vars:
                return self.env.vars[v]
            raise TickError(f"unknown identifier {v!r} at offset {p}")
        if k == "str3":
            # triple-quoted string (batch query bodies in the reference's
            # own scripts: query('''SELECT ...'''))
            return v[3:-3]
        if k == "str":
            return v[1:-1].replace("\\'", "'")
        if k == "dur":
            return _Duration(v)
        if k == "num":
            return float(v) if "." in v or "e" in v.lower() else int(v)
        if k == "regex":
            return _Regex(v[1:-1])
        if k == "lambda":
            # bare lambda value (template-var declarations:
            # var match = lambda: ...) — same scope capture as call args
            return _Lambda(v, self.env.vars)
        raise TickError(f"unexpected token {v!r} at offset {p}")

    def call_args(self):
        """Arguments of a method call; lambdas are captured raw (paren/
        comma-depth aware) and compiled later with the pipeline's event
        ordering."""
        if not self.at_op("("):
            raise TickError(f"method call needs parentheses near offset {self.peek()[2]}")
        self.expect("(")
        args = []
        while not self.at_op(")"):
            k, v, p = self.peek()
            if k == "lambda":
                self.next()
                args.append(_Lambda(v, self.env.vars))
            else:
                args.append(self.arg_value())
            if self.at_op(","):
                self.next()
        self.expect(")")
        return args

    def arg_value(self):
        if self.at_op("["):
            self.next()
            out = []
            while not self.at_op("]"):
                out.append(self.arg_value())
                if self.at_op(","):
                    self.next()
            self.expect("]")
            return out
        return self.primary()

class _TimeGroup:
    """groupBy(time(d[, offset])) marker — InfluxQL downsampling buckets."""

    def __init__(self, interval, offset=None):
        self.interval = interval
        self.offset = offset


class _Source:
    def __init__(self, kind):
        self.kind = kind


class _Duration:
    def __init__(self, text):
        self.text = text
        self.seconds = parse_duration(text)


class _Regex:
    def __init__(self, pat):
        self.pat = pat


class _Lambda:
    def __init__(self, src, variables=None):
        self.src = src
        # script var scope captured at parse (shared dict — vars are
        # defined before use, TICKscript has no forward refs)
        self.vars = variables


class _Node:
    """A chain node accumulating property calls until the next pipe
    materializes it (mirrors pipeline/*Node defs + validation)."""

    def __init__(self, name, args, parent):
        self.name, self.args, self.parent = name, args, parent
        self.props: list[tuple[str, list]] = []

    def prop(self, name, args):
        self.props.append((name, args))
        return self

    def prop_map(self):
        return dict(self.props)


def _dur(v) -> str | float:
    if isinstance(v, _Duration):
        return v.seconds
    return v


def _lam(p: Pipeline, v):
    if isinstance(v, _Lambda):
        from kapacitor_spark.functions.lambdas import compile_lambda

        return compile_lambda(
            v.src, ordered_window=p._ordered(), time_col=p.time_col,
            schema=dict(p.df.dtypes), variables=v.vars,
        )
    return v


def _mk_k8s_scaler(client, props):
    from kapacitor_spark.operators.autoscale import K8sAutoscaler

    kw = dict(
        resource_name=props.get("resourceName", [None])[0],
        resource_name_tag=props.get("resourceNameTag", [None])[0],
        namespace=props.get("namespace", [None])[0],
    )
    if "kind" in props:
        kw["kind"] = props["kind"][0]
    for tick_name, py_name in (
        ("namespaceTag", "namespace_tag"),
        ("kindTag", "kind_tag"),
        ("resourceTag", "resource_tag"),
    ):
        if tick_name in props:
            kw[py_name] = props[tick_name][0]
    return K8sAutoscaler(client, **kw)


def _mk_swarm_scaler(client, props):
    from kapacitor_spark.operators.autoscale import SwarmAutoscaler

    return SwarmAutoscaler(
        client,
        service_name=props.get("serviceName", [None])[0],
        service_name_tag=props.get("serviceNameTag", [None])[0],
        output_service_name_tag=props.get("outputServiceNameTag", [None])[0],
    )


def _mk_ec2_scaler(client, props):
    from kapacitor_spark.operators.autoscale import Ec2Autoscaler

    return Ec2Autoscaler(
        client,
        group_name=props.get("groupName", [None])[0],
        group_name_tag=props.get("groupNameTag", [None])[0],
        output_group_name_tag=props.get("outputGroupNameTag", [None])[0],
    )


# TICK autoscale node name -> (client kind, scaler factory) — shared by
# the batch env (_mk_*Autoscale) and the streaming compile (_SAutoscale)
_AUTOSCALE_KINDS = {
    "k8sAutoscale": ("k8s", _mk_k8s_scaler),
    "swarmAutoscale": ("swarm", _mk_swarm_scaler),
    "ec2Autoscale": ("ec2", _mk_ec2_scaler),
}


class _Env:
    """Executes chain/property calls — the task-level createNode dispatch
    (/root/reference/task.go:447-532) re-targeted at Pipeline."""

    AGGS = {
        "count", "sum", "mean", "median", "mode", "spread", "stddev",
        "min", "max", "first", "last", "distinct", "percentile",
        "top", "bottom", "derivative", "difference", "movingAverage",
        "cumulativeSum", "elapsed", "changeDetect", "stateDuration",
        "stateCount", "holtWinters", "holtWintersWithFit",
    }
    BUILDERS = {
        "from", "window", "eval", "default", "delete", "alert", "join",
        "query", "groupBy", "flatten", "combine", "kapacitorLoopback",
        "sideload", "barrier", "httpPost", "influxDBOut",
        "k8sAutoscale", "swarmAutoscale", "ec2Autoscale", "queryFlux",
    }

    def __init__(
        self, sources, time_col, dims, tiebreak, outputs, udfs=None,
        endpoints=None, influxdb=None, dbrp=None, alert_services=None,
        autoscale_clients=None, flux_client=None,
    ):
        self.dbrp = dbrp
        self.alert_services = alert_services
        self.autoscale_clients = autoscale_clients or {}
        self.flux_client = flux_client
        self.vars: dict[str, Any] = {}
        self.sources = sources
        self.time_col, self.dims, self.tiebreak = time_col, dims, tiebreak
        self.outputs = outputs
        self.udfs = udfs
        self.endpoints = endpoints
        self.influxdb = influxdb

    # -- source resolution ------------------------------------------- #

    def _source_pipeline(self, meas: str | None) -> Pipeline:
        src = self.sources
        if isinstance(src, Pipeline):
            return src
        if isinstance(src, DataFrame):
            return Pipeline.from_df(src, time_col=self.time_col, dims=self.dims,
                                    tiebreak=self.tiebreak)
        if callable(src):
            return src(meas)
        if meas is None and len(src) == 1:
            meas = next(iter(src))
        if meas not in src:
            raise TickError(f"no source for measurement {meas!r}")
        obj = src[meas]
        return obj if isinstance(obj, Pipeline) else Pipeline.from_df(
            obj, time_col=self.time_col, dims=self.dims, tiebreak=self.tiebreak
        )

    def _resolve_from(self, node: _Node) -> Pipeline:
        props = node.prop_map()
        meas = props.get("measurement", [None])[0]
        by_meas = "groupByMeasurement" in props
        p = self._source_pipeline(meas)
        if by_meas and "groupBy" not in props:
            p = p.group_by(by_measurement=True)
        for name, args in node.props:
            if name == "where":
                p = p.where(_lam(p, args[0]))
            elif name == "groupBy":
                tags = args[0] if args and isinstance(args[0], list) else list(args)
                p = p.group_by(*[t for t in tags], by_measurement=by_meas)
            elif name == "truncate":
                us = round(_dur(args[0]) * 1_000_000)
                p = p._with(p.df.withColumn(
                    p.time_col,
                    F.timestamp_micros(F.unix_micros(p.time) - F.unix_micros(p.time) % F.lit(us)),
                ))
            elif name == "round":
                # .round(d): point times round to the NEAREST multiple
                # (pipeline/stream.go:163 Round vs :152 Truncate's floor)
                us = round(_dur(args[0]) * 1_000_000)
                t = F.unix_micros(p.time)
                p = p._with(p.df.withColumn(
                    p.time_col,
                    F.timestamp_micros(
                        ((t + F.lit(us // 2)) - (t + F.lit(us // 2)) % F.lit(us))
                    ),
                ))
            elif name in ("database", "retentionPolicy", "measurement",
                          "groupByMeasurement"):
                pass  # routing metadata / handled above
            else:
                raise TickError(f"from(): unsupported property .{name}()")
        return p

    _QUERY_AGGS = {
        "mean": F.avg, "sum": F.sum, "count": F.count, "min": F.min,
        "max": F.max, "median": F.median, "first": F.first, "last": F.last,
        # the rest of the InfluxQL SELECT function set (influxql.gen.go);
        # percentile("f", N) dispatches to Pipeline.percentile below
        "stddev": F.stddev_samp,
        "spread": lambda fld: F.max(fld) - F.min(fld),
        "mode": F.mode,
        "distinct": F.count_distinct,
    }

    def _resolve_query(self, node: _Node) -> Pipeline:
        """batch|query('SELECT ... FROM "db"."rp".meas [WHERE ...]')
        .period(p).every(e).offset(o).align().groupBy(time(d), tags...)
        (/root/reference/pipeline/batch.go:53-200; batch.go:168-566):
        windows are enumerated over the source's event-time range
        (deterministic, clock-free), each window's [start, stop) filter
        pushes into the scan, and the InfluxQL projection runs per
        (window, time-bucket, tags) — the engine-side analog of the
        query InfluxDB would execute. Rows carry ``query_start`` and it
        joins the dims, so downstream nodes see per-batch groups exactly
        like the reference's batch edges (state resets per batch)."""
        import re as _re

        from kapacitor_spark.tasks import BatchQuery

        props = node.prop_map()
        sql = node.args[0]
        # validation parity (golden TestBatch_InvalidQuery, task.go
        # newQueryNode): exactly ONE statement, and it must be a SELECT —
        # 'SELECT ...; DROP DATABASE x' style injections are rejected
        stmts = [x for x in sql.split(";") if x.strip()]
        if len(stmts) > 1:
            raise TickError(
                f"query must be a single select statement, got {len(stmts)} statements"
            )
        if not _re.match(r"(?is)\s*SELECT\b", sql):
            raise TickError(f"query is not a select statement {sql!r}")
        m = _re.match(
            r"(?is)\s*SELECT\s+(.*?)\s+FROM\s+(\S+)(?:\s+WHERE\s+(.*?))?\s*;?\s*$",
            sql.strip(),
        )
        if not m:
            raise TickError(f"query(): cannot parse {sql!r}")
        sel, table, where = m.group(1).strip(), m.group(2), m.group(3)
        meas = table.split(".")[-1].strip('"').strip("'")
        p = self._source_pipeline(meas)
        if where:
            # InfluxQL double-quoted identifiers → Spark backticks (a
            # double-quoted token is a STRING literal to Spark SQL)
            p = p.where(_re.sub(r'"(\w+)"', r"`\1`", where))

        tags: list[str] = []
        bucket = None
        bucket_offset = 0.0
        for name, args in node.props:
            if name == "groupBy":
                vals = args[0] if args and isinstance(args[0], list) else list(args)
                for a in vals:
                    if isinstance(a, _TimeGroup):
                        bucket = _dur(a.interval)
                        bucket_offset = _dur(a.offset) if a.offset is not None else 0.0
                    else:
                        tags.append(a)
        p = p.group_by(*tags) if tags else p

        if "period" not in props:
            raise TickError("query() needs .period(d)")
        bq = BatchQuery(
            period=_dur(props["period"][0]),
            every=_dur(props["every"][0]) if "every" in props else None,
            offset=_dur(props["offset"][0]) if "offset" in props else 0.0,
            align="align" in props,
        )
        tmin, tmax = p.df.agg(
            F.min(p.time_col), F.max(p.time_col)
        ).first()  # tiny driver agg: the replay range
        if tmin is None:
            raise TickError(
                "batch|query(): source has no rows — nothing to replay "
                "(the reference would simply issue empty queries; here an "
                "empty replay range is almost certainly a wrong source path)"
            )
        import datetime as _dt

        ev = _dur(props.get("every", props["period"])[0])
        every_s = ev if isinstance(ev, float) else float(ev)
        win = bq.backfill(
            p.df,
            tmin.replace(tzinfo=_dt.timezone.utc),
            # ticks fall on t0+k·every; extend the stop so the final window
            # covers the last point
            tmax.replace(tzinfo=_dt.timezone.utc) + _dt.timedelta(seconds=every_s),
            time_col=p.time_col,
        )
        out = Pipeline(
            df=win, time_col=p.time_col,
            dims=(*tags, "query_start"), tiebreak=p.tiebreak,
            results=p.results,
        )

        align_group = "alignGroup" in props

        def bucketed(o: Pipeline) -> Pipeline:
            """Apply the groupBy(time(d)) bucketing: epoch-aligned Spark
            windows normally; .alignGroup() (pipeline/batch.go:170
            AlignGroup) instead aligns buckets to each batch WINDOW's
            start — expressed as a computed bucket key appended to the
            dims (qs + floor((t-qs)/d)*d), no F.window involved."""
            from dataclasses import replace as _r

            if bucket is None:
                return o
            if not align_group:
                return o.window_time(bucket, bucket, offset=bucket_offset)
            d_us = round(_dur(bucket) * 1_000_000)
            qs = F.unix_micros(F.col("query_start"))
            t = F.unix_micros(F.col(o.time_col))
            bk = F.timestamp_micros(
                qs + F.floor((t - qs) / F.lit(d_us)).cast("long") * F.lit(d_us)
            )
            return _r(o, df=o.df.withColumn("__bk", bk), dims=(*o.dims, "__bk"))

        def unbucket(o: Pipeline) -> Pipeline:
            from dataclasses import replace as _r

            if "__bk" not in o.df.columns:
                return o
            df = o.df.withColumn(o.time_col, F.col("__bk")).drop("__bk")
            return _r(o, df=df, dims=tuple(d for d in o.dims if d != "__bk"))

        agg_re = (
            r'(\w+)\(\s*"?(\w+)"?\s*(?:,\s*([\d.]+)\s*)?\)'
            r'(?:\s+AS\s+"?(\w+)"?)?'
        )
        parts = [s.strip() for s in _re.split(r",(?![^(]*\))", sel) if s.strip()]
        if len(parts) > 1 and any(
            "(" in part and _re.fullmatch(agg_re, part, _re.I) for part in parts
        ):
            # a comma list where ANY entry is an aggregate call must be a
            # fully-supported multi-aggregate — falling through to the
            # plain-projection branch would silently emit raw rows
            bad = [
                part
                for part in parts
                if not (
                    (pm := _re.fullmatch(agg_re, part, _re.I))
                    and pm.group(1).lower() in self._QUERY_AGGS
                )
            ]
            if bad:
                raise TickError(
                    f"query(): unsupported entries in multi-aggregate "
                    f"SELECT: {bad} (percentile and plain fields must be "
                    "selected in their own query())"
                )
            # multi-aggregate SELECT (InfluxQL 'SELECT mean(a), max(b)'):
            # one grouped aggregation with all output columns. first/last
            # are excluded — Spark's grouped first is order-arbitrary and
            # only the single-agg path pins the reference's time ordering.
            cols = []
            for part in parts:
                pm = _re.fullmatch(agg_re, part, _re.I)
                fname = pm.group(1).lower()
                if fname in ("first", "last"):
                    raise TickError(
                        "query(): first/last in a multi-aggregate SELECT "
                        "are not supported — select them alone"
                    )
                alias = pm.group(4) or fname
                cols.append(self._QUERY_AGGS[fname](pm.group(2)).alias(alias))
            if props.get("fill", [None])[0] not in (None, "none"):
                raise TickError(
                    "query(): .fill() with a multi-aggregate SELECT is not "
                    "supported — fill each aggregate in its own query()"
                )
            return unbucket(bucketed(out).agg(*cols))
        am = _re.fullmatch(agg_re, sel, _re.I)
        if am and (
            am.group(1).lower() in self._QUERY_AGGS
            or am.group(1).lower() == "percentile"
        ):
            fname, fld, extra = am.group(1).lower(), am.group(2), am.group(3)
            alias = am.group(4) or fname
            out = bucketed(out)
            # InfluxQL emits the bucket/window START as the row time
            if fname == "percentile":
                # percentile("f", N): influxdb's exact non-interpolating
                # formula (Pipeline.percentile)
                out = out.percentile(fld, float(extra), as_=alias)
            else:
                out = out._single_agg(self._QUERY_AGGS[fname](fld), alias)
            out = unbucket(out)
            fill = props.get("fill", [None])[0]
            if fill is not None and fill != "none" and bucket is not None:
                out = self._query_fill(
                    out, fill, _dur(bucket), bucket_offset,
                    _dur(props["period"][0]), alias, tags,
                    align_group=align_group,
                )
        elif sel not in ("*",):
            # plain projection: keep time/dims + the selected fields;
            # rows with NO selected field are dropped (InfluxQL returns
            # only rows carrying a selected value — golden serverB null
            # gap in TestBatch_StateTracking)
            flds = [
                f.strip().strip('"') for f in sel.split(",") if f.strip()
            ]
            keep = [out.time_col, *out.dims, *flds]
            df = out.df.select(
                *[c for c in dict.fromkeys(keep) if c in out.df.columns]
            )
            present = [F.col(f) for f in flds if f in df.columns]
            if present:
                cond = present[0].isNotNull()
                for c in present[1:]:
                    cond = cond | c.isNotNull()
                df = df.filter(cond)
            out = out._with(df, dims=out.dims)
        return out

    def _resolve_query_flux(self, node: _Node) -> Pipeline:
        """batch|queryFlux('from(bucket:...) |> ...').every(e)/.cron(c)
        .period(p).offset(o).align().org(o).orgID(id).cluster(c)
        (/root/reference/pipeline/batch.go:367-443, batch.go:569-680,
        fluxquery.go): the engine does NOT interpret Flux — the script
        ships to an InfluxDB 2.x /api/v2/query endpoint and the returned
        table flows in as a batch edge (the reference's FluxQueryService
        seam, mocked in its own TestBatch_Flux). Pass the client via
        ``run_tickscript(flux_client=fn)`` with
        ``fn(script, org, org_id) -> DataFrame``.

        Replay divergence (documented): the reference re-issues the query
        on every schedule tick against live data; a deterministic batch
        replay has no wall clock, so the client is invoked ONCE — the
        schedule properties are validated with the reference's exact
        error strings (batch.go:600-614) and recorded, and a live
        deployment drives the cadence outside the engine."""
        if not node.args:
            raise TickError("queryFlux() needs the Flux script argument")
        props = node.prop_map()
        # value semantics exactly mirror batch.go:599-615: Every > 0 means
        # set (0 = unset, negative = error), Cron set = non-empty string
        every = _dur(props["every"][0]) if props.get("every") else 0.0
        cron = (props.get("cron") or [""])[0]
        if every != 0 and cron != "":
            raise TickError("must not set both 'every' and 'cron' properties")
        if every < 0:
            # the doubled 'must must' is the reference's own error string
            raise TickError("'every' duration must must non-negative")
        if every == 0 and cron == "":
            raise TickError("must define one of 'every' or 'cron'")
        if cron and not (5 <= len(cron.split()) <= 7):
            # the reference validates cron syntax at schedule creation
            # (gorhill/cronexpr accepts 5-7 fields); a silently-ignored
            # malformed schedule is the failure mode to avoid
            raise TickError(f"invalid cron expression {cron!r}")
        if self.flux_client is None:
            raise TickError(
                "queryFlux(): no Flux client — pass "
                "run_tickscript(flux_client=fn) with "
                "fn(script, org, org_id) -> DataFrame"
            )
        df = self.flux_client(
            node.args[0],
            (props.get("org") or [""])[0],
            (props.get("orgID") or [""])[0],
        )
        return Pipeline.from_df(
            df, time_col=self.time_col, dims=self.dims, tiebreak=self.tiebreak
        )

    def _query_fill(
        self, out: Pipeline, fill, bucket_s, offset_s, period_s, alias, tags,
        align_group: bool = False,
    ) -> Pipeline:
        """query().fill(...) — InfluxQL groupBy-time gap filling
        (/root/reference/batch.go:210-225 forwards it into the InfluxDB
        query; pipeline/batch.go:180-188 documents the options). Empty
        time buckets inside each batch window become rows:

        * a number      → that value
        * 'null'        → a row with a NULL value
        * 'previous'    → the previous bucket's value (within the window)
        * 'linear'      → linear interpolation between the neighboring
                          non-empty buckets (edges stay NULL, like
                          InfluxDB)
        * 'none'        → no fill (default; handled by the caller)

        The bucket spine is generated per (query_start, tags) with one
        ``sequence`` + explode — no scan of the data range — then a left
        join attaches the aggregated buckets. All expression-level."""
        d_us = round(bucket_s * 1_000_000)
        per_us = round(period_s * 1_000_000)
        off_us = round(offset_s * 1_000_000)
        df = out.df
        tcol = out.time_col
        keys = [t for t in tags] + ["query_start"]
        qs_us = F.unix_micros(F.col("query_start"))
        if align_group:
            first = qs_us  # alignGroup buckets start AT the window start
        else:
            first = (
                F.floor((qs_us - F.lit(off_us)) / F.lit(d_us)) * F.lit(d_us)
                + F.lit(off_us)
            ).cast("long")
        spine = (
            df.select(*keys).distinct().withColumn(
                tcol,
                F.explode(
                    F.sequence(
                        first, qs_us + F.lit(per_us - 1), F.lit(d_us)
                    )
                ),
            ).withColumn(tcol, F.timestamp_micros(F.col(tcol)))
        )
        joined = spine.join(df, [*keys, tcol], "left")
        w = (
            Window.partitionBy(*[F.col(k) for k in keys]).orderBy(tcol)
        )
        if fill == "null":
            filled = joined
        elif fill == "previous":
            filled = joined.withColumn(
                alias,
                F.last(alias, ignorenulls=True).over(
                    w.rowsBetween(Window.unboundedPreceding, 0)
                ),
            )
        elif fill == "linear":
            t_us = F.unix_micros(F.col(tcol))
            has = F.col(alias).isNotNull()
            pv = F.last(F.when(has, F.col(alias)), ignorenulls=True).over(
                w.rowsBetween(Window.unboundedPreceding, -1)
            )
            pt = F.last(F.when(has, t_us), ignorenulls=True).over(
                w.rowsBetween(Window.unboundedPreceding, -1)
            )
            nv = F.first(F.when(has, F.col(alias)), ignorenulls=True).over(
                w.rowsBetween(1, Window.unboundedFollowing)
            )
            nt = F.first(F.when(has, t_us), ignorenulls=True).over(
                w.rowsBetween(1, Window.unboundedFollowing)
            )
            interp = pv + (nv - pv) * (t_us - pt) / (nt - pt)
            filled = joined.withColumn(
                alias, F.coalesce(F.col(alias), interp)
            )
        else:
            # fill value takes the aggregate column's OWN type: fill(0) on
            # an integer count keeps the column long (coalescing a double
            # literal would silently promote every row to double)
            filled = joined.withColumn(
                alias,
                F.coalesce(
                    F.col(alias),
                    F.lit(fill).cast(joined.schema[alias].dataType),
                ),
            )
        return out._with(filled, dims=out.dims)

    # -- chain dispatch ----------------------------------------------- #

    def chain(self, node, name, args):
        # materialize any pending builder/aggregation the chain continues from
        if isinstance(node, _Node):
            node = self._materialize(node)
        if isinstance(node, _PendingAgg):
            node = node._build()
        if isinstance(node, _Source):
            if name == "from":
                return _Node("from", args, node)
            if name == "query":
                if node.kind != "batch":
                    raise TickError("query() requires a batch source")
                return _Node("query", args, node)
            if name == "queryFlux":
                if node.kind != "batch":
                    raise TickError("queryFlux() requires a batch source")
                return _Node("queryFlux", args, node)
            raise TickError(f"{node.kind} source supports |from()")
        if name in self.BUILDERS or name.startswith("@"):
            return _Node(name, args, node)
        if isinstance(node, Pipeline):
            return self._apply_chain(node, name, args)
        raise TickError(f"cannot chain |{name}() here")

    def prop(self, node, name, args):
        if isinstance(node, _Node):
            return node.prop(name, args)
        if isinstance(node, Pipeline) and name == "rename":
            # union(...).rename(m) (/root/reference/pipeline/union.go:
            # .rename sets the output measurement name)
            return node._with(
                node.df.withColumn("name", F.lit(args[0])), dims=node.dims
            )
        raise TickError(f"property .{name}() without a node")

    def _materialize(self, node: _Node):
        p = node.parent
        if isinstance(p, _Node):
            p = self._materialize(p)
        if isinstance(p, _PendingAgg):
            p = p._build()
        if node.name == "from":
            return self._resolve_from(node)
        if node.name == "query":
            return self._resolve_query(node)
        if node.name == "queryFlux":
            return self._resolve_query_flux(node)
        if not isinstance(p, Pipeline):
            raise TickError(f"|{node.name}() needs an upstream pipeline")
        if node.name.startswith("@"):
            return self._mk_udf(p, node)
        fn = getattr(self, f"_mk_{node.name}", None)
        if fn is None:
            raise TickError(f"unsupported node |{node.name}()")
        return fn(p, node)

    def _mk_udf(self, p: Pipeline, node: _Node) -> Pipeline:
        """@UDF node (/root/reference/udf.go; integration golden
        TestStream_CustomFunctions): properties become the Init option
        list (udf/agent/udf.proto InitRequest/Option) — here plain kwargs
        to the registered @udf_node (single-value props unwrap, durations
        become seconds)."""
        name = node.name[1:]
        fn = (self.udfs or {}).get(name)
        if fn is None:
            raise TickError(
                f"@{name}(): no UDF registered — pass run_tickscript(udfs={{{name!r}: fn}})"
            )
        opts = {}
        for pname, args in node.props:
            vals = [
                _dur(a) if isinstance(a, _Duration) else a for a in args
            ]
            opts[pname] = vals[0] if len(vals) == 1 else tuple(vals)
        if getattr(fn, "__udf_node__", False):
            return p.udf(fn, **opts)
        return fn(p, **opts)

    # -- builder materializers ---------------------------------------- #

    def _mk_kapacitorLoopback(self, p: Pipeline, node: _Node) -> Pipeline:
        """kapacitorLoopback() (/root/reference/kapacitor_loopback.go;
        pipeline/kapacitor_loopback.go:9-27): re-inject this node's points
        under a target database/retentionPolicy. Spark mapping: the points
        DataFrame is registered in outputs as ``loopback:<db>.<rp>`` — a
        task-master layer (or the caller) feeds it to the subscribed
        script's sources, exactly how the reference routes by DBRP
        (task_master.go forkPoint). Ported fixture:
        TestStream_KapacitorLoopback."""
        props = node.prop_map()
        db = props.get("database", ["dbname"])[0]
        rp = props.get("retentionPolicy", ["rpname"])[0]
        # loop prevention (golden TestStream_KapacitorLoopback_PreventLoop;
        # task_master.go checks the loopback DBRP against the task's
        # subscriptions): writing back into the DBRP this task reads from
        # would feed the task its own output forever
        if self.dbrp is not None and f"{db}.{rp}" == self.dbrp:
            raise TickError(
                f"kapacitorLoopback(): loopback to {db}.{rp} would create "
                "a loop — the task subscribes to that same database/"
                "retention policy"
            )
        self.outputs[f"loopback:{db}.{rp}"] = p.df
        return p

    def _mk_httpPost(self, p: Pipeline, node: _Node) -> Pipeline:
        """httpPost('url') or httpPost().endpoint(name).header(k,v)
        (/root/reference/pipeline/http_post.go; services/httppost
        endpoint configs): endpoints resolve through
        ``run_tickscript(endpoints={name: url-or-config})`` — a config
        may be a plain URL string or ``{"url": ..., "headers": {...},
        "body_template": ...}``."""
        from kapacitor_spark.sinks import apply_sink, http_post

        props = node.prop_map()
        headers = {a[0]: a[1] for n, a in node.props if n == "header"}
        body_template = None
        if node.args:
            url = node.args[0]
        else:
            ep = props.get("endpoint", [None])[0]
            conf = (self.endpoints or {}).get(ep)
            if conf is None:
                raise TickError(
                    f"httpPost(): unknown endpoint {ep!r} — pass "
                    f"run_tickscript(endpoints={{{ep!r}: url-or-config}})"
                )
            if isinstance(conf, str):
                url = conf
            else:
                url = conf["url"]
                headers = {**conf.get("headers", {}), **headers}
                body_template = conf.get("body_template")
        apply_sink(
            p.df,
            http_post(
                url, headers=headers or None, body_template=body_template,
                capture_response="captureResponse" in props,
            ),
        )
        return p

    def _mk_influxDBOut(self, p: Pipeline, node: _Node) -> Pipeline:
        """influxDBOut().database(db).retentionPolicy(rp).measurement(m)
        .precision(pr).tag(k,v).create() (/root/reference/influxdb_out.go):
        writes line protocol to the InfluxDB configured via
        ``run_tickscript(influxdb='http://...')``. Without a configured
        URL the node is a recorded no-op (the reference likewise needs a
        configured cluster)."""
        if not self.influxdb:
            return p
        from kapacitor_spark.sinks import influxdb_http_out

        props = node.prop_map()
        influxdb_http_out(
            p.df,
            self.influxdb,
            database=props.get("database", ["db"])[0],
            measurement=props.get("measurement", ["m"])[0],
            retention_policy=props.get("retentionPolicy", [""])[0],
            precision=props.get("precision", ["ns"])[0],
            tags={a[0]: a[1] for n, a in node.props if n == "tag"},
            time_col=p.time_col,
            create="create" in props,
        )
        return p

    def _mk_barrier(self, p: Pipeline, node: _Node) -> Pipeline:
        """barrier().idle(d)/.period(d)/.delete(b) (/root/reference/
        barrier.go): in this BATCH evaluation context event time is
        already complete, so the barrier is a recorded no-op; the
        streaming compile target is kapacitor_spark.streaming.barrier
        (withWatermark) where idle/period bound state and drop late data."""
        return p

    def _mk_sideload(self, p: Pipeline, node: _Node) -> Pipeline:
        """sideload() (/root/reference/pipeline/sideload.go:8-37): file://
        source + order templates load per-level lookup tables
        (sources/sideload.py); .field()/.tag() declare loaded names and
        defaults. Golden: TestStream_Sideload(_Multiple)."""
        from kapacitor_spark.sources.sideload import load_sideload_levels

        props = node.prop_map()
        src = props.get("source", [None])[0]
        if src is None:
            raise TickError("sideload() needs .source('file://dir')")
        order = [a for name, args in node.props if name == "order" for a in args]
        defaults = {}
        fields = []
        for name, args in node.props:
            if name in ("field", "tag"):
                fields.append(args[0])
                defaults[args[0]] = args[1]
        lookups, ons = load_sideload_levels(p.df.sparkSession, src, order)
        return p.sideload(lookups, on=ons, fields=fields or None, defaults=defaults)

    def _autoscale(self, p: Pipeline, node: _Node, kind: str, mk) -> Pipeline:
        """Shared k8s/swarm/ec2Autoscale materializer
        (/root/reference/autoscale.go; pipeline/{k8s,swarm,ec2}_autoscale.go
        defaults Min=1, Max=0, cooldowns 0). ``mk(client, props)`` builds
        the concrete Autoscaler from the node's naming properties."""
        props = node.prop_map()
        cluster = props.get("cluster", [""])[0]
        clients = self.autoscale_clients
        client = clients.get((kind, cluster)) or clients.get(kind)
        if client is None:
            raise TickError(
                f"{node.name}(): no {kind} client — pass "
                f"run_tickscript(autoscale_clients={{{kind!r}: client}})"
            )
        scaler = mk(client, props)
        if "replicas" not in props:
            raise TickError(f"{node.name}() needs .replicas(lambda: ...)")
        if "currentField" in props:
            raise TickError(
                f"{node.name}().currentField(): state-dependent replicas "
                "lambdas need the Python API (Pipeline.autoscale current_fn=)"
            )
        node._autoscaler = scaler  # exposed for stats assertions
        return p.autoscale(
            scaler,
            _lam(p, props["replicas"][0]),
            min=int(props.get("min", [1])[0]),
            max=int(props.get("max", [0])[0]),
            increase_cooldown=_dur(props.get("increaseCooldown", [0.0])[0]),
            decrease_cooldown=_dur(props.get("decreaseCooldown", [0.0])[0]),
        )

    def _mk_k8sAutoscale(self, p: Pipeline, node: _Node) -> Pipeline:
        return self._autoscale(p, node, "k8s", _mk_k8s_scaler)

    def _mk_swarmAutoscale(self, p: Pipeline, node: _Node) -> Pipeline:
        return self._autoscale(p, node, "swarm", _mk_swarm_scaler)

    def _mk_ec2Autoscale(self, p: Pipeline, node: _Node) -> Pipeline:
        return self._autoscale(p, node, "ec2", _mk_ec2_scaler)

    def _mk_window(self, p: Pipeline, node: _Node) -> Pipeline:
        props = node.prop_map()
        if "periodCount" in props:
            return p.window_count(
                int(props["periodCount"][0]),
                int(props.get("everyCount", [1])[0]),
                fill_period="fillPeriod" in props,
            )
        period = _dur(props["period"][0])
        every = _dur(props.get("every", [None])[0]) if "every" in props else None
        return p.window_time(period, every, fill_period="fillPeriod" in props)

    def _mk_eval(self, p: Pipeline, node: _Node) -> Pipeline:
        props = node.prop_map()
        names = props.get("as", [])
        if len(names) != len(node.args):
            raise TickError("eval(): .as() must name every expression")
        # reference keep semantics (pipeline/eval.go Keep): no .keep() →
        # only time+dims+outputs survive; bare .keep() → keep everything;
        # .keep('a','b') → keep the listed subset (+outputs named in it)
        if "keep" not in props:
            keep = False
        else:
            keep = [a for a in props["keep"]] or True
        out = p
        quiet = "quiet" in props
        for n, l in zip(names, node.args):
            # .quiet() (pipeline/eval.go QuietFlag): an eval error (missing
            # field / div-by-zero NULL) drops the point silently
            out = out.eval(keep=True, drop_errors=quiet, **{n: _lam(out, l)})
        if keep is False:
            cols = [out.time_col, *out.dims, *names]
            out = out._with(out.df.select(*dict.fromkeys(cols)))
        elif keep is not True:
            cols = [out.time_col, *out.dims, *keep, *names]
            out = out._with(out.df.select(*[c for c in dict.fromkeys(cols) if c in out.df.columns]))
        return out

    def _mk_default(self, p: Pipeline, node: _Node) -> Pipeline:
        # .tag() defaults use the empty-string-counts-as-missing rule
        # (default.go:100), applied one prop at a time so chained
        # default() nodes compose like the reference's
        out = p
        for name, args in node.props:
            if name == "field":
                out = out.default(**{args[0]: args[1]})
            elif name == "tag":
                out = out.default(tags={args[0]: args[1]})
        return out

    def _mk_delete(self, p: Pipeline, node: _Node) -> Pipeline:
        cols = [args[0] for name, args in node.props if name in ("field", "tag")]
        return p.delete(*cols)

    def _mk_groupBy(self, p: Pipeline, node: _Node) -> Pipeline:
        tags = node.args[0] if node.args and isinstance(node.args[0], list) else list(node.args)
        props = node.prop_map()
        exclude = props.get("exclude", [])
        return p.group_by(
            *tags, exclude=exclude, by_measurement="byMeasurement" in props
        )

    def _mk_flatten(self, p: Pipeline, node: _Node) -> Pipeline:
        props = node.prop_map()
        on = props.get("on", [])
        on = on[0] if on and isinstance(on[0], list) else on
        tol = _dur(props["tolerance"][0]) if "tolerance" in props else None
        fields = [
            c for c in p.df.columns if c not in (p.time_col, *p.dims, *on)
        ]
        return p.flatten(
            on=on, fields=fields[:1], tolerance=tol,
            delimiter=props.get("delimiter", ["."])[0],
            drop_original_field_name="dropOriginalFieldName" in props,
        )

    def _mk_combine(self, p: Pipeline, node: _Node) -> Pipeline:
        props = node.prop_map()
        as_ = tuple(props.get("as", ("a", "b")))
        tol = _dur(props["tolerance"][0]) if "tolerance" in props else None
        preds = [l.src if isinstance(l, _Lambda) else l for l in node.args]
        return p.combine(*preds, as_=as_, tolerance=tol)

    def _mk_join(self, p: Pipeline, node: _Node) -> Pipeline:
        other = node.args[0]
        if isinstance(other, _Node):
            other = self._materialize(other)
        if isinstance(other, _PendingAgg):
            other = other._build()
        props = node.prop_map()
        prefixes = tuple(props.get("as", ("a", "b")))
        tol = _dur(props["tolerance"][0]) if "tolerance" in props else None
        fill = props.get("fill", [None])[0]
        on = props.get("on", [None])[0]
        return p.join(
            other, prefixes=prefixes, tolerance=tol, fill=fill,
            on=on if isinstance(on, list) else None,
            # reference default delimiter is '.' (pipeline/join.go:13)
            delimiter=props.get("delimiter", ["."])[0],
            stream_name=props.get("streamName", [None])[0],
            delete_all="deleteAll" in props,
        )

    def _mk_alert(self, p: Pipeline, node: _Node) -> Pipeline:
        props = node.prop_map()
        kw = {}
        for lvl, key in (
            ("crit", "crit"), ("warn", "warn"), ("info", "info"),
            ("critReset", "crit_reset"), ("warnReset", "warn_reset"),
            ("infoReset", "info_reset"),
        ):
            if lvl in props:
                kw[key] = _lam(p, props[lvl][0])
        sco_args = props.get("stateChangesOnly")

        def tick_tmpl(v):
            """TICK .id()/.message()/.details() strings are Go templates:
            text without {{ }} is a LITERAL ('cpu:h1' must not parse as a
            Spark variant-extraction expression). Pipeline.alert's SQL
            pass-through stays available to Python-DSL callers."""
            if v is None or "{{" in v:
                return v
            return "'" + v.replace("\\", "\\\\").replace("'", "\\'") + "'"

        out = p.alert(
            state_changes_only="stateChangesOnly" in props,
            # the reference's STREAM trigger rule is always on
            # (alert.go:1127 — non-OK fires, OK fires only as recovery);
            # stateChangesOnly is the stricter filter when present
            events_only="stateChangesOnly" not in props,
            max_interval=_dur(sco_args[0]) if sco_args else None,
            no_recoveries="noRecoveries" in props,
            flapping=tuple(props["flapping"]) if "flapping" in props else None,
            history=int(props.get("history", [21])[0]),
            level_col=props.get("levelField", ["level"])[0],
            level_tag=props.get("levelTag", [None])[0],
            id_field=props.get("idField", [None])[0],
            id_tag=props.get("idTag", [None])[0],
            duration_field=props.get("durationField", [None])[0],
            topic=props.get("topic", [None])[0],
            id_template=tick_tmpl(props.get("id", [None])[0]),
            message_template=tick_tmpl(props.get("message", [None])[0]),
            message_field=props.get("messageField", ["message"])[0],
            details_template=tick_tmpl(props.get("details", [None])[0]),
            **kw,
        )
        # Service-handler chains — shared parse with the streaming
        # compile (_parse_handler_specs). Specs deliver through
        # kapacitor_spark.handlers using the service configs passed as
        # run_tickscript(alert_services={...}).
        specs = _parse_handler_specs(node.props)
        for name, args in node.props:
            if name == "log":
                from kapacitor_spark.sinks import apply_sink, log_handler

                apply_sink(out.df, log_handler(args[0]))
            elif name == "post":
                out = out.http_post(args[0])
            elif name == "tcp":
                from kapacitor_spark.sinks import apply_sink, tcp_handler

                host, _, port = args[0].rpartition(":")
                apply_sink(out.df, tcp_handler(host, int(port)))
            elif name == "exec":
                from kapacitor_spark.sinks import apply_sink, exec_handler

                apply_sink(out.df, exec_handler(list(args)))
        if specs:
            _dispatch_alert_handlers(
                out, specs, self.alert_services or {}, self.time_col,
                level_col=props.get("levelField", ["level"])[0],
            )
        return out

    # -- simple chain methods ------------------------------------------ #

    def _apply_chain(self, p: Pipeline, name, args):
        if name in ("where",):
            return p.where(_lam(p, args[0]))
        if name == "shift":
            return p.shift(_dur(args[0]))
        if name == "sample":
            a = args[0]
            return p.sample(n=int(a)) if isinstance(a, (int, float)) else p.sample(every=_dur(a))
        if name == "union":
            others = [self._materialize(a) if isinstance(a, _Node)
                      else (a._build() if isinstance(a, _PendingAgg) else a) for a in args]
            return p.union(*others)
        if name == "httpOut":
            self.outputs[args[0]] = p.df
            return p
        if name == "log":
            return p
        if name == "trickle":
            return p.trickle()
        if name == "barrier":
            return p  # batch mode: event-time complete; streaming: barrier()
        if name == "stats":
            return p.stats(_dur(args[0]))
        if name == "deadman":
            return p.deadman(args[0], _dur(args[1]))
        if name in self.AGGS:
            return self._apply_agg(p, name, args)
        raise TickError(f"unsupported chain method |{name}()")

    def _apply_agg(self, p: Pipeline, name, args):
        n = _PendingAgg(p, name, args)
        return n


class _PendingAgg:
    """An aggregation chain node that still accepts .as()/.unit()/... props;
    the next pipe (or output) materializes it with defaults applied.
    Mirrors InfluxQLNode chaining (/root/reference/pipeline/influxql.go:
    160-175)."""

    def __init__(self, p, name, args):
        self._src = p
        self._name = name
        self._args = args
        self._props: dict[str, list] = {}
        self._built = None

    def _build(self) -> Pipeline:
        if self._built is not None:
            return self._built
        p, name, args, props = self._src, self._name, self._args, self._props
        as_ = props.get("as", [None])[0]
        unit = _dur(props["unit"][0]) if "unit" in props else "1s"
        if name in ("count", "sum", "mean", "median", "mode", "spread",
                    "stddev", "min", "max", "first", "last"):
            fld = args[0]
            if fld not in p.df.columns:
                # InfluxQL over a field the points don't carry yields NO
                # rows (golden TestStream_InfluxQLNodeMissingValue_Batch:
                # empty result, not an error). dataclasses.replace keeps
                # the pending window spec so the agg stays windowed (a
                # global agg over empty input would emit one null row).
                from dataclasses import replace as _dc_replace

                p = _dc_replace(
                    p,
                    df=p.df.withColumn(fld, F.lit(None).cast("double")).filter(
                        F.lit(False)
                    ),
                )
            if "usePointTimes" in props and name in ("first", "last"):
                # .usePointTimes() (influxql.go PointTimes): the emitted
                # row carries the SELECTED point's time, not the window's
                out = getattr(p, name)(
                    fld, as_=as_ or name, use_point_times=True
                )
            elif "usePointTimes" in props and name in ("min", "max"):
                out = getattr(p, f"{name}_selector")(fld, as_=as_ or name)
            else:
                out = getattr(p, name)(fld, as_=as_ or name)
        elif name == "distinct":
            out = p.distinct(args[0])
        elif name == "percentile":
            out = p.percentile(args[0], float(args[1]), as_=as_ or "percentile")
        elif name in ("top", "bottom"):
            out = getattr(p, name)(int(args[0]), args[1], *args[2:], as_=as_)
        elif name == "derivative":
            out = p.derivative(args[0], unit=unit,
                               non_negative="nonNegative" in props, as_=as_)
        elif name == "difference":
            out = p.difference(args[0], as_=as_)
        elif name == "movingAverage":
            out = p.moving_average(args[0], int(args[1]), as_=as_)
        elif name == "cumulativeSum":
            out = p.cumulative_sum(args[0], as_=as_)
        elif name == "elapsed":
            out = p.elapsed(unit=_dur(args[1]) if len(args) > 1 else unit,
                            as_=as_ or "elapsed")
        elif name == "changeDetect":
            out = p.change_detect(*args)
        elif name == "stateDuration":
            lam = args[0].src if isinstance(args[0], _Lambda) else args[0]
            out = p.state_duration(lam, unit=unit, as_=as_ or "state_duration")
        elif name == "stateCount":
            lam = args[0].src if isinstance(args[0], _Lambda) else args[0]
            out = p.state_count(lam, as_=as_ or "state_count")
        elif name in ("holtWinters", "holtWintersWithFit"):
            out = p.holt_winters(args[0], int(args[1]), int(args[2]),
                                 _dur(args[3]),
                                 include_fit=name.endswith("WithFit"), as_=as_)
        else:  # pragma: no cover
            raise TickError(f"unsupported aggregation {name}")
        self._built = out
        return out

    def prop(self, name, args):
        self._props[name] = args
        self._built = None
        return self


def run_tickscript(
    script: str,
    sources,
    time_col: str = "time",
    dims: tuple[str, ...] = (),
    tiebreak: tuple[str, ...] = (),
    udfs: dict | None = None,
    endpoints: dict | None = None,
    influxdb: str | None = None,
    dbrp: str | None = None,
    alert_services: dict | None = None,
    template_vars: dict | None = None,
    autoscale_clients: dict | None = None,
    flux_client=None,
) -> dict[str, DataFrame]:
    """Execute a TICKscript; returns {httpOut name: DataFrame}.

    ``sources``: DataFrame | Pipeline | dict measurement→DataFrame/Pipeline
    | callable(measurement)→Pipeline.
    ``udfs``: registry for @name() chain methods — name → @udf_node
    function (options become kwargs), the reference's configured-UDF
    scope methods (/root/reference/task_master.go:497-525).
    ``endpoints``: httpPost().endpoint(name) registry — name → url string
    or {"url", "headers", "body_template"} (the reference's
    services/httppost endpoint configs).
    ``influxdb``: base URL for influxDBOut() writes (the reference's
    configured InfluxDB cluster).
    ``dbrp``: the task's subscribed "db.rp" — kapacitorLoopback() into the
    same DBRP raises (the reference's loop-prevention check).
    ``alert_services``: service configs for alert handler chains
    (.slack()/.victorOps()/... — the reference's [slack] etc. config
    sections): {kind: {"url": ..., "token": ..., "workspaces": {...}}}.
    ``template_vars``: template-task var overrides (the reference's
    define-template + vars JSON, /root/reference/template.go): script
    ``var`` statements become defaults; values given here win. Durations
    pass as "10s"-style strings, lambdas as "lambda: ..." strings.
    """
    outputs: dict[str, DataFrame] = {}
    env = _Env(
        sources, time_col, dims, tiebreak, outputs, udfs, endpoints,
        influxdb, dbrp, alert_services, autoscale_clients, flux_client,
    )
    env.preset_vars = _coerce_template_vars(template_vars or {})
    toks, src = _tokenize(script)
    p = _P(toks, src, env)
    # patch property dispatch for pending aggregations
    orig_prop = env.prop

    def prop(node, name, args):
        if isinstance(node, _PendingAgg):
            return node.prop(name, args)
        return orig_prop(node, name, args)

    env.prop = prop
    p.run()
    return outputs


# --------------------------------------------------------------------- #
# Structured-Streaming compile target (r10, widened r11) — the
# continuous-ingestion form of a TICK task. run_tickscript evaluates
# scripts as batch replay over complete event time (every golden works
# that way, mirroring the reference's recording/replay tests); this
# bridge compiles the STREAMING-COMPATIBLE subset of the language
# directly onto readStream DataFrames so the task-store API can enable a
# task against live ingestion:
#   stream|from(measurement, where, groupBy)
#     [ |eval/default/delete        — stateless projections, built
#       through the SAME _Env._mk_* code as batch replay ]
#     [ |derivative/difference/elapsed/cumulativeSum/stateCount/
#       stateDuration               — keyed streaming operators ]
#     [ |window(period, every) |mean/sum/count/min/max ]
#     [ |alert(crit/warn/info [+ stateChangesOnly/noRecoveries/
#       flapping/history/level resets → streaming.alert_stream keyed
#       state machine — the reference's canonical live task shape]) ]
#     |httpOut(name)
# Windows become event-time F.window aggregations, so the plan is
# exactly what Structured Streaming's incremental state store executes.
# Chain methods outside the subset raise TickError with the batch
# alternative spelled out — honesty over silent wrong answers.
# --------------------------------------------------------------------- #


class _SFrom:
    """Streaming from() node: source selection + filters + dims."""

    def __init__(self, env):
        self.env = env
        self.measurement = None
        self.where_src = None
        self.dims: tuple = ()


class _SStream:
    """Materialized streaming node: a streaming DataFrame + its group
    dims (what the reference's point-with-group edge carries)."""

    def __init__(self, df, dims):
        self.df = df
        self.dims = tuple(dims)


class _SPend:
    """Pending streaming chain node accumulating .props until the next
    chain call materializes it — the _Node pattern, streaming side.

    Stateless projections (eval/default/delete) build through the SAME
    _Env._mk_* code paths as the batch replay, applied to a Pipeline
    wrapping the streaming DataFrame — stream == batch by construction.
    Ordered/state-tracking transforms compile onto the keyed streaming
    operators (kapacitor_spark.streaming), whose micro-batch walks are
    pinned equal to the batch forms by their own tests."""

    _ORDERED = {"derivative": "derivative", "difference": "difference",
                "elapsed": "elapsed", "cumulativeSum": "cumulative_sum"}
    # movingAverage rides the count-window ring with the warm-up gate

    def __init__(self, env, name, args, stream: "_SStream"):
        self.env, self.name, self.args, self.stream = env, name, args, stream
        self.props: list[tuple[str, list]] = []

    def _finalize_flatten(self, props) -> "_SAgg":
        """Streaming ``flatten().on(...).tolerance(d)`` — a per-bucket
        pivot is a streaming AGGREGATION (grouped conditional
        min_by(field, arrival-order) per pivot value), so it plans as
        native streaming-agg state, not a keyed operator. A streaming
        plan's schema must be static, so the pivot values CANNOT be
        discovered by a distinct scan the way the batch compile does
        (/root/reference/flatten.go:219-254 widens dynamically per
        buffer) — declare them via
        ``run_tickscript_stream(flatten_values=[...])``. Batch parity:
        same Go-style Time.Round bucketing, same earliest-point-wins
        rule (min_by over (time, tiebreak))."""
        env, st = self.env, self.stream
        values = getattr(env, "flatten_values", None)
        if not values:
            raise TickError(
                "streaming flatten() needs its pivot values declared up "
                "front (a streaming plan's output schema must be static) "
                "— pass flatten_values=[...] to run_tickscript_stream, "
                "or run the batch replay (run_tickscript)"
            )
        on = props.get("on", [])
        on = on[0] if on and isinstance(on[0], list) else list(on)
        delimiter = props.get("delimiter", ["."])[0]
        drop_ofn = "dropOriginalFieldName" in props
        rest = [d for d in st.dims if d not in on]
        field = next(
            c for c in st.df.columns
            if c not in (env.time_col, *st.dims)
        )
        t = F.col(env.time_col)
        if "tolerance" in props:
            us = round(_dur(props["tolerance"][0]) * 1_000_000)
            # Go Time.Round to the nearest multiple (flatten.go:44)
            um = F.unix_micros(t) + F.lit(us // 2)
            t = F.timestamp_micros(um - um % F.lit(us))
        pk = F.concat_ws(delimiter, *[F.col(c) for c in on])
        order = F.struct(
            F.col(env.time_col), *[F.col(c) for c in env.tiebreak]
        )
        aggs = []
        for v in values:
            cond = pk == F.lit(v)
            name = v if drop_ofn else f"{v}{delimiter}{field}"
            aggs.append(
                F.min_by(
                    F.when(cond, F.col(field)), F.when(cond, order)
                ).alias(name)
            )
        out = (
            st.df.groupBy(
                t.alias(env.time_col), *[F.col(d) for d in rest]
            ).agg(*aggs)
        )
        return _SAgg(out, env.time_col, rest)

    def _finalize_combine(self, props) -> "_SAgg":
        """Streaming ``combine(l1, l2, ...)`` — one streaming aggregation
        (the reference's per-bucket buffer as collect_list) + a
        declarative k-combination generator (streaming.combine_stream);
        the batch compile's iterated equi-joins would be chained
        stream-stream self-joins with multiplied state. Wrapped as _SAgg
        (a streaming aggregation is upstream), so stateless alert/httpOut
        chain and keyed operators correctly refuse."""
        from kapacitor_spark import streaming as _strm
        from kapacitor_spark.functions.lambdas import compile_lambda

        env, st = self.env, self.stream
        srcs = [
            a.src if isinstance(a, _Lambda) else a for a in self.args
        ]
        preds = [
            compile_lambda(
                s, ordered_window=None, time_col=env.time_col,
                schema=dict(st.df.dtypes), variables=env.vars,
            )
            for s in srcs
        ]
        as_ = list(props.get("as", ("a", "b")))
        tol = _dur(props["tolerance"][0]) if "tolerance" in props else None
        out = _strm.combine_stream(
            st.df, env.time_col, list(st.dims), preds,
            [str(s) for s in srcs], as_, tolerance=tol,
            delimiter=props.get("delimiter", ["_"])[0],
        )
        return _SAgg(out, env.time_col, st.dims)

    def prop(self, name, args):
        self.props.append((name, args))
        return self

    def prop_map(self):
        return dict(self.props)

    def finalize(self) -> "_SStream":
        env, st = self.env, self.stream
        if self.name in ("eval", "default", "delete", "sideload"):
            # sideload is a stream-static broadcast join: the lookup
            # levels load once at compile (like the reference's cached
            # source), the join composes with readStream unchanged
            p = Pipeline.from_df(st.df, time_col=env.time_col, dims=st.dims)
            built = getattr(_Env, f"_mk_{self.name}")(None, p, self)
            return _SStream(built.df, built.dims)
        from kapacitor_spark import streaming as _strm

        props = self.prop_map()
        if self.name == "flatten":
            return self._finalize_flatten(props)
        if self.name == "combine":
            return self._finalize_combine(props)
        if self.name == "barrier":
            # barrier().idle(d)/.period(d) → event-time watermark — the
            # reference's late-drop + state-retention bound
            # (/root/reference/pipeline/barrier.go:13-56); in batch
            # replay barrier is a no-op (event time is complete)
            delay = props.get("idle", props.get("period"))
            if delay is None:
                raise TickError("streaming barrier() needs .idle(d) or "
                                ".period(d)")
            return _SStream(
                _strm.barrier(st.df, env.time_col, _dur(delay[0])), st.dims
            )
        as_ = props.get("as", [None])[0]
        unit = _dur(props["unit"][0]) if "unit" in props else "1s"
        if self.name == "movingAverage":
            out = _strm.window_count_stream(
                st.df, env.time_col, list(st.dims), self.args[0],
                int(self.args[1]), 1, agg="mean",
                as_=as_ or self.args[0], tiebreak=env.tiebreak,
                full_only=True,
            )
            return _SStream(out, st.dims)
        if self.name in self._ORDERED:
            if self.name == "elapsed" and len(self.args) > 1:
                unit = _dur(self.args[1])
            out = _strm.ordered_transform_stream(
                st.df, env.time_col, list(st.dims), self.args[0],
                op=self._ORDERED[self.name], unit=unit, as_=as_,
                non_negative="nonNegative" in props, tiebreak=env.tiebreak,
            )
            return _SStream(out, st.dims)
        # stateCount / stateDuration (lambda predicate)
        from kapacitor_spark.functions.lambdas import compile_lambda

        a = self.args[0]
        cond = compile_lambda(
            a.src if isinstance(a, _Lambda) else a, ordered_window=None,
            time_col=env.time_col, schema=dict(st.df.dtypes),
            variables=a.vars if isinstance(a, _Lambda) else env.vars,
        )
        if self.name == "stateCount":
            out = _strm.state_count_stream(
                st.df, env.time_col, list(st.dims), cond=cond,
                as_=as_ or "state_count", tiebreak=env.tiebreak,
            )
        else:
            out = _strm.state_duration_stream(
                st.df, env.time_col, list(st.dims), cond=cond, unit=unit,
                as_=as_ or "state_duration", tiebreak=env.tiebreak,
            )
        return _SStream(out, st.dims)


class _SJoin:
    """Pending streaming join() node — materializes onto
    streaming.join_stream (stream-stream tolerance join with watermark
    state eviction). Subset: .as(prefixes) / .tolerance(d) (REQUIRED —
    the join keys on the tolerance bucket) / .delimiter() /
    .streamName() / .on(dims...) (dim-subset one-to-many join, r11 2nd
    wave) / .fill('null'|scalar) (FULL OUTER stream-stream join on the
    window key; unmatched rows emit once both watermarks pass the bucket
    — tune run_tickscript_stream(join_watermark=...)) / .deleteAll()
    (recorded no-op: state cleanup is native watermark eviction).
    Documented divergence (join_stream docstring): >1 row per
    (bucket, dims) cell per side emits the cell cross product, where the
    batch join pairs sequentially."""

    def __init__(self, env, left: "_SStream", right: "_SStream"):
        self.env, self.left, self.right = env, left, right
        self.props: list[tuple[str, list]] = []

    def prop(self, name, args):
        self.props.append((name, args))
        return self

    def prop_map(self):
        return dict(self.props)

    def finalize(self) -> "_SStream":
        from kapacitor_spark import streaming as _strm

        props = self.prop_map()
        # deleteAll: batch mode records it a no-op (no delete messages);
        # streaming state cleanup is native via watermark eviction —
        # same recorded no-op here (pipeline/join.go .deleteAll())
        if "tolerance" not in props:
            raise TickError(
                "streaming join() needs .tolerance(d) — the stream-stream "
                "join keys on the tolerance bucket; exact equal-timestamp "
                "pairing runs in the batch replay (run_tickscript)"
            )
        prefixes = tuple(props.get("as", ("a", "b")))
        delim = props.get("delimiter", ["."])[0]
        on = None
        if "on" in props:
            on = props["on"]
            on = list(on[0]) if on and isinstance(on[0], list) else list(on)
        fill = props["fill"][0] if "fill" in props else None
        ld, rd = list(self.left.dims), list(self.right.dims)
        tcol = self.env.time_col
        out = _strm.join_stream(
            self.left.df, self.right.df, tcol,
            [d for d in ld if d in rd],
            tolerance=_dur(props["tolerance"][0]),
            watermark=getattr(self.env, "join_watermark", "1h"),
            prefixes=prefixes, delimiter=delim,
            on=on, fill=fill, left_dims=ld, right_dims=rd,
        )
        # batch parity: the joined row's time IS the bucket; per-side
        # original times do not survive (pipeline.py join drops them)
        out = out.drop(
            f"{prefixes[0]}{delim}{tcol}", f"{prefixes[1]}{delim}{tcol}"
        )
        if "streamName" in props:
            out = out.withColumn("name", F.lit(props["streamName"][0]))
        dims = on if on is not None else [d for d in ld if d in rd]
        out_dims = tuple(dict.fromkeys([*dims, *ld, *rd]))
        return _SStream(out, out_dims)


class _SAutoscale:
    """Pending streaming k8s/swarm/ec2Autoscale node — materializes onto
    streaming.autoscale_stream (per-resource keyed decision machine:
    current replicas + cooldown clocks in state). For a STATIC resource
    name the current replica count prefetches from the injected client
    at compile (the reference's lazy Replicas(id) call, made eagerly —
    executors cannot hold clients); tag-addressed resources seed from
    their first clamped desired value without emitting (the documented
    divergence in autoscale_stream). The output is the DECISION stream —
    wire a sink to make the orchestrator calls."""

    def __init__(self, env, stream: "_SStream", name: str):
        self.env, self.stream, self.name = env, stream, name
        self.props: list[tuple[str, list]] = []

    def prop(self, name, args):
        self.props.append((name, args))
        return self

    def prop_map(self):
        return dict(self.props)

    def finalize(self) -> "_SStream":
        from kapacitor_spark import streaming as _strm
        from kapacitor_spark.functions.lambdas import compile_lambda

        env, st = self.env, self.stream
        kind, mk = _AUTOSCALE_KINDS[self.name]
        props = self.prop_map()
        cluster = props.get("cluster", [""])[0]
        clients = env.autoscale_clients
        client = clients.get((kind, cluster)) or clients.get(kind)
        if client is None:
            raise TickError(
                f"{self.name}(): no {kind} client — pass "
                f"run_tickscript_stream(autoscale_clients={{{kind!r}: client}})"
            )
        scaler = mk(client, props)
        if "replicas" not in props:
            raise TickError(f"{self.name}() needs .replicas(lambda: ...)")
        if "currentField" in props:
            raise TickError(
                f"{self.name}().currentField(): state-dependent replicas "
                "lambdas need the Python API (autoscale_stream + a custom "
                "want column)"
            )
        r = props["replicas"][0]
        want = compile_lambda(
            r.src if isinstance(r, _Lambda) else r, ordered_window=None,
            time_col=env.time_col, schema=dict(st.df.dtypes),
            variables=r.vars if isinstance(r, _Lambda) else env.vars,
        )
        initial = None
        if scaler._name is not None:
            initial = {scaler._name: int(scaler.replicas(scaler._name))}
        out = _strm.autoscale_stream(
            st.df, env.time_col, scaler, want,
            min=int(props.get("min", [1])[0]),
            max=int(props.get("max", [0])[0]),
            increase_cooldown=_dur(props.get("increaseCooldown", [0.0])[0]),
            decrease_cooldown=_dur(props.get("decreaseCooldown", [0.0])[0]),
            initial=initial, tiebreak=env.tiebreak,
        )
        return _SStream(out, ("resource",))


class _SWindow:
    """window() node: period/every durations (time windows) or
    periodCount/everyCount (count windows) pending the aggregation."""

    def __init__(self, parent: "_SStream"):
        self.parent = parent
        self.period = None
        self.every = None
        self.period_count = None
        self.every_count = None
        self.fill_period = False


class _SAgg:
    """Aggregated streaming node; .as() renames the output column.

    ``prov`` (window-aggregation provenance — raw upstream stream +
    window/agg parameters) enables the FUSED re-compile when a stateful
    alert follows: Spark forbids a keyed-state operator after a streaming
    aggregation, so alert().stateChangesOnly() on a windowed stream
    re-plans window+agg+alert as ONE keyed operator
    (streaming.window_alert_stream for time windows,
    window_count_alert_stream for count windows). Nodes without
    provenance (stats/deadman tickers, flatten/combine) keep raising
    toward batch."""

    def __init__(self, df, time_col, dims=(), prov=None):
        self.df = df
        self.time_col = time_col
        self.dims = tuple(dims)
        self.prov = prov


class _SAlert:
    """Streaming alert. With only crit/warn/info lambdas: a stateless
    level CASE on the (windowed) rows — a live levels dashboard. Any
    stateful knob (.stateChangesOnly([maxInterval]) / .noRecoveries() /
    .flapping(low,high) / .history(n) / level resets) switches to the
    keyed alert state machine (streaming.alert_stream ←
    streaming/state.py — the SAME walk the batch replay runs, so stream
    == batch on identical input; the reference's canonical live task,
    TestStream_AlertStateChangesOnly in
    /root/reference/integrations/streamer_test.go)."""

    def __init__(self, parent, env):
        if isinstance(parent, _SAgg):
            self.df, self.dims, self.windowed = parent.df, parent.dims, True
            self.agg_prov = parent.prov
        else:
            self.agg_prov = None
            st = env._stream_of(parent)
            self.df, self.dims, self.windowed = st.df, st.dims, False
        self.env = env
        self.levels: dict[str, str] = {}
        self.resets: dict[str, str] = {}
        self.flags: dict[str, list] = {}
        self.hprops: list[tuple[str, list]] = []
        self.tmpl: dict[str, str] = {}

    def _comp(self, src):
        from kapacitor_spark.functions.lambdas import compile_lambda

        return compile_lambda(
            src, ordered_window=None, time_col=self.env.time_col,
            schema=dict(self.df.dtypes), variables=self.env.vars,
        )

    _SINK_PROPS = ("log", "post", "tcp", "exec")

    def _apply_templates(self, df):
        """Alert templating on the LIVE path (r11 2nd wave):
        .id()/.message()/.details()/.idField()/.idTag() are pure column
        expressions (Pipeline._template — one codegen'd concat), applied
        to the emitted alert rows exactly as the batch compile applies
        them after level determination. .durationField() is consumed in
        finalize() — it's a stateful knob (episode tracking in the keyed
        machine), not a template."""
        t = self.tmpl
        if not t:
            return df

        def lit(v):
            # TICK template strings without {{ }} are LITERALS (same
            # quoting rule as the batch compile's tick_tmpl)
            if v is None or "{{" in v:
                return v
            return "'" + v.replace("\\", "\\\\").replace("'", "\\'") + "'"

        def pl(cur_df):
            return Pipeline.from_df(
                cur_df, time_col=self.env.time_col, dims=tuple(self.dims)
            )

        idt = lit(t.get("id"))
        if t.get("idField") or t.get("idTag"):
            idc = pl(df)._template(idt or "{{ .Name }}:{{ .Group }}", "level")
            for c in (t.get("idField"), t.get("idTag")):
                if c:
                    df = df.withColumn(c, idc)
        if idt:
            df = df.withColumn("alert_id", pl(df)._template(idt, "level"))
        mf = t.get("messageField", "message")
        mt = lit(t.get("message"))
        if mt:
            df = df.withColumn(mf, pl(df)._template(mt, "level"))
        dt_ = lit(t.get("details"))
        if dt_:
            df = df.withColumn(
                t.get("detailsField", "details"),
                pl(df)._template(
                    dt_, "level", message_col=mf if mt else None
                ),
            )
        # .levelTag (duplicate column) / .topic (routing lit) /
        # .levelField (renames the level output — LAST, templates above
        # read "level"), matching the batch compile's augment order
        if t.get("levelTag"):
            df = df.withColumn(t["levelTag"], F.col("level"))
        if t.get("topic") is not None:
            df = df.withColumn("topic", F.lit(t["topic"]))
        lf = t.get("levelField")
        if lf and lf != "level":
            df = df.withColumnRenamed("level", lf)
        return df

    def _attach_handlers(self, out):
        """Service-handler chains + sink props on the LIVE alert path
        (r11 2nd wave). Parsed with the SAME _parse_handler_specs as the
        batch compile and rendered through the SAME
        kapacitor_spark.handlers formatters — per micro-batch, as a
        foreachBatch function attached to the output DataFrame
        (``df._ks_alert_handler_fn``; run_tickscript_stream surfaces it
        as ``outputs.alert_handlers[name]``). Delivery is at-least-once
        under micro-batch retries — the reference's own handler
        semantics (alert.go handlers re-fire on replayed events).
        Unconfigured service kinds raise AT COMPILE, not mid-stream."""
        out = self._apply_templates(out)
        if not self.hprops:
            return out
        cur = None
        for n, _a in self.hprops:
            if n in _ALERT_HANDLER_KINDS:
                cur = n
            elif n in _ALERT_LEVEL_PROPS:
                cur = None  # spec-closing alert-own prop (templates/sinks)
            elif cur is None:
                raise TickError(
                    f"streaming alert() does not support .{n}() — "
                    "run the batch replay (run_tickscript)"
                )
        specs = _parse_handler_specs(self.hprops)
        sinks = [(n, a) for n, a in self.hprops if n in self._SINK_PROPS]
        if not specs and not sinks:
            return out  # templates only
        services = getattr(self.env, "alert_services", None) or {}
        for kind, _opts in specs:
            if not dict(services.get(kind) or {}):
                raise TickError(
                    f"alert handler .{kind}() used but no config passed "
                    f"via run_tickscript_stream(alert_services="
                    f"{{{kind!r}: {{...}}}})"
                )
        tcol = self.env.time_col
        dims = [d for d in self.dims if d != "name"]

        lvcol = self.tmpl.get("levelField") or "level"

        def handler_fn(batch_df, _batch_id):
            if batch_df.isEmpty():
                return
            if specs:
                _dispatch_alert_handlers_df(
                    batch_df, dims, specs, services, tcol, level_col=lvcol
                )
            for n, a in sinks:
                if n == "log":
                    from kapacitor_spark.sinks import apply_sink, log_handler

                    apply_sink(batch_df, log_handler(a[0]))
                elif n == "post":
                    Pipeline.from_df(
                        batch_df, time_col=tcol, dims=tuple(dims)
                    ).http_post(a[0])
                elif n == "tcp":
                    from kapacitor_spark.sinks import apply_sink, tcp_handler

                    host, _, port = a[0].rpartition(":")
                    apply_sink(batch_df, tcp_handler(host, int(port)))
                elif n == "exec":
                    from kapacitor_spark.sinks import apply_sink, exec_handler

                    apply_sink(batch_df, exec_handler(list(a)))

        out._ks_alert_handler_fn = handler_fn
        return out

    def finalize(self):
        # .durationField() is a STATEFUL knob (episode start persists in
        # keyed state) — it routes an otherwise-stateless alert onto the
        # keyed machine with the batch replay's exact emission flags
        if not self.resets and not self.flags and \
                "durationField" not in self.tmpl:
            col = None
            for name, label in (
                ("crit", "CRITICAL"), ("warn", "WARNING"), ("info", "INFO")
            ):
                if name not in self.levels:
                    continue
                cond = self._comp(self.levels[name])
                col = F.when(cond, label) if col is None else col.when(cond, label)
            level = col.otherwise("OK") if col is not None else F.lit("OK")
            return self._attach_handlers(self.df.withColumn("level", level))
        if self.windowed:
            return self._finalize_fused()
        from kapacitor_spark import streaming as _strm

        sco = self.flags.get("stateChangesOnly")
        lv = {k: self._comp(v) for k, v in self.levels.items()}
        rs = {k: self._comp(v) for k, v in self.resets.items()}
        return self._attach_handlers(_strm.alert_stream(
            self.df, self.env.time_col, list(self.dims),
            crit=lv.get("crit"), warn=lv.get("warn"), info=lv.get("info"),
            crit_reset=rs.get("crit"), warn_reset=rs.get("warn"),
            info_reset=rs.get("info"),
            state_changes_only=sco is not None,
            # the reference's stream trigger rule when stateChangesOnly is
            # off (alert.go:1115-1159) — matches the batch replay's flag
            events_only=sco is None,
            max_interval=_dur(sco[0]) if sco else None,
            no_recoveries="noRecoveries" in self.flags,
            flapping=(
                tuple(float(x) for x in self.flags["flapping"])
                if "flapping" in self.flags else None
            ),
            history=int(self.flags.get("history", [21])[0]),
            tiebreak=self.env.tiebreak,
            duration_field=self.tmpl.get("durationField"),
        ))

    def _finalize_fused(self):
        """Stateful alert AFTER a windowed aggregation: re-plan window+
        agg+alert as ONE keyed state operator (streaming.
        window_alert_stream) from the _SAgg provenance. Spark forbids a
        second stateful operator after a streaming aggregation — the
        fused operator is instead the reference's own execution shape
        (per-group window buffer feeding the in-process alert machine,
        /root/reference/window.go:149-260 + alert.go:989-1290; canonical
        task: integrations/streamer_test.go TestStream_Alert)."""
        prov = self.agg_prov
        if prov is None:
            raise TickError(
                "streaming alert: stateful knobs after stats / deadman / "
                "flatten / combine would chain two stateful streaming "
                "operators — alert on the raw stream, or run the batch "
                "replay (run_tickscript)"
            )
        # ungrouped windows (empty dims) run as ONE synthetic group —
        # serial at the fused stage, like the reference's ungrouped
        # stream task (r11 3rd wave; the operators handle dims=())
        from kapacitor_spark import streaming as _strm
        from kapacitor_spark.functions.lambdas import compile_lambda_pandas

        def comp(src):
            return compile_lambda_pandas(
                src, time_col=self.env.time_col, variables=self.env.vars
            )

        sco = self.flags.get("stateChangesOnly")
        lv = {k: comp(v) for k, v in self.levels.items()}
        rs = {k: comp(v) for k, v in self.resets.items()}
        if prov.get("kind") == "count":
            # count-window sibling (r11 3rd wave): the keyed ring +
            # alert machine fuse the same way
            return self._attach_handlers(_strm.window_count_alert_stream(
                prov["src_df"], self.env.time_col, list(prov["dims"]),
                prov["field"], prov["period_count"], prov["every_count"],
                agg=prov["agg"], as_=prov["out_col"],
                crit=lv.get("crit"), warn=lv.get("warn"),
                info=lv.get("info"),
                crit_reset=rs.get("crit"), warn_reset=rs.get("warn"),
                info_reset=rs.get("info"),
                state_changes_only=sco is not None,
                events_only=sco is None,
                max_interval=_dur(sco[0]) if sco else None,
                no_recoveries="noRecoveries" in self.flags,
                flapping=(
                    tuple(float(x) for x in self.flags["flapping"])
                    if "flapping" in self.flags else None
                ),
                history=int(self.flags.get("history", [21])[0]),
                tiebreak=self.env.tiebreak,
                duration_field=self.tmpl.get("durationField"),
                full_only=prov["full_only"],
            ))
        return self._attach_handlers(_strm.window_alert_stream(
            prov["src_df"], self.env.time_col, list(prov["dims"]),
            period=prov["period"], every=prov["every"],
            field=prov["field"], agg=prov["agg"], out_col=prov["out_col"],
            crit=lv.get("crit"), warn=lv.get("warn"), info=lv.get("info"),
            crit_reset=rs.get("crit"), warn_reset=rs.get("warn"),
            info_reset=rs.get("info"),
            state_changes_only=sco is not None,
            events_only=sco is None,
            max_interval=_dur(sco[0]) if sco else None,
            no_recoveries="noRecoveries" in self.flags,
            flapping=(
                tuple(float(x) for x in self.flags["flapping"])
                if "flapping" in self.flags else None
            ),
            history=int(self.flags.get("history", [21])[0]),
            tiebreak=self.env.tiebreak,
            duration_field=self.tmpl.get("durationField"),
        ))


class _StreamEnv:
    """Parser env for the streaming subset (same surface as _Env /
    _GraphEnv: chain / prop / _materialize / vars)."""

    # streaming-compatible InfluxQL aggregations: every value is a
    # callable Column->Column so composite shapes (spread) and exact
    # sort-based aggregates (median — an ObjectHashAggregate, supported
    # in streaming aggregation state) express directly
    AGGS = {
        "mean": F.avg, "sum": F.sum, "count": F.count,
        "min": F.min, "max": F.max,
        "stddev": F.stddev_samp,
        "median": F.median,
        "spread": lambda c: F.max(c) - F.min(c),
    }
    # event-time selectors (first/last = value at the window's earliest/
    # latest point) dispatch below — they need the time column

    def __init__(self, sources, time_col, dims, outputs, tiebreak=(),
                 autoscale_clients=None, flatten_values=None,
                 join_watermark="1h", alert_services=None):
        self.sources = sources
        self.time_col = time_col
        self.default_dims = tuple(dims)
        self.outputs = outputs
        self.tiebreak = tuple(tiebreak)
        self.autoscale_clients = autoscale_clients or {}
        self.flatten_values = list(flatten_values) if flatten_values else None
        self.join_watermark = join_watermark
        self.alert_services = alert_services or {}
        self.vars: dict = {}

    # ------------------------------------------------------------- #
    def _resolve_df(self, frm: _SFrom):
        src = self.sources
        if isinstance(src, dict):
            if frm.measurement is None:
                if len(src) != 1:
                    raise TickError("stream|from() needs .measurement() "
                                    "with multiple sources")
                df = next(iter(src.values()))
            else:
                try:
                    df = src[frm.measurement]
                except KeyError:
                    raise TickError(f"no stream source for measurement "
                                    f"{frm.measurement!r}")
        elif callable(getattr(src, "__call__", None)) and not hasattr(src, "schema"):
            df = src(frm.measurement)
        else:
            df = src
        if frm.where_src is not None:
            from kapacitor_spark.functions.lambdas import compile_lambda

            df = df.filter(
                compile_lambda(
                    frm.where_src, ordered_window=None,
                    time_col=self.time_col, schema=dict(df.dtypes),
                    variables=self.vars,
                )
            )
        return df

    @staticmethod
    def _interval(d) -> str:
        secs = _dur(d)
        if not isinstance(secs, (int, float)):
            raise TickError(f"expected duration, got {d!r}")
        us = round(float(secs) * 1_000_000)
        return f"{us} microseconds"

    # ------------------------------------------------------------- #
    _PEND_NAMES = (
        "eval", "default", "delete", "barrier", "sideload", "flatten",
        "combine",
        "derivative", "difference", "elapsed", "cumulativeSum",
        "stateCount", "stateDuration", "movingAverage",
    )

    def _stream_of(self, node) -> "_SStream":
        if isinstance(node, _SStream):
            return node
        if isinstance(node, (_SPend, _SJoin, _SAutoscale)):
            return node.finalize()
        if isinstance(node, _SFrom):
            return _SStream(
                self._resolve_df(node), node.dims or self.default_dims
            )
        raise TickError("streaming compile: node has no stream upstream")

    def chain(self, node, name, args):
        if isinstance(node, (_SPend, _SJoin, _SAutoscale)):
            node = node.finalize()
        if name == "from":
            if not isinstance(node, _Source) or node.kind != "stream":
                raise TickError("streaming compile: |from() must chain "
                                "off `stream`")
            return _SFrom(self)
        if name == "window":
            if not isinstance(node, (_SFrom, _SStream)):
                raise TickError("streaming compile: |window() must follow "
                                "stream|from() or a point transform")
            return _SWindow(self._stream_of(node))
        if name == "where":
            if isinstance(node, _SFrom):
                node.where_src = (
                    args[0].src if isinstance(args[0], _Lambda) else args[0]
                )
                return node
            if isinstance(node, _SStream):
                from kapacitor_spark.functions.lambdas import compile_lambda

                cond = compile_lambda(
                    args[0].src if isinstance(args[0], _Lambda) else args[0],
                    ordered_window=None, time_col=self.time_col,
                    schema=dict(node.df.dtypes), variables=self.vars,
                )
                return _SStream(node.df.filter(cond), node.dims)
        if name == "groupBy" and isinstance(node, _SFrom):
            node.dims = tuple(args)
            return node
        if name in self._PEND_NAMES and isinstance(node, (_SFrom, _SStream)):
            return _SPend(self, name, args, self._stream_of(node))
        if name == "sample" and isinstance(node, (_SFrom, _SStream)):
            a = args[0]
            st = self._stream_of(node)
            if isinstance(a, (int, float)) and not isinstance(a, _Duration):
                # every-Nth-point: the per-group counter is keyed state
                # (/root/reference/sample.go:97-110) — r11 2nd wave
                from kapacitor_spark import streaming as _strm

                out = _strm.sample_count_stream(
                    st.df, self.time_col, list(st.dims), int(a),
                    tiebreak=self.tiebreak,
                )
                return _SStream(out, st.dims)
            p = Pipeline.from_df(st.df, time_col=self.time_col, dims=st.dims)
            return _SStream(p.sample(every=_dur(a)).df, st.dims)
        if name == "shift" and isinstance(node, (_SFrom, _SStream)):
            from kapacitor_spark.durations import to_interval

            st = self._stream_of(node)
            shifted = st.df.withColumn(
                self.time_col,
                F.col(self.time_col)
                + F.expr(f"INTERVAL {to_interval(_dur(args[0]))}"),
            )
            return _SStream(shifted, st.dims)
        if name == "join" and isinstance(node, (_SFrom, _SStream)):
            if len(args) != 1 or not isinstance(args[0], (_SFrom, _SStream, _SPend)):
                raise TickError("streaming join() takes exactly one "
                                "stream node (chain N-way joins pairwise)")
            return _SJoin(
                self, self._stream_of(node), self._stream_of(args[0])
            )
        if name == "changeDetect" and isinstance(node, (_SFrom, _SStream)):
            from kapacitor_spark import streaming as _strm

            st = self._stream_of(node)
            out = _strm.change_detect_stream(
                st.df, self.time_col, list(st.dims), list(args),
                tiebreak=self.tiebreak,
            )
            return _SStream(out, st.dims)
        if name in ("stats", "deadman") and isinstance(node, (_SFrom, _SStream)):
            # wall-clock stats()/deadman() (/root/reference/stats.go:
            # "Stats are REAL-TIME not data-time") — the ProcessingTime-
            # Timeout tickers; a fully-silent group still fires CRITICAL.
            # Non-replayable by construction: availableNow replays should
            # use the batch compile (Pipeline.stats/deadman).
            from kapacitor_spark import streaming as _strm

            st = self._stream_of(node)
            if name == "stats":
                out = _strm.stats_stream(
                    st.df, self.time_col, list(st.dims), interval=_dur(args[0])
                )
            else:
                out = _strm.deadman_stream(
                    st.df, self.time_col, list(st.dims),
                    interval=_dur(args[1]), threshold=float(args[0]),
                )
            return _SAgg(out, self.time_col, st.dims)
        if name in _AUTOSCALE_KINDS:
            if isinstance(node, _SAgg):
                raise TickError(
                    f"streaming {name}() after a windowed aggregation "
                    "would chain two stateful streaming operators — "
                    "autoscale on the raw stream (the replicas lambda "
                    "reads point fields) or run the batch replay"
                )
            if not isinstance(node, (_SFrom, _SStream)):
                raise TickError(f"streaming {name}() must follow the stream")
            return _SAutoscale(self, self._stream_of(node), name)
        if name == "union" and isinstance(node, (_SFrom, _SStream)):
            # union emits in global time order in the reference
            # (union.go:104-166) — declarative here: event-time semantics
            # order everything downstream, exactly like the batch compile
            st = self._stream_of(node)
            out = st.df
            for a in args:
                if not isinstance(a, (_SFrom, _SStream, _SPend)):
                    raise TickError("streaming union() takes stream nodes")
                out = out.unionByName(self._stream_of(a).df)
            return _SStream(out, st.dims)
        if name == "log" and isinstance(node, (_SFrom, _SStream, _SAgg, _SAlert)):
            return node  # parity with the batch compile: log() passes through
        if name in self.AGGS or name in ("first", "last"):
            if not isinstance(node, _SWindow):
                raise TickError(f"streaming compile: |{name}() must follow "
                                "|window() (un-windowed streaming "
                                "aggregation has no emission point)")
            st = node.parent
            if node.period_count is not None:
                # count-based window -> the keyed ring-buffer operator
                # (/root/reference/window.go:360-470)
                if name not in ("mean", "sum", "count", "min", "max"):
                    raise TickError(
                        f"streaming count windows support mean/sum/count/"
                        f"min/max, not |{name}()"
                    )
                from kapacitor_spark import streaming as _strm

                out = _strm.window_count_stream(
                    st.df, self.time_col, list(st.dims), args[0],
                    int(node.period_count), int(node.every_count or 1),
                    agg=name, as_=f"__{name}", tiebreak=self.tiebreak,
                    full_only=node.fill_period,
                )
                return _SAgg(
                    out, self.time_col, st.dims,
                    prov={
                        "kind": "count", "src_df": st.df, "dims": st.dims,
                        "period_count": int(node.period_count),
                        "every_count": int(node.every_count or 1),
                        "agg": name, "field": args[0],
                        "out_col": f"__{name}",
                        "full_only": node.fill_period,
                    },
                )
            if node.fill_period:
                raise TickError(
                    "streaming window().fillPeriod() is supported for "
                    "count windows only — time-window fillPeriod runs in "
                    "the batch replay"
                )
            period = node.period if node.period is not None else node.every
            every = node.every if node.every is not None else node.period
            if period is None:
                raise TickError("streaming compile: window() needs "
                                ".period()/.every() or .periodCount()")
            win = F.window(
                F.col(self.time_col),
                self._interval(period), self._interval(every),
            )
            field = args[0]
            if name == "first":
                fn = lambda c: F.min_by(c, F.col(self.time_col))  # noqa: E731
            elif name == "last":
                fn = lambda c: F.max_by(c, F.col(self.time_col))  # noqa: E731
            else:
                fn = self.AGGS[name]
            out = (
                st.df.groupBy(win, *[F.col(d) for d in st.dims])
                .agg(fn(F.col(field)).alias(f"__{name}"))
                .select(
                    F.col("window.start").alias(self.time_col),
                    *[F.col(d) for d in st.dims],
                    F.col(f"__{name}"),
                )
            )
            return _SAgg(
                out, self.time_col, st.dims,
                prov={
                    "src_df": st.df, "dims": st.dims,
                    "period": _dur(period), "every": _dur(every),
                    "agg": name, "field": field, "out_col": f"__{name}",
                },
            )
        if name == "alert":
            if not isinstance(node, (_SAgg, _SFrom, _SStream)):
                raise TickError("streaming compile: |alert() must follow "
                                "an aggregation, a transform, or "
                                "stream|from()")
            return _SAlert(node, self)
        if name == "httpOut":
            if isinstance(node, _SAlert):
                self.outputs[args[0]] = node.finalize()
                return node
            if isinstance(node, _SAgg):
                self.outputs[args[0]] = node.df
                return node
            if isinstance(node, (_SFrom, _SStream)):
                self.outputs[args[0]] = self._stream_of(node).df
                return node
            raise TickError("streaming compile: |httpOut() needs a "
                            "materialized node")
        raise TickError(
            f"|{name}() is not in the streaming compile subset (from/"
            "where/groupBy/eval/default/delete/shift/sample/sideload/"
            "flatten/barrier/union/join/log/derivative/difference/elapsed/"
            "cumulativeSum/stateCount/stateDuration/changeDetect/"
            "movingAverage/stats/deadman/autoscale/window/"
            "mean/sum/count/min/max/alert/httpOut) "
            "— run it as a batch replay task (run_tickscript) or wire "
            "the stateful operator from kapacitor_spark.streaming "
            "directly"
        )

    def prop(self, node, name, args):
        if isinstance(node, (_SPend, _SJoin, _SAutoscale)):
            return node.prop(name, args)
        if isinstance(node, _SFrom):
            if name == "measurement":
                node.measurement = args[0]
                return node
            if name == "where":
                node.where_src = (
                    args[0].src if isinstance(args[0], _Lambda) else args[0]
                )
                return node
            if name == "groupBy":
                node.dims = tuple(args)
                return node
            raise TickError(f"streaming from() does not support .{name}()")
        if isinstance(node, _SStream):
            if name == "rename":
                # union().rename(m) — the output measurement name
                return _SStream(
                    node.df.withColumn("name", F.lit(args[0])), node.dims
                )
            raise TickError(f"streaming node does not support .{name}()")
        if isinstance(node, _SWindow):
            if name == "period":
                node.period = args[0]
                return node
            if name == "every":
                node.every = args[0]
                return node
            if name == "periodCount":
                node.period_count = int(args[0])
                return node
            if name == "everyCount":
                node.every_count = int(args[0])
                return node
            if name == "fillPeriod":
                node.fill_period = True
                return node
            raise TickError(f"streaming window() does not support .{name}()")
        if isinstance(node, _SAgg):
            if name == "as":
                cols = node.df.columns
                node.df = node.df.withColumnRenamed(cols[-1], args[0])
                if node.prov is not None:
                    node.prov["out_col"] = args[0]
                return node
            raise TickError(f"streaming aggregation does not support .{name}()")
        if isinstance(node, _SAlert):
            if name in ("crit", "warn", "info"):
                node.levels[name] = (
                    args[0].src if isinstance(args[0], _Lambda) else args[0]
                )
                return node
            if name in ("critReset", "warnReset", "infoReset"):
                node.resets[name[:-5]] = (
                    args[0].src if isinstance(args[0], _Lambda) else args[0]
                )
                return node
            if name in ("stateChangesOnly", "noRecoveries", "flapping",
                        "history"):
                node.flags[name] = list(args)
                return node
            if name in ("id", "message", "details", "idField", "idTag",
                        "messageField", "detailsField", "durationField",
                        "levelField", "levelTag", "topic"):
                # templating (r11 2nd wave): pure column expressions via
                # Pipeline._template, applied to the emitted alert rows.
                # ALSO recorded in hprops so the shared spec parser
                # closes any open handler spec exactly like batch.
                node.tmpl[name] = args[0]
                node.hprops.append((name, []))
                return node
            # handler chains (.slack()/.post()/... — r11 2nd wave):
            # collected in order, validated + parsed at finalize with
            # the SAME _parse_handler_specs as the batch compile
            node.hprops.append((name, list(args)))
            return node
        raise TickError(f"unsupported property .{name}() in streaming compile")

    def _materialize(self, node):
        return node


def run_tickscript_stream(
    script: str,
    sources,
    time_col: str = "time",
    dims: tuple = (),
    template_vars: dict | None = None,
    tiebreak: tuple = (),
    autoscale_clients: dict | None = None,
    flatten_values: list | None = None,
    join_watermark: str | float = "1h",
    alert_services: dict | None = None,
) -> dict[str, DataFrame]:
    """Compile a TICKscript onto Structured Streaming sources; returns
    {httpOut name: STREAMING DataFrame} ready for writeStream (drive a
    deterministic replay with kapacitor_spark.streaming.run_available_now,
    or attach a real sink for continuous execution).

    ``sources``: streaming DataFrame | dict measurement→streaming DF |
    callable(measurement)→streaming DF. Supports the streaming-compatible
    language subset — see the module comment above _StreamEnv: from/
    where/groupBy, eval/default/delete/shift, barrier (→ watermark:
    late-drop + state retention bound), derivative/difference/elapsed/
    cumulativeSum/stateCount/stateDuration, window + mean/sum/count/min/
    max, alert incl. stateChangesOnly([maxInterval])/noRecoveries/
    flapping/history and level resets (keyed state machine), httpOut."""
    outputs: dict[str, DataFrame] = {}
    env = _StreamEnv(sources, time_col, dims, outputs, tiebreak,
                     autoscale_clients, flatten_values, join_watermark,
                     alert_services)
    env.preset_vars = _coerce_template_vars(template_vars or {})
    toks, src = _tokenize(script)
    _P(toks, src, env).run()
    if not outputs:
        raise TickError("streaming compile: script has no httpOut()")

    class _StreamOutputs(dict):
        """dict of {httpOut name: streaming DataFrame}, plus
        ``alert_handlers``: {name: foreachBatch fn} for outputs whose
        alert node carried handler chains/sinks — start delivery with
        ``df.writeStream.foreachBatch(fn)...start()`` alongside (or
        instead of) the data sink."""

        alert_handlers: dict = {}

    outs = _StreamOutputs(outputs)
    outs.alert_handlers = {
        k: fn for k, v in outputs.items()
        if (fn := getattr(v, "_ks_alert_handler_fn", None)) is not None
    }
    return outs


# --------------------------------------------------------------------- #
# DOT export — `kapacitor show <task>` graph rendering
# --------------------------------------------------------------------- #


class _GNode:
    """Pure-graph stand-in for a chain node during DOT extraction."""

    __slots__ = ("label", "parents")

    def __init__(self, label, parents):
        self.label = label
        self.parents = parents


class _GraphEnv:
    """Implements the parser's env surface (chain/prop/_materialize/vars)
    but builds a DAG instead of executing — so ``task_dot`` renders a
    script's graph without needing sources, Spark, or service configs."""

    _CHAIN_NAMES: set | None = None

    @classmethod
    def _valid_chain(cls) -> set:
        """Every chain-node name the EXECUTING env can dispatch — AGGS +
        BUILDERS + the _mk_* builder methods + _apply_chain's inline
        cases. Derived from _Env itself so define-time validation (the
        task-store API validates scripts without sources or Spark, like
        the reference's define path) can never drift from execution."""
        if cls._CHAIN_NAMES is None:
            names = set(_Env.AGGS) | set(_Env.BUILDERS)
            names |= {m[4:] for m in dir(_Env) if m.startswith("_mk_")}
            names |= {
                "where", "shift", "sample", "union", "httpOut", "log",
                "trickle", "stats", "deadman", "from", "query", "queryFlux",
            }
            cls._CHAIN_NAMES = names
        return cls._CHAIN_NAMES

    def __init__(self):
        self.vars: dict = {}
        self.order: list = []
        self._sources: dict[str, _GNode] = {}

    def _src_node(self, src: "_Source") -> _GNode:
        # one shared node per source KIND: in the reference every `stream`
        # expression binds the pipeline's single StreamNode (stream0)
        g = self._sources.get(src.kind)
        if g is None:
            g = _GNode(src.kind, [])
            self._sources[src.kind] = g
            self.order.append(g)
        return g

    def chain(self, node, name, args):
        if not name.startswith("@") and name not in self._valid_chain():
            raise TickError(f"unsupported node |{name}()")
        parents = []
        if isinstance(node, _Source):
            parents.append(self._src_node(node))
        elif isinstance(node, _GNode):
            parents.append(node)
        for a in args:
            if isinstance(a, _GNode):
                parents.append(a)
            elif isinstance(a, _Source):
                parents.append(self._src_node(a))
        g = _GNode(name.lstrip("@"), parents)
        self.order.append(g)
        return g

    def prop(self, node, name, args):
        return node  # properties don't create DOT vertices

    def _materialize(self, node):
        return node


def task_dot(script: str, name: str = "task") -> str:
    """Render a TICKscript's node graph as graphviz DOT — the reference's
    ``kapacitor show`` output (/root/reference/task.go:84 Task.Dot →
    pipeline/pipeline.go:203 Pipeline.Dot; node names are ``<desc><id>``
    per pipeline/node.go:126). Pure parse: no sources, no Spark session,
    no service configs are needed."""
    env = _GraphEnv()
    toks, src = _tokenize(script)
    _P(toks, src, env).run()
    names: dict[int, str] = {}
    for i, g in enumerate(env.order):
        names[id(g)] = f"{g.label}{i}"
    lines = [f"digraph {name} {{"]
    for g in env.order:
        for p in g.parents:
            lines.append(f"{names[id(p)]} -> {names[id(g)]};")
    lines.append("}")
    return "\n".join(lines)


_DUR_RE = re.compile(r"^-?\d+(\.\d+)?(ns|us|µs|ms|s|m|h|d|w)$")


def _coerce_template_vars(overrides: dict) -> dict:
    """Python values → parser value types: '10s' → duration,
    'lambda: ...' → lambda (with an empty var scope), '/re/' → regex."""
    out = {}
    for k, v in overrides.items():
        if isinstance(v, str):
            if _DUR_RE.match(v):
                v = _Duration(v)
            elif v.startswith("lambda:"):
                # scope is bound when the var assignment executes
                v = _Lambda(v[len("lambda:"):].strip(), {})
            # plain strings stay strings — '/x/' could be a real path;
            # pass a compiled re.Pattern for a regex override
        elif isinstance(v, re.Pattern):
            v = _Regex(v.pattern)
        out[k] = v
    return out


def template_vars(script: str) -> dict[str, dict]:
    """Declared template vars with defaults and reference type names —
    the reference's Template.Vars (client.Vars: int/float/bool/string/
    duration/lambda/regex; /root/reference/template.go + pipeline.go:23
    CreateTemplatePipeline). Pure parse: no sources or Spark needed."""
    env = _GraphEnv()
    toks, src = _tokenize(script)
    _P(toks, src, env).run()
    out = {}
    for name, v in env.vars.items():
        if isinstance(v, _Duration):
            out[name] = {"value": v.text, "type": "duration"}
        elif isinstance(v, _Lambda):
            out[name] = {"value": v.src, "type": "lambda"}
        elif isinstance(v, _Regex):
            out[name] = {"value": v.pat, "type": "regex"}
        elif isinstance(v, bool):
            out[name] = {"value": v, "type": "bool"}
        elif isinstance(v, int):
            out[name] = {"value": v, "type": "int"}
        elif isinstance(v, float):
            out[name] = {"value": v, "type": "float"}
        elif isinstance(v, str):
            out[name] = {"value": v, "type": "string"}
        # node/chain vars (var x = stream|from()...) are pipeline wiring,
        # not template vars — the reference's vars JSON lists only typed
        # values, and this keeps the listing JSON-serializable
    return out
