"""Independent pure-pandas reference implementation of the flagship
pipeline semantics (FIXTURES.md F2/F4/F5). Deliberately written with
python re / dict logic — NOT Spark — so pytest compares two
independent implementations (the reference's golden-fixture strategy,
SURVEY.md §5).
"""

from __future__ import annotations

import json
import re

import pandas as pd

REQ_RE = re.compile(r"^(?P<method>\w+) (?P<path>\S+) status=(?P<status>[+-]?\d+) dur_ms=(?P<dur_ms>[+-]?\d+)$")
ERR_RE = re.compile(r"err_code=(E\d{3})")


def parse_row(text: str):
    """Returns (parsed dict or None, template)."""
    if text.startswith("{"):
        try:
            obj = json.loads(text)
            if obj.get("level") is None:
                return None, "json"
            return {
                "level": str(obj["level"]),
                "msg": str(obj["msg"]),
                "attempt": str(obj["attempt"]),
            }, "json"
        except (json.JSONDecodeError, KeyError):
            return None, "json"
    if re.match(r"^(GET|POST|PUT|DELETE) /", text):
        m = REQ_RE.match(text)
        return (m.groupdict() if m else None), "request"
    if text.startswith("action="):
        return {
            k: v for k, v in (p.split("=", 1) for p in text.split(" ") if "=" in p)
        }, "kv"
    m = ERR_RE.search(text)
    return ({"err_code": m.group(1)} if m else {}), "free"


TOOL_LOOKUP = {
    "bash": ("shell", 3),
    "search": ("retrieval", 1),
    "browser": ("web", 2),
    "editor": ("code", 2),
}


def golden_pipeline(pdf: pd.DataFrame):
    """Returns dict with ok, dropped, routes{name: set of (conv_id,
    turn_idx)}, aggregates{name: DataFrame}."""
    rows = []
    dropped = []
    for r in pdf.itertuples(index=False):
        parsed, template = parse_row(r.text)
        if parsed is None:
            dropped.append(r)
            continue
        role_l = r.role.lower()
        role_norm = role_l if role_l in ("user", "assistant", "tool", "system") else "other"
        cat, risk = TOOL_LOOKUP.get(r.tool, (None, None))
        rows.append(
            {
                "conv_id": r.conv_id,
                "turn_idx": r.turn_idx,
                "text": r.text,
                "ts": r.ts,
                "role_norm": role_norm,
                "tool_category": cat,
                "status": int(parsed["status"]) if "status" in parsed else None,
                "dur_ms": int(parsed["dur_ms"]) if "dur_ms" in parsed else None,
                "err_code": parsed.get("err_code"),
            }
        )
    ok = pd.DataFrame(rows)

    def cond_errors(r):
        return r["err_code"] is not None or (r["status"] is not None and r["status"] >= 500)

    def cond_tool(r):
        return r["role_norm"] == "tool"

    def cond_slow(r):
        return r["dur_ms"] is not None and r["dur_ms"] > 1000

    conds = {"errors": cond_errors, "tool_calls": cond_tool, "slow": cond_slow}
    routes: dict[str, set] = {name: set() for name in conds}
    routes["_unmatched"] = set()
    route_rows: dict[str, list] = {name: [] for name in routes}
    for _, r in ok.iterrows():
        key = (r["conv_id"], int(r["turn_idx"]))
        matched = False
        for name, fn in conds.items():
            if fn(r):
                routes[name].add(key)
                route_rows[name].append(r)
                matched = True
        if not matched:
            routes["_unmatched"].add(key)
            route_rows["_unmatched"].append(r)

    aggregates = {}
    for name, rws in route_rows.items():
        if not rws:
            aggregates[name] = pd.DataFrame(
                columns=["window_start", "role_norm", "tool_category", "events", "dur_ms_sum"]
            )
            continue
        rdf = pd.DataFrame(rws)
        rdf["window_start"] = rdf["ts"].dt.floor("10min")
        g = (
            rdf.groupby(["window_start", "role_norm", "tool_category"], dropna=False)
            .agg(events=("conv_id", "size"), dur_ms_sum=("dur_ms", lambda s: int(s.fillna(0).sum())))
            .reset_index()
        )
        g["tool_category"] = g["tool_category"].where(pd.notna(g["tool_category"]), None)
        aggregates[name] = g
    return {"ok": ok, "dropped": dropped, "routes": routes, "aggregates": aggregates}
