"""JSON serving shim over :class:`mrf_etl_spark.plans.queries.StarLake`.

The reference ships a FastAPI backend (webapp/backend/main.py:100-996)
whose endpoints are DuckDB SQL + a JSON envelope: the scope echoed back
(state/year_month/filters), money rounded to 2 decimals with a
``round(x, 2) if x else 0`` guard, and list payloads under an
endpoint-specific key (``payers``, ``procedures``, ``results``, …). The
query semantics already live in `plans/queries.py` as DataFrame methods;
this module adds ONLY the envelope shaping plus a dependency-free HTTP
front (stdlib ``http.server``) so a reference user keeps their URL
surface.

Serving-path note (DASHBOARD_OPTIMIZATION_GUIDE.md:9-19): interactive
latency comes from the materialized-rollup path
(`StarLake.materialize_market_rates` + partition-pruned reads), not from
rescanning the fact table per request — at 100 TB the fact scan is a
batch job, the MV is the serving store. This shim works over either: pass
a StarLake whose ``fact`` IS the materialized rollup for the fast path.
"""

from __future__ import annotations

import json
from typing import Any

from pyspark.sql import DataFrame

from mrf_etl_spark.plans.queries import StarLake, build_filter


def _round2(v: Any) -> Any:
    """The reference's money guard (backend/main.py:225-229):
    ``round(x, 2) if x else 0`` — None and 0 both collapse to 0."""
    return round(v, 2) if v else 0


# Hard ceiling on rows any endpoint may collect into the driver — the
# serving twin of the reference's own 500-1000-row endpoint caps (and its
# duckdb memory_limit guard). Every collect below goes through _rows /
# _one, so every endpoint's plan carries a GlobalLimit regardless of what
# the caller passed for limit/k.
MAX_ROWS = 1000


def _clamp(n: int) -> int:
    return max(1, min(int(n), MAX_ROWS))


def _rows(df: DataFrame) -> list[dict[str, Any]]:
    return [r.asDict(recursive=True) for r in df.limit(MAX_ROWS).collect()]


def _one(df: DataFrame) -> dict[str, Any]:
    """Single-row envelope collect (summary/statistics aggregates) — the
    limit(1) both guards a mis-shaped frame and pins the GlobalLimit."""
    return df.limit(1).collect()[0].asDict()


class RateAPI:
    """Endpoint vocabulary → JSON envelopes. One method per reference
    endpoint; scope/filter arguments mirror the reference's query params
    (backend/main.py:100-996), results are plain dicts ready for
    ``json.dumps``."""

    def __init__(self, lake: StarLake):
        self.lake = lake

    # -- /api/rates/summary (backend/main.py:100-186) --------------------
    def rate_summary(
        self,
        state: str,
        year_month: str,
        payer: str | None = None,
        code_type: str | None = None,
        code: str | None = None,
        billing_class: str | None = None,
    ) -> dict[str, Any]:
        eq: dict[str, object] = {"state": state, "year_month": year_month}
        for k, v in (
            ("code_type", code_type), ("code", code), ("billing_class", billing_class),
        ):
            if v is not None:
                eq[k] = v
        ilike = {"reporting_entity_name": f"%{payer}%"} if payer else None
        pred = build_filter(eq=eq, ilike=ilike)
        row = _one(self.lake.rate_summary(pred))
        return {
            "state": state,
            "year_month": year_month,
            "filters": {
                "payer": payer, "code_type": code_type,
                "code": code, "billing_class": billing_class,
            },
            "summary": {
                "total_rates": row["rate_count"],
                "avg_rate": _round2(row["avg_rate"]),
                "min_rate": _round2(row["min_rate"]),
                "max_rate": _round2(row["max_rate"]),
                "median_rate": _round2(row["median_rate"]),
                "unique_procedures": row["unique_codes"],
                "unique_payers": row["unique_payers"],
            },
        }

    # -- /api/rates/by-payer (backend/main.py:188-235) -------------------
    def rates_by_payer(self, state: str, year_month: str, limit: int = 50) -> dict[str, Any]:
        pred = build_filter(eq={"state": state, "year_month": year_month})
        payers = [
            {
                "payer_name": r["payer_slug"],
                "rate_count": r["rate_count"],
                "avg_rate": _round2(r["avg_rate"]),
                "min_rate": _round2(r["min_rate"]),
                "max_rate": _round2(r["max_rate"]),
                "median_rate": _round2(r["median_rate"]),
            }
            for r in _rows(self.lake.rates_by_payer(pred, _clamp(limit)))
        ]
        return {"state": state, "year_month": year_month, "payers": payers}

    # -- /api/rates/by-procedure (backend/main.py:257-327) ---------------
    def rates_by_procedure(
        self,
        state: str,
        year_month: str,
        code_type: str | None = None,
        billing_class: str | None = None,
        limit: int = 50,
    ) -> dict[str, Any]:
        eq: dict[str, object] = {"state": state, "year_month": year_month}
        if code_type is not None:
            eq["code_type"] = code_type
        if billing_class is not None:
            eq["billing_class"] = billing_class
        procedures = [
            {
                "code_type": r["code_type"],
                "code": r["code"],
                "description": r.get("code_desc", r["code"]),
                "rate_count": r["rate_count"],
                "avg_rate": _round2(r["avg_rate"]),
                "min_rate": _round2(r["min_rate"]),
                "max_rate": _round2(r["max_rate"]),
                "median_rate": _round2(r["median_rate"]),
            }
            for r in _rows(self.lake.rates_by_procedure(build_filter(eq=eq), _clamp(limit)))
        ]
        return {"state": state, "year_month": year_month, "procedures": procedures}

    # -- /api/rates/detail (backend/main.py:329-411) ---------------------
    def rate_detail(self, state: str, year_month: str, **kw: Any) -> dict[str, Any]:
        if "limit" in kw:
            kw["limit"] = _clamp(kw["limit"])
        results = _rows(self.lake.rate_detail(state, year_month, **kw))
        for r in results:
            if "negotiated_rate" in r:
                r["negotiated_rate"] = _round2(r["negotiated_rate"])
        return {
            "state": state,
            "year_month": year_month,
            "count": len(results),
            "results": results,
        }

    # -- /api/providers/search (backend/main.py:413-459) -----------------
    def provider_search(self, q: str, limit: int = 20) -> dict[str, Any]:
        return {"query": q, "providers": _rows(self.lake.provider_search(q, _clamp(limit)))}

    # -- /api/meta/data-availability (backend/main.py:461-503) -----------
    def data_availability(self) -> dict[str, Any]:
        combos = _rows(
            self.lake.availability_matrix().orderBy("state", "year_month")
        )
        return {"combinations": combos, "count": len(combos)}

    # -- /api/statistics (backend/main.py:908-924) -----------------------
    def statistics(self) -> dict[str, Any]:
        return _one(self.lake.dashboard_statistics())

    # -- /api/meta/dimension-values (backend/main.py:505-580) ------------
    def dimension_values(
        self, dimension: str, k: int = 100,
        state: str | None = None, year_month: str | None = None,
    ) -> dict[str, Any]:
        rows = _rows(
            self.lake.dimension_values(
                dimension, _clamp(k), state=state, year_month=year_month
            )
        )
        out: dict[str, Any] = {
            "dimension": dimension,
            "values": [
                {"value": r["facet"], "count": r["n"]} for r in rows
            ],
        }
        if state is not None:
            out["state"] = state
        if year_month is not None:
            out["year_month"] = year_month
        return out

    # -- /api/autocomplete (backend/main.py:791-906) ---------------------
    def autocomplete(
        self, field: str, prefix: str = "", k: int = 15,
        query: str | None = None, state: str | None = None,
        year_month: str | None = None, limit: int | None = None,
    ) -> dict[str, Any]:
        """Reference-scoped form (state + year_month given): per-field
        DISTINCT value list from the field's own source table, the exact
        /api/autocomplete/{field} contract (bare string suggestions,
        query echoed). Legacy form otherwise: substring-filtered
        most-common-first facets."""
        if state is not None and year_month is not None:
            lim = _clamp(limit if limit is not None else k)
            values = [
                r["value"]
                for r in _rows(
                    self.lake.autocomplete_values(field, state, year_month, lim)
                )
            ]
            return {
                "field": field,
                "query": query if query is not None else prefix,
                "state": state,
                "year_month": year_month,
                "suggestions": values,
            }
        return {
            "field": field,
            "prefix": prefix,
            "suggestions": _rows(self.lake.autocomplete(field, prefix, _clamp(k))),
        }

    # -- /api/search/statistics (backend/main.py:908-924) ----------------
    def search_statistics(self, state: str, year_month: str) -> dict[str, Any]:
        row = _one(self.lake.category_statistics(state, year_month))
        return {
            "state": state,
            "year_month": year_month,
            "statistics": {
                "unique_providers": row.get("unique_provider", 0),
                "unique_organizations": row.get("unique_organization", 0),
                "unique_taxonomies": row.get("unique_taxonomy", 0),
                "unique_procedures": row.get("unique_procedure", 0),
                "unique_procedure_classes": row.get("unique_procedure_class", 0),
                "unique_payers": row.get("unique_payer", 0),
                "unique_tins": row.get("unique_tin", 0),
                "total_records": row["total_records"],
            },
        }

    # -- /api/search/* family (backend/main.py:586-722) ------------------
    # route search_type -> (StarLake search type, value param name)
    SEARCH_TYPES = {
        "tin": ("tin", "tin_value"),
        "organization": ("organization", "org_name"),
        "taxonomy": ("taxonomy", "taxonomy_desc"),
        "procedure-category": ("procedure_category", "proc_class"),
        "billing-code": ("billing_code", "billing_code"),
        "payer": ("payer", "payer_name"),
    }

    def search(
        self, search_type: str, value: str, state: str, year_month: str,
        limit: int = 100,
    ) -> dict[str, Any]:
        lake_type, _ = self.SEARCH_TYPES[search_type]
        results = _rows(
            self.lake.search_rollup(
                lake_type, value, state, year_month, _clamp(limit)
            )
        )
        for r in results:
            for k in ("avg_rate", "min_rate", "max_rate"):
                if k in r:
                    r[k] = _round2(r[k])
        return {
            "search_type": lake_type,
            "search_value": value,
            "state": state,
            "year_month": year_month,
            "result_count": len(results),
            "results": results,
        }

    # -- /api/search/multi-field (backend/main.py:724-789) ---------------
    # query param -> (index column, 'in' | 'ilike-any'); comma-separated
    # values fan out into IN lists / OR'd ILIKEs like the reference's
    # parse_multi_value + build_in/ilike_clause pair
    MULTI_FIELDS = {
        "primary_taxonomy_desc": ("primary_taxonomy_desc", "in"),
        "organization_name": ("organization_name", "ilike-any"),
        "npi": ("npi", "in"),
        "enumeration_type": ("enumeration_type", "in"),
        "billing_class": ("billing_class", "in"),
        "proc_set": ("proc_set", "in"),
        "proc_class": ("proc_class", "in"),
        "proc_group": ("proc_group", "in"),
        "billing_code": ("code", "in"),
        "tin_value": ("tin_value", "in"),
        "payer": ("reporting_entity_name", "ilike-any"),
    }

    def multi_field(
        self, state: str, year_month: str, limit: int = 100, **filters: Any
    ) -> dict[str, Any]:
        from pyspark.sql import functions as F

        pred = build_filter(eq={"state": state, "year_month": year_month})
        for param, raw in filters.items():
            if param not in self.MULTI_FIELDS or raw in (None, ""):
                continue
            col, op = self.MULTI_FIELDS[param]
            values = [v.strip() for v in str(raw).split(",") if v.strip()]
            if not values:
                continue
            if op == "in":
                pred = pred & F.col(col).isin(values)
            else:
                any_like = F.lit(False)
                for v in values:
                    any_like = any_like | F.col(col).ilike(f"%{v}%")
                pred = pred & any_like
        results = _rows(self.lake.multi_field_search(pred, limit=_clamp(limit)))
        for r in results:
            if "negotiated_rate" in r:
                r["negotiated_rate"] = _round2(r["negotiated_rate"])
        return {
            "search_type": "multi_field",
            "state": state,
            "year_month": year_month,
            "filters": {k: v for k, v in filters.items() if k in self.MULTI_FIELDS},
            "result_count": len(results),
            "results": results,
        }

    # -- /api/health (backend/main.py:62) --------------------------------
    def health(self) -> dict[str, Any]:
        return {"status": "healthy", "engine": "spark"}

    # -- /api/explore/data-availability (backend/main.py:926-950) --------
    CATEGORY_INFO = {
        "payer": ("Payer Name", "Insurance companies and payers"),
        "organization": ("Organization Name", "Healthcare organizations and provider groups"),
        "taxonomy": ("Taxonomy Description", "Provider specialties and taxonomy classifications"),
        "procedure_set": ("Procedure Set", "High-level procedure categories"),
        "procedure_class": ("Procedure Class", "Detailed procedure classifications"),
    }

    def explore_availability(
        self, state: str, year_month: str, category: str,
        limit: int = 25, offset: int = 0,
    ) -> dict[str, Any]:
        limit, offset = _clamp(limit), max(0, min(int(offset), MAX_ROWS))
        if category not in self.CATEGORY_INFO:
            rows: list[dict[str, Any]] = []
        else:
            label, desc = self.CATEGORY_INFO[category]
            rows = _rows(
                self.lake.category_rollup(
                    state, year_month, category, limit=min(limit + offset, MAX_ROWS)
                )
            )[offset:]
            field = self.lake.CATEGORY_FIELDS[category]
            for r in rows:
                for k in ("avg_rate", "min_rate", "max_rate"):
                    r[k] = _round2(r[k])
                r["category_info"] = {
                    "field": field, "label": label, "description": desc,
                }
        return {
            "state": state, "year_month": year_month, "category": category,
            "limit": limit, "offset": offset,
            "result_count": len(rows), "has_more": len(rows) == limit,
            "results": rows,
        }

    # -- /api/explore/category-stats (backend/main.py:952-968) -----------
    def category_stats(self, state: str, year_month: str) -> dict[str, Any]:
        row = _one(self.lake.category_statistics(state, year_month))
        labels = {
            "payer": ("Payers", "Insurance companies and payers"),
            "organization": ("Organizations", "Healthcare organizations and provider groups"),
            "taxonomy": ("Taxonomies", "Provider specialties and classifications"),
            "procedure_set": ("Procedure Sets", "High-level procedure categories"),
            "procedure_class": ("Procedure Classes", "Detailed procedure classifications"),
            "procedure": ("Procedures", "Individual procedure codes"),
            "provider": ("Providers", "Individual healthcare providers"),
            "tin": ("TINs", "Tax identification numbers"),
        }
        stats: dict[str, Any] = {}
        for cat, (label, desc) in labels.items():
            key = f"unique_{cat}"
            if key in row:
                stats[cat] = {"count": row[key], "label": label, "description": desc}
        stats["total_records"] = row["total_records"]
        return {
            "state": state, "year_month": year_month,
            "category_statistics": stats,
        }

    # -- /api/explore/drill-down (backend/main.py:970-996) ---------------
    def drill_down(
        self, state: str, year_month: str, category: str,
        selected_value: str, drill_category: str, limit: int = 50,
    ) -> dict[str, Any]:
        known = self.lake.CATEGORY_FIELDS
        if category not in known or drill_category not in known:
            rows: list[dict[str, Any]] = []
        else:
            rows = _rows(
                self.lake.category_rollup(
                    state, year_month, drill_category,
                    source=(category, selected_value), limit=_clamp(limit),
                )
            )
            for r in rows:
                for k in ("avg_rate", "min_rate", "max_rate"):
                    r[k] = _round2(r[k])
                r["source_category"] = category
                r["source_value"] = selected_value
                r["drill_category"] = drill_category
        return {
            "state": state, "year_month": year_month,
            "source_category": category, "selected_value": selected_value,
            "drill_category": drill_category,
            "result_count": len(rows), "results": rows,
        }

    # thin per-type wrappers so the route table can address each
    # reference search URL by method name
    def search_tin(self, tin_value, state, year_month, limit=100):
        return self.search("tin", tin_value, state, year_month, limit)

    def search_organization(self, org_name, state, year_month, limit=100):
        return self.search("organization", org_name, state, year_month, limit)

    def search_taxonomy(self, taxonomy_desc, state, year_month, limit=100):
        return self.search("taxonomy", taxonomy_desc, state, year_month, limit)

    def search_procedure_category(self, proc_class, state, year_month, limit=100):
        return self.search("procedure-category", proc_class, state, year_month, limit)

    def search_billing_code(self, billing_code, state, year_month, limit=100):
        return self.search("billing-code", billing_code, state, year_month, limit)

    def search_payer(self, payer_name, state, year_month, limit=100):
        return self.search("payer", payer_name, state, year_month, limit)

    # -- /api/explore drilldown (optimized_queries.py:966-1024) ----------
    def explore(self, group_by: str, k: int = 20, **fix: Any) -> dict[str, Any]:
        """URL form of :meth:`drilldown`: every query param besides
        group_by/k is a fixed dimension (the reference's explore
        endpoint shape)."""
        return self.drilldown(fix, group_by, k)

    def drilldown(self, fix: dict[str, object], group_by: str, k: int = 20) -> dict[str, Any]:
        return {
            "fixed": fix,
            "group_by": group_by,
            "groups": _rows(self.lake.drilldown(fix, group_by, _clamp(k))),
        }


# --------------------------------------------------------------- HTTP front

_ROUTES = {
    "/api/rates/summary": ("rate_summary", ["state", "year_month", "payer", "code_type", "code", "billing_class"]),
    "/api/rates/by-payer": ("rates_by_payer", ["state", "year_month", "limit"]),
    "/api/rates/by-procedure": ("rates_by_procedure", ["state", "year_month", "code_type", "billing_class", "limit"]),
    "/api/rates/detail": ("rate_detail", ["state", "year_month", "payer", "code", "billing_class", "tin_value", "limit"]),
    "/api/providers/search": ("provider_search", ["q", "limit"]),
    "/api/meta/data-availability": ("data_availability", []),
    "/api/statistics": ("statistics", []),
    "/api/meta/dimension-values": ("dimension_values", ["dimension", "k", "state", "year_month"]),
    "/api/autocomplete": ("autocomplete", ["field", "prefix", "k", "query", "state", "year_month", "limit"]),
    # every query param besides group_by/k is a fixed dimension
    "/api/explore/drilldown": ("explore", ["group_by", "k", "*"]),
    # the reference's full URL surface (backend/main.py:57-996)
    "/": ("health", []),
    "/api/health": ("health", []),
    "/api/meta/available-data": ("data_availability", []),
    "/api/search/statistics": ("search_statistics", ["state", "year_month"]),
    "/api/search/tin": ("search_tin", ["tin_value", "state", "year_month", "limit"]),
    "/api/search/organization": ("search_organization", ["org_name", "state", "year_month", "limit"]),
    "/api/search/taxonomy": ("search_taxonomy", ["taxonomy_desc", "state", "year_month", "limit"]),
    "/api/search/procedure-category": ("search_procedure_category", ["proc_class", "state", "year_month", "limit"]),
    "/api/search/billing-code": ("search_billing_code", ["billing_code", "state", "year_month", "limit"]),
    "/api/search/payer": ("search_payer", ["payer_name", "state", "year_month", "limit"]),
    "/api/search/multi-field": ("multi_field", ["state", "year_month", "limit", "*"]),
    "/api/explore/data-availability": ("explore_availability", ["state", "year_month", "category", "limit", "offset"]),
    "/api/explore/category-stats": ("category_stats", ["state", "year_month"]),
    "/api/explore/drill-down": ("drill_down", ["state", "year_month", "category", "selected_value", "drill_category", "limit"]),
}
_INT_PARAMS = {"limit", "k", "offset"}


def serve(api: RateAPI, host: str = "127.0.0.1", port: int = 8000, block: bool = True):
    """Expose a :class:`RateAPI` over HTTP with the reference's URL
    surface — stdlib ``ThreadingHTTPServer``, zero dependencies. With
    ``block=False`` the server runs on a daemon thread and is returned
    (tests; callers shut it down with ``.shutdown()``).

    NOTE: the SparkSession behind the lake is driver-resident — this
    front serves from the session's process like `spark-connect` or a
    notebook kernel would; it is a query front, not a cluster service."""
    import threading
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
    from urllib.parse import parse_qs, urlparse

    class Handler(BaseHTTPRequestHandler):
        def do_GET(self):  # noqa: N802 — http.server API
            parsed = urlparse(self.path)
            path = parsed.path
            # /api/autocomplete/{field} — the reference's PATH-parameter
            # form (backend/main.py:791) next to the query-param form
            extra: dict[str, str] = {}
            if path.startswith("/api/autocomplete/") and path.count("/") == 3:
                extra["field"] = path.rsplit("/", 1)[1]
                path = "/api/autocomplete"
            route = _ROUTES.get(path)
            if route is None:
                self._send(404, {"error": f"unknown endpoint {parsed.path}"})
                return
            method, params = route
            q = {k: v[0] for k, v in parse_qs(parsed.query).items()}
            q.update(extra)
            kwargs = {}
            for p in params:
                if p == "*":  # pass-through: remaining params as-is
                    kwargs.update(
                        {k: v for k, v in q.items() if k not in params}
                    )
                elif p in q:
                    kwargs[p] = int(q[p]) if p in _INT_PARAMS else q[p]
            try:
                self._send(200, getattr(api, method)(**kwargs))
            except TypeError as e:  # missing required scope params
                self._send(400, {"error": str(e)})
            except Exception as e:  # noqa: BLE001 — mirror the 500 path
                self._send(500, {"error": str(e)})

        def _send(self, status: int, payload: dict) -> None:
            body = json.dumps(payload, default=str).encode()
            self.send_response(status)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def log_message(self, *a):  # quiet
            pass

    server = ThreadingHTTPServer((host, port), Handler)
    if block:
        server.serve_forever()
        return server
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    return server
