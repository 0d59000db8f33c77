"""Ingest-pipeline DSL interpreter (SURVEY §7 step 4): executes pipeline
specs in the reference's JSON shape (ingest/axway-ingest.json,
ingest/one-pipeline-to-rule-them-all.json) as a chain of Catalyst column
expressions over flat dotted-path columns.

This is the config-driven counterpart to the hand-composed operators in
``pipeline.py``: the reference keeps its transformation logic *as data*
(OpenSearch processor JSON), so the engine interprets the same data shape
instead of hard-coding each chain.  A pipeline compiles once per batch into
one projection (plus a broadcast join for geoip) — no per-document loop.

Supported processors (the complete set the reference uses, A17-A31):
``pipeline`` (conditional dispatch), ``grok`` (+ on_failure semantics),
``uri_parts``, ``set`` (literal / {{template}} / copy_from / if /
ignore_empty_value), ``remove``, ``rename``, ``date``, ``geoip`` (dim table
injected), ``script`` (recognized painless idioms: the TLS-version split,
axway-ingest.json:130-136, and the null-scrub, :137-143, which is a no-op
here because ``to_json`` already omits nulls at serialization).

Condition language: the painless subset the reference uses —
``ctx.a?.b == null`` / ``!= null``, numeric ``<`` ``>`` comparisons,
``=~ /regex/``, joined with ``&&`` (e.g. axway-ingest.json:20,49,56;
one-pipeline-to-rule-them-all.json:8).

Failure semantics (ES-faithful): a grok non-match marks the document
failed; subsequent processors in that pipeline are skipped for that row;
the pipeline-level ``on_failure`` handler then runs (the reference's sets
``error.message``, axway-ingest.json:145-152).  Failed documents are kept,
not dropped.
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..sources.geoip import ip_to_int
from .grok import compile_grok, grok_columns

_FAILED = "__pipeline_failed"
_FAILMSG = "__pipeline_failmsg"


def _c(name: str) -> Column:
    """Column ref for a flat dotted-path column name."""
    return F.col(f"`{name}`")


def _painless_path(expr: str) -> str:
    """``ctx?.http?.response?.status_code`` → ``http.response.status_code``."""
    p = expr.strip()
    p = re.sub(r"^ctx\??\.", "", p)
    return p.replace("?.", ".")


def parse_condition(painless: str, columns: list[str]):
    """Translate the reference's painless conditions into a Column.
    Unknown column paths evaluate as null (ES missing-field semantics)."""

    def col_or_null(path: str) -> Column:
        return _c(path) if path in columns else F.lit(None)

    def one(clause: str) -> Column:
        clause = clause.strip()
        m = re.match(r"^(.+?)\s*=~\s*/(.+)/$", clause)
        if m:
            return col_or_null(_painless_path(m.group(1))).rlike(m.group(2))
        m = re.match(r"^(.+?)\s*(==|!=)\s*null$", clause)
        if m:
            c = col_or_null(_painless_path(m.group(1)))
            return c.isNull() if m.group(2) == "==" else c.isNotNull()
        m = re.match(r"^(.+?)\s*(<|>|<=|>=)\s*(-?\d+)$", clause)
        if m:
            c = col_or_null(_painless_path(m.group(1)))
            ops = {"<": c < int(m.group(3)), ">": c > int(m.group(3)),
                   "<=": c <= int(m.group(3)), ">=": c >= int(m.group(3))}
            return ops[m.group(2)]
        raise ValueError(f"unsupported painless condition clause: {clause!r}")

    out = None
    for clause in painless.split("&&"):
        col = one(clause)
        out = col if out is None else (out & col)
    return out


class PipelineInterpreter:
    """Interprets one or more named pipelines over a DataFrame whose
    columns are flat dotted paths (e.g. 'records.data.logGroup')."""

    def __init__(self, pipelines: dict[str, dict], geoip_dim: DataFrame | None = None):
        self.pipelines = pipelines
        self.geoip_dim = geoip_dim

    # -- helpers ----------------------------------------------------------

    @staticmethod
    def _not_failed(df: DataFrame) -> Column:
        return ~F.coalesce(F.col(_FAILED), F.lit(False))

    def _set_col(self, df: DataFrame, name: str, value: Column, guard: Column | None) -> DataFrame:
        """Set a column only where guard holds (and the doc hasn't failed),
        preserving prior values elsewhere."""
        cond = self._not_failed(df) if guard is None else (self._not_failed(df) & guard)
        prior = _c(name) if name in df.columns else F.lit(None).cast("string")
        return df.withColumn(name, F.when(cond, value).otherwise(prior))

    # -- processors -------------------------------------------------------

    def _grok(self, df: DataFrame, spec: dict) -> DataFrame:
        field = spec["field"]
        compiled = compile_grok(spec["patterns"][0])
        src = _c(field) if field in df.columns else F.lit(None).cast("string")
        matched = src.isNotNull() & src.rlike(compiled.regex)
        # ignore_missing: a NULL source is a skip, not a failure (json:10)
        fails = src.isNotNull() & ~matched
        for name, col in grok_columns(src, compiled).items():
            df = self._set_col(df, name, col, matched)
        df = df.withColumn(
            _FAILED, F.coalesce(F.col(_FAILED), F.lit(False)) | (fails & self._not_failed(df))
        )
        return df.withColumn(
            _FAILMSG,
            F.coalesce(
                F.col(_FAILMSG),
                F.when(fails, F.lit(f"grok: no match for field [{field}]")),
            ),
        )

    def _uri_parts(self, df: DataFrame, spec: dict) -> DataFrame:
        field = spec["field"]
        src = _c(field) if field in df.columns else F.lit(None).cast("string")
        path = F.regexp_extract(src, r"^([^?#]*)", 1)
        df = self._set_col(df, "url.original", src, src.isNotNull())
        df = self._set_col(df, "url.path", path, src.isNotNull())
        df = self._set_col(
            df, "url.query", F.nullif(F.regexp_extract(src, r"\?([^#]*)", 1), F.lit("")), src.isNotNull()
        )
        return self._set_col(
            df,
            "url.extension",
            F.nullif(F.regexp_extract(path, r"\.([^./]+)$", 1), F.lit("")),
            src.isNotNull(),
        )

    def _set(self, df: DataFrame, spec: dict) -> DataFrame:
        target = spec["field"]
        guard = parse_condition(spec["if"], df.columns) if "if" in spec else None
        if "copy_from" in spec:
            value = _c(spec["copy_from"]) if spec["copy_from"] in df.columns else F.lit(None)
        else:
            raw = spec["value"]
            m = re.match(r"^\{\{\s*(.+?)\s*\}\}$", str(raw))
            if m:  # {{field}} template copy
                src = m.group(1)
                value = _c(src) if src in df.columns else F.lit(None)
                if spec.get("ignore_empty_value"):
                    empty = value.isNull() | (value.cast("string") == "")
                    guard2 = ~empty
                    guard = guard2 if guard is None else (guard & guard2)
            else:
                value = F.lit(raw)
        return self._set_col(df, target, value, guard)

    def _remove(self, df: DataFrame, spec: dict) -> DataFrame:
        fields = spec["field"] if isinstance(spec["field"], list) else [spec["field"]]
        return df.drop(*[f for f in fields if f in df.columns])

    def _rename(self, df: DataFrame, spec: dict) -> DataFrame:
        src, dst = spec["field"], spec["target_field"]
        if src not in df.columns:
            return df  # ignore_missing
        df = self._set_col(df, dst, _c(src), None)
        return df.drop(src)

    def _date(self, df: DataFrame, spec: dict) -> DataFrame:
        src = spec["field"]
        target = spec.get("target_field", "@timestamp")
        value = _c(src) if src in df.columns else F.lit(None).cast("string")
        parsed = None
        for fmt in spec["formats"]:
            p = F.try_to_timestamp(value, F.lit(fmt))
            parsed = p if parsed is None else F.coalesce(parsed, p)
        # ignore_failure: keep prior @timestamp when no format parses
        prior = _c(target) if target in df.columns else F.lit(None).cast("timestamp")
        return df.withColumn(
            target, F.when(self._not_failed(df) & parsed.isNotNull(), parsed).otherwise(prior)
        )

    def _geoip(self, df: DataFrame, spec: dict) -> DataFrame:
        if self.geoip_dim is None:
            return df
        field = spec["field"]
        target = spec.get("target_field", "source.geo")
        props = spec.get("properties")
        if field not in df.columns:
            return df  # ignore_missing
        ip = _c(field)
        valid = ip.rlike(r"^(\d{1,3}\.){3}\d{1,3}$")
        joined = df.withColumn("__ip_int", F.when(valid & self._not_failed(df), ip_to_int(ip))).join(
            F.broadcast(self.geoip_dim),
            (F.col("__ip_int") >= F.col("ip_lo")) & (F.col("__ip_int") <= F.col("ip_hi")),
            "left",
        )
        if props and "asn" in props:  # the ASN database call (json:95-108)
            joined = joined.withColumn(f"{target}.asn", F.col("as_number"))
            joined = joined.withColumn(f"{target}.organization_name", F.col("as_org"))
        else:  # the city database call (json:90-94)
            joined = joined.withColumn(f"{target}.country_iso_code", F.col("geo_country"))
            joined = joined.withColumn(f"{target}.city_name", F.col("geo_city"))
        return joined.drop("__ip_int", "ip_lo", "ip_hi", "geo_country", "geo_city", "as_number", "as_org")

    def _script(self, df: DataFrame, spec: dict) -> DataFrame:
        source = spec.get("source", "")
        guard = parse_condition(spec["if"], df.columns) if "if" in spec else None
        if "splitOnToken" in source and "tls" in source:
            # TLS-version split (axway-ingest.json:130-136)
            proto_col = "apache.access.ssl.protocol"
            src = _c(proto_col) if proto_col in df.columns else F.lit(None).cast("string")
            parts = F.split(F.lower(src), "v")
            ok = F.size(parts) == 2
            raw = F.element_at(parts, 2)
            ver = F.when(raw.contains("."), raw).otherwise(F.concat(raw, F.lit(".0")))
            g = ok if guard is None else (guard & ok)
            df = self._set_col(df, "tls.version", ver, g)
            return self._set_col(df, "tls.version_protocol", F.element_at(parts, 1), g)
        if "removeIf" in source:
            # recursive null-scrub (axway-ingest.json:137-143): serialization
            # concern — to_json omits null fields already; nothing to do.
            return df
        raise ValueError("unrecognized painless script; only the reference's idioms are supported")

    def _pipeline(self, df: DataFrame, spec: dict) -> DataFrame:
        """Conditional sub-pipeline dispatch: run the sub-pipeline, then
        mask every column it added/changed back to the original where the
        condition does not hold."""
        cond = parse_condition(spec["if"], df.columns) if "if" in spec else F.lit(True)
        snapshot = {c: f"__orig_{i}" for i, c in enumerate(df.columns)}
        saved = df
        for c, tmp in snapshot.items():
            saved = saved.withColumn(tmp, _c(c))
        saved = saved.withColumn("__branch", F.coalesce(cond, F.lit(False)))
        out = self.apply(saved, spec["name"])
        for c, tmp in snapshot.items():
            if c in out.columns:
                out = out.withColumn(c, F.when(F.col("__branch"), _c(c)).otherwise(F.col(tmp)))
        for c in out.columns:
            if not c.startswith("__") and c not in snapshot:
                out = out.withColumn(c, F.when(F.col("__branch"), _c(c)))
        return out.drop(*snapshot.values(), "__branch")

    # -- driver -----------------------------------------------------------

    _DISPATCH = {
        "grok": _grok,
        "uri_parts": _uri_parts,
        "set": _set,
        "remove": _remove,
        "rename": _rename,
        "date": _date,
        "geoip": _geoip,
        "script": _script,
        "pipeline": _pipeline,
    }

    def apply(self, df: DataFrame, pipeline_name: str) -> DataFrame:
        spec = self.pipelines[pipeline_name]
        if _FAILED not in df.columns:
            df = df.withColumn(_FAILED, F.lit(False)).withColumn(
                _FAILMSG, F.lit(None).cast("string")
            )
        for proc in spec.get("processors", []):
            (ptype, pspec), = proc.items()
            df = self._DISPATCH[ptype](self, df, pspec)
        for handler in spec.get("on_failure", []):
            (ptype, pspec), = handler.items()
            if ptype == "set":
                target = pspec["field"]
                value = (
                    F.col(_FAILMSG)
                    if "{{" in str(pspec.get("value", "")) and "on_failure_message" in str(pspec["value"])
                    else F.lit(pspec.get("value"))
                )
                prior = _c(target) if target in df.columns else F.lit(None).cast("string")
                df = df.withColumn(target, F.when(F.col(_FAILED), value).otherwise(prior))
        return df

    def run(self, df: DataFrame, entry: str) -> DataFrame:
        """Apply the entry pipeline and drop interpreter bookkeeping."""
        return self.apply(df, entry).drop(_FAILED, _FAILMSG)
