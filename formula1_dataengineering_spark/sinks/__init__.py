"""Presentation sinks (SURVEY §2.1 K1/K2): SVG chart renderers and the
static HTML dashboard, all stdlib-only, all at the ``.toPandas()`` edge
over already-aggregated chart-data DataFrames."""

from .charts import (
    COMPOUND_COLORS,
    avg_lap_by_compound_svg,
    fastest_laps_svg,
    telemetry_svg,
)
from .dashboard import dashboard_html, emit_drilldown_site, session_report_html
from .svg import fmt_lap_time

__all__ = [
    "COMPOUND_COLORS",
    "avg_lap_by_compound_svg",
    "fastest_laps_svg",
    "telemetry_svg",
    "dashboard_html",
    "emit_drilldown_site",
    "session_report_html",
    "fmt_lap_time",
]
