"""Chart sinks (K1): SVG renderers for the reference's figures.

Re-expresses ``compare_fastest_lap_characteristics`` and
``visualize_lap_telemetry`` (reference: src/data_visualization.py:3-60)
as stdlib-only SVG emitters over the *chart-data* DataFrames the engine
already produces (session_facade.fastest_laps_chart_data,
SessionFacade.lap_telemetry). The heavy lifting — ranking, formatting,
window ordering — stays in Spark; rendering happens at the
``.toPandas()`` edge on an already-small result, exactly where the
reference calls matplotlib.

Design notes (validated against the palette checker):
- Tyre-compound colors are DOMAIN-SEMANTIC (the F1 broadcast
  convention: soft=red, medium=yellow, hard=white/grey, inter=green,
  wet=blue) — entity-anchored like status colors, never used for free
  series identity. Every bar therefore carries the compound NAME as a
  direct text label (the reference does the same, dv:23), so color is
  never the only encoding; the red/green pair sits in the CVD 6-8
  band that is legal only with such labels.
- Telemetry lines use validated categorical slots (blue/green/red pass
  lightness, chroma, contrast; worst CVD pair 7.2 with direct labels).
- One y-axis per panel — throttle and brake share a % scale; speed
  gets its own panel (never a dual-axis chart).
- Native ``<title>`` tooltips on every mark; the dashboard sink adds a
  table view per figure.
"""

from __future__ import annotations

import math

import pandas as pd

from .svg import SERIES, Scale, esc, fmt_lap_time, nice_ticks, svg_doc

#: F1 broadcast compound colors, validated-palette steps. HARD is grey
#: by convention (fails the categorical chroma floor deliberately —
#: see module docstring; normal-vision ΔE vs every other slot ≥ 17).
COMPOUND_COLORS = {
    "SOFT": "#e34948",
    "MEDIUM": "#eda100",
    "HARD": "#8a8984",
    "INTERMEDIATE": "#008300",
    "WET": "#2a78d6",
}
_UNKNOWN_COMPOUND = "#52514e"


def fastest_laps_svg(
    pdf: pd.DataFrame,
    title: str = "Fastest lap times",
    width: int = 960,
    height: int = 360,
) -> str:
    """Per-driver fastest-lap bar chart (reference dv:3-49).

    Expects the columns of ``fastest_laps_chart_data`` (``position``,
    ``name_acronym`` or ``driver_number``, ``actual_lap_time``,
    optional ``lap_time_label``); optional ``compound`` colors bars by
    tyre and labels each bar with the compound name; optional
    ``qualifying`` (values Q3/Q2/Q1) draws the segment separators and
    headers the reference overlays for qualifying sessions (dv:27-39).
    """
    pdf = pdf[pdf["actual_lap_time"].notna()].reset_index(drop=True)
    n = len(pdf)
    pad_l, pad_r, pad_t, pad_b = 64, 16, 44, 56
    plot_w, plot_h = width - pad_l - pad_r, height - pad_t - pad_b
    if n == 0:
        return svg_doc(
            width,
            height,
            f'<text x="{width / 2}" y="{height / 2}" text-anchor="middle" '
            f'class="muted" font-size="13">no laps to plot</text>',
        )
    names = (
        pdf["name_acronym"]
        if "name_acronym" in pdf
        else pdf["driver_number"].astype(str)
    )
    times = pdf["actual_lap_time"].astype(float)
    labels = (
        pdf["lap_time_label"]
        if "lap_time_label" in pdf
        else times.map(fmt_lap_time)
    )
    # Reference y-window: best*0.95 .. worst*1.05 (dv:45)
    y0, y1 = float(times.min()) * 0.95, float(times.max()) * 1.05
    y = Scale(y0, y1, pad_t + plot_h, pad_t)
    ticks = nice_ticks(y0, y1, 5)

    slot = plot_w / n
    bar_w = max(min(slot - 2, 40), 3)  # 2px surface gap between bars
    parts: list[str] = []
    for t in ticks:
        ty = y(t)
        parts.append(
            f'<line class="grid" x1="{pad_l}" y1="{ty}" '
            f'x2="{width - pad_r}" y2="{ty}"/>'
            f'<text x="{pad_l - 6}" y="{ty + 4}" text-anchor="end" '
            f'class="muted" font-size="10">{esc(fmt_lap_time(t))}</text>'
        )
    base = y(y0)
    has_compound = "compound" in pdf.columns
    for i in range(n):
        cx = pad_l + slot * i + slot / 2
        bx = cx - bar_w / 2
        by = y(float(times.iloc[i]))
        h = max(base - by, 0.5)
        raw_comp = pdf["compound"].iloc[i] if has_compound else None
        comp = (
            str(raw_comp).upper() if isinstance(raw_comp, str) and raw_comp else None
        )
        fill = (
            COMPOUND_COLORS.get(comp, _UNKNOWN_COMPOUND)
            if has_compound
            else SERIES["blue"]
        )
        r = min(4.0, bar_w / 2, h)  # rounded data-end, square baseline
        parts.append(
            f'<path d="M{bx:.1f} {base:.1f} V{by + r:.1f} '
            f"Q{bx:.1f} {by:.1f} {bx + r:.1f} {by:.1f} "
            f"H{bx + bar_w - r:.1f} "
            f"Q{bx + bar_w:.1f} {by:.1f} {bx + bar_w:.1f} {by + r:.1f} "
            f'V{base:.1f} Z" fill="{fill}">'
            f"<title>{esc(names.iloc[i])} — {esc(labels.iloc[i])}"
            f'{" · " + esc(comp.capitalize()) if comp else ""}</title></path>'
        )
        if slot < 56:
            # narrow slots: rotate the time label 90° like the
            # reference annotation (dv:22) to avoid collisions
            ly = max(by - 5, 52.0)  # keep the ~46px label on-canvas
            parts.append(
                f'<text x="{cx + 3:.1f}" y="{ly:.1f}" font-size="9" '
                f'transform="rotate(-90 {cx + 3:.1f} {ly:.1f})" '
                f'text-anchor="start">{esc(labels.iloc[i])}</text>'
            )
        else:
            parts.append(
                f'<text x="{cx:.1f}" y="{by - 4:.1f}" text-anchor="middle" '
                f'font-size="9">{esc(labels.iloc[i])}</text>'
            )
        if comp:
            parts.append(
                f'<text x="{cx:.1f}" y="{base + 24:.1f}" text-anchor="middle" '
                f'class="muted" font-size="8">{esc(comp.capitalize())}</text>'
            )
        parts.append(
            f'<text x="{cx:.1f}" y="{base + 13:.1f}" text-anchor="middle" '
            f'font-size="10">{esc(names.iloc[i])}</text>'
        )
    # Qualifying segment separators + headers (dv:27-39)
    if "qualifying" in pdf.columns:
        segs = pdf["qualifying"].tolist()
        for i in range(1, n):
            if segs[i] != segs[i - 1]:
                sx = pad_l + slot * i
                parts.append(
                    f'<line class="sep" x1="{sx:.1f}" y1="{pad_t}" '
                    f'x2="{sx:.1f}" y2="{base:.1f}"/>'
                )
        seen: dict[str, list[int]] = {}
        for i, s in enumerate(segs):
            seen.setdefault(s, []).append(i)
        for s, idx in seen.items():
            cx = pad_l + slot * (idx[0] + idx[-1] + 1) / 2
            parts.append(
                f'<text x="{cx:.1f}" y="{pad_t - 6}" text-anchor="middle" '
                f'class="muted" font-size="11">{esc(s)}</text>'
            )
    parts.append(
        f'<line class="axis" x1="{pad_l}" y1="{base:.1f}" '
        f'x2="{width - pad_r}" y2="{base:.1f}"/>'
        f'<text x="{pad_l}" y="20" font-size="13">{esc(title)}</text>'
    )
    return svg_doc(width, height, "".join(parts))


#: Reference compound iteration order (classes.py:19-25 dict order) —
#: absent compounds are skipped, present ones keep this bar order.
_COMPOUND_ORDER = ("SOFT", "MEDIUM", "HARD", "INTERMEDIATE", "WET")


def avg_lap_by_compound_svg(
    pdf: pd.DataFrame,
    title: str = "Average lap times by driver and tire compound",
    width: int = 960,
    height: int = 420,
) -> str:
    """Driver × compound grouped-bar chart (reference
    classes.py:101-140, ``LapTimePlotByTireAndSession``) over the long
    form ``avg_lap_by_compound`` already emits — no pivot→melt
    round-trip (SURVEY §2.7 U3).

    Reference parity: drivers sort by their MEDIUM-compound average
    (drivers with no medium time go last), ties by driver label
    (cl:93-95 SortKey); compounds render in the fixed broadcast-color
    order, skipping absent ones (cl:104-107); each bar carries its
    formatted time rotated 90° (cl:115); the y-window is
    [min − 2·pad, max + pad] with pad = 0.2·range (cl:135-139); a
    compound legend sits above the plot (color never the only encoding
    — the legend plus per-bar tooltips name the compound).

    Expects columns ``compound``, ``avg_lap_time``, and a driver label
    (``name_acronym`` if present, else ``driver_number``).
    """
    pdf = pdf[pdf["avg_lap_time"].notna()].copy()
    if len(pdf) == 0:
        return svg_doc(
            width,
            height,
            f'<text x="{width / 2}" y="{height / 2}" text-anchor="middle" '
            f'class="muted" font-size="13">no laps to plot</text>',
        )
    label_col = "name_acronym" if "name_acronym" in pdf.columns else "driver_number"
    pdf["__driver"] = pdf[label_col].astype(str)
    pdf["__comp"] = pdf["compound"].astype(str).str.upper()
    times = pdf["avg_lap_time"].astype(float)

    # Driver order: min MEDIUM average, absent-medium last, tie on label.
    medium = (
        pdf[pdf["__comp"] == "MEDIUM"].groupby("__driver")["avg_lap_time"].min()
    )
    drivers = sorted(
        pdf["__driver"].unique(),
        key=lambda d: (d not in medium.index, float(medium.get(d, 0.0)), d),
    )
    compounds = [c for c in _COMPOUND_ORDER if c in set(pdf["__comp"])]
    cell = {
        (r["__driver"], r["__comp"]): float(r["avg_lap_time"])
        for _, r in pdf.iterrows()
    }

    pad_l, pad_r, pad_t, pad_b = 64, 16, 64, 56
    plot_w, plot_h = width - pad_l - pad_r, height - pad_t - pad_b
    lo, hi = float(times.min()), float(times.max())
    rng_pad = (hi - lo) * 0.2 or 1.0
    y0, y1 = lo - rng_pad * 2, hi + rng_pad
    y = Scale(y0, y1, pad_t + plot_h, pad_t)
    base = y(y0)

    parts: list[str] = []
    for t in nice_ticks(y0, y1, 5):
        ty = y(t)
        parts.append(
            f'<line class="grid" x1="{pad_l}" y1="{ty}" '
            f'x2="{width - pad_r}" y2="{ty}"/>'
            f'<text x="{pad_l - 6}" y="{ty + 4}" text-anchor="end" '
            f'class="muted" font-size="10">{esc(fmt_lap_time(t))}</text>'
        )

    slot = plot_w / max(len(drivers), 1)
    bar_w = max(min(slot / (len(compounds) + 1), 28), 2)
    group_w = bar_w * len(compounds)
    for di, d in enumerate(drivers):
        gx = pad_l + slot * di + (slot - group_w) / 2
        for ci, comp in enumerate(compounds):
            v = cell.get((d, comp))
            if v is None:
                continue
            bx = gx + bar_w * ci
            by = y(v)
            h = max(base - by, 0.5)
            fill = COMPOUND_COLORS.get(comp, _UNKNOWN_COMPOUND)
            r = min(3.0, bar_w / 2, h)
            label = fmt_lap_time(v)
            parts.append(
                f'<path d="M{bx:.1f} {base:.1f} V{by + r:.1f} '
                f"Q{bx:.1f} {by:.1f} {bx + r:.1f} {by:.1f} "
                f"H{bx + bar_w - r:.1f} "
                f"Q{bx + bar_w:.1f} {by:.1f} {bx + bar_w:.1f} {by + r:.1f} "
                f'V{base:.1f} Z" fill="{fill}">'
                f"<title>{esc(d)} · {esc(comp.capitalize())} — "
                f"{esc(label)}</title></path>"
            )
            # rotated per-bar time label (reference cl:115)
            lx = bx + bar_w / 2 + 3
            ly = max(by - 4, 70.0)
            parts.append(
                f'<text x="{lx:.1f}" y="{ly:.1f}" font-size="8" '
                f'transform="rotate(-90 {lx:.1f} {ly:.1f})" '
                f'text-anchor="start">{esc(label)}</text>'
            )
        parts.append(
            f'<text x="{pad_l + slot * di + slot / 2:.1f}" '
            f'y="{base + 14:.1f}" text-anchor="middle" font-size="10">'
            f"{esc(d)}</text>"
        )
    # Compound legend (reference cl:122): swatch + name per compound.
    lx = pad_l
    for comp in compounds:
        fill = COMPOUND_COLORS.get(comp, _UNKNOWN_COMPOUND)
        parts.append(
            f'<rect x="{lx}" y="30" width="10" height="10" rx="2" '
            f'fill="{fill}"/>'
            f'<text x="{lx + 14}" y="39" font-size="10" class="muted">'
            f"{esc(comp.capitalize())}</text>"
        )
        lx += 24 + 7 * len(comp)
    parts.append(
        f'<line class="axis" x1="{pad_l}" y1="{base:.1f}" '
        f'x2="{width - pad_r}" y2="{base:.1f}"/>'
        f'<text x="{pad_l}" y="20" font-size="13">{esc(title)}</text>'
    )
    return svg_doc(width, height, "".join(parts))


def _line_path(xs: list[float], ys: list[float]) -> str:
    pts = [
        f"{x:.1f} {yy:.1f}"
        for x, yy in zip(xs, ys)
        if not (isinstance(yy, float) and math.isnan(yy))
    ]
    if not pts:
        return ""
    return "M" + " L".join(pts)


def telemetry_svg(
    pdf: pd.DataFrame,
    title: str = "Lap telemetry",
    width: int = 960,
    height: int = 380,
) -> str:
    """Two stacked shared-x panels (reference dv:52-60): vehicle speed,
    then throttle + brake on one % axis. Expects columns
    ``seconds_from_lap_start``, ``speed``, ``throttle``, ``brake``.
    """
    pdf = pdf.sort_values("seconds_from_lap_start").reset_index(drop=True)
    pad_l, pad_r, pad_t, pad_b, gap = 56, 70, 40, 40, 24
    panel_h = (height - pad_t - pad_b - gap) / 2
    xs_d = pdf["seconds_from_lap_start"].astype(float)
    if len(pdf) == 0:
        return svg_doc(
            width,
            height,
            f'<text x="{width / 2}" y="{height / 2}" text-anchor="middle" '
            f'class="muted" font-size="13">no telemetry</text>',
        )
    x = Scale(float(xs_d.min()), float(xs_d.max()), pad_l, width - pad_r)
    xpix = [x(v) for v in xs_d]
    parts: list[str] = [f'<text x="{pad_l}" y="20" font-size="13">{esc(title)}</text>']

    def panel(top: float, series: list[tuple[str, str, pd.Series]], unit: str):
        bounds = [
            (float(s.min()), float(s.max()))
            for _, _, s in series
            if s.notna().any()
        ]
        if not bounds:  # every series all-null: render an empty panel
            parts.append(
                f'<text x="{width / 2}" y="{top + panel_h / 2:.1f}" '
                f'text-anchor="middle" class="muted" font-size="11">'
                f"no {esc(unit)} data</text>"
            )
            return
        lo, hi = min(b[0] for b in bounds), max(b[1] for b in bounds)
        if hi <= lo:
            hi = lo + 1.0
        yscale = Scale(lo, hi, top + panel_h, top)
        for t in nice_ticks(lo, hi, 4):
            ty = yscale(t)
            parts.append(
                f'<line class="grid" x1="{pad_l}" y1="{ty}" '
                f'x2="{width - pad_r}" y2="{ty}"/>'
                f'<text x="{pad_l - 6}" y="{ty + 3}" text-anchor="end" '
                f'class="muted" font-size="9">{t:g}</text>'
            )
        for name, color, s in series:
            path = _line_path(xpix, [yscale(v) for v in s.astype(float)])
            if path:
                parts.append(
                    f'<path d="{path}" fill="none" stroke="{color}" '
                    f'stroke-width="2" stroke-linejoin="round">'
                    f"<title>{esc(name)}</title></path>"
                )
                # direct label at the line end (identity never color-alone)
                last = s.dropna()
                if len(last):
                    parts.append(
                        f'<text x="{width - pad_r + 5}" '
                        f'y="{yscale(float(last.iloc[-1])) + 3:.1f}" '
                        f'font-size="10">{esc(name)}</text>'
                    )
        parts.append(
            f'<text x="{pad_l - 44}" y="{top + panel_h / 2:.1f}" '
            f'class="muted" font-size="9" transform="rotate(-90 '
            f'{pad_l - 44} {top + panel_h / 2:.1f})" '
            f'text-anchor="middle">{esc(unit)}</text>'
        )

    panel(pad_t, [("speed", SERIES["blue"], pdf["speed"])], "Speed km/h")
    panel(
        pad_t + panel_h + gap,
        [
            ("throttle", SERIES["green"], pdf["throttle"]),
            ("brake", SERIES["red"], pdf["brake"]),
        ],
        "Throttle / Brake %",
    )
    base = pad_t + 2 * panel_h + gap
    for t in nice_ticks(float(xs_d.min()), float(xs_d.max()), 6):
        tx = x(t)
        parts.append(
            f'<line class="axis" x1="{tx}" y1="{base:.1f}" '
            f'x2="{tx}" y2="{base + 4:.1f}"/>'
            f'<text x="{tx}" y="{base + 16:.1f}" text-anchor="middle" '
            f'class="muted" font-size="9">{esc(fmt_lap_time(t))}</text>'
        )
    return svg_doc(width, height, "".join(parts))
