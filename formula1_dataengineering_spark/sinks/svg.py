"""Minimal stdlib-only SVG primitives for the chart sinks (K1/K2).

No matplotlib/seaborn in the runtime — charts are emitted as
standalone SVG documents (embeddable in the static dashboard). Design
tokens follow a validated light/dark palette; dark mode is selected via
a ``prefers-color-scheme`` media query baked into each SVG's style
block, not an automatic color flip.
"""

from __future__ import annotations

import math
from xml.sax.saxutils import escape

# Chart surface + ink tokens (light / dark), validated palette.
TOKENS_CSS = """
  .chart { --surface: #fcfcfb; --ink: #0b0b0b; --ink-2: #52514e;
           --grid: #e8e7e3; }
  @media (prefers-color-scheme: dark) {
    .chart { --surface: #1a1a19; --ink: #ffffff; --ink-2: #c3c2b7;
             --grid: #383835; }
  }
  .chart .bg { fill: var(--surface); }
  .chart text { fill: var(--ink); font-family: system-ui, sans-serif; }
  .chart .muted { fill: var(--ink-2); }
  .chart .grid { stroke: var(--grid); stroke-width: 1; }
  .chart .axis { stroke: var(--ink-2); stroke-width: 1; }
  .chart .sep { stroke: var(--ink-2); stroke-width: 0.75;
                stroke-dasharray: 4 3; }
"""

#: Categorical line slots (validated: lightness band, chroma floor,
#: ≥3:1 surface contrast; worst CVD pair 7.2 — legal with the direct
#: labels every line carries).
SERIES = {"blue": "#2a78d6", "green": "#008300", "red": "#e34948"}


def esc(s: object) -> str:
    return escape(str(s))


def nice_ticks(lo: float, hi: float, n: int = 5) -> list[float]:
    """~n 'nice' tick values covering [lo, hi]."""
    if not (hi > lo):
        hi = lo + 1.0
    raw = (hi - lo) / max(n, 1)
    mag = 10 ** math.floor(math.log10(raw))
    for mult in (1, 2, 2.5, 5, 10):
        step = mult * mag
        if step >= raw:
            break
    start = math.ceil(lo / step) * step
    ticks, v, i = [], start, 0
    while v <= hi + 1e-9 and i < 50:
        ticks.append(round(v, 10))
        i += 1
        v = start + i * step
    return ticks


class Scale:
    """Linear [d0, d1] → [r0, r1] (r1 < r0 flips, e.g. SVG y)."""

    def __init__(self, d0: float, d1: float, r0: float, r1: float):
        self.d0, self.d1, self.r0, self.r1 = d0, d1, r0, r1
        self._k = (r1 - r0) / ((d1 - d0) or 1.0)

    def __call__(self, v: float) -> float:
        return round(self.r0 + (v - self.d0) * self._k, 2)


def svg_doc(width: int, height: int, body: str, extra_css: str = "") -> str:
    """Wrap body in a standalone SVG with the token stylesheet."""
    return (
        f'<svg xmlns="http://www.w3.org/2000/svg" width="{width}" '
        f'height="{height}" viewBox="0 0 {width} {height}" '
        f'class="chart" role="img">'
        f"<style>{TOKENS_CSS}{extra_css}</style>"
        f'<rect class="bg" x="0" y="0" width="{width}" height="{height}"/>'
        f"{body}</svg>"
    )


def fmt_lap_time(seconds: float) -> str:
    """M:SS.mmm — driver-side twin of functions.timefmt (F2/F3)."""
    if seconds is None or (isinstance(seconds, float) and math.isnan(seconds)):
        return ""
    ms = int(round(seconds * 1000))
    m, rem = divmod(ms, 60_000)
    s, milli = divmod(rem, 1000)
    return f"{m}:{s:02d}.{milli:03d}"
