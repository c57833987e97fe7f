"""Generate docs/fer_curves.svg — the measured wman_N0576 FER curves
(base-20 / boosted-30 / published 50-iter weights) on a log-FER axis.

Pure-stdlib SVG writer (no matplotlib dependency).  Data points are the
measured values recorded in benchmarks/RESULTS.md (full provenance there:
benchmarks/runs/boosted_wman_full/DEEP_FLOOR.json etc.).  Colors are the
first three slots of the validated reference categorical palette
(all-pairs CVD-safe per its documentation); identity is also carried by
direct end-labels, and the adjacent RESULTS.md tables are the table view.
"""

from __future__ import annotations

import math
import os

SURFACE = "#fcfcfb"
INK = "#0b0b0b"
INK2 = "#52514e"
GRID = "#e4e3df"
SERIES = [
    ("NMS base (20 it)", "#2a78d6",
     [(4.0, 2.37e-4), (4.5, 2.43e-5), (5.0, 6.38e-6), (5.25, 2.11e-6),
      (5.5, 1.45e-6), (5.75, 7.39e-7), (6.0, 4.22e-7), (6.25, 2.85e-7),
      (6.5, 1.79e-7)]),
    ("boosted (20+10 it, UCN)", "#eb6834",
     [(4.0, 1.40e-4), (4.5, 9.54e-6), (5.0, 8.33e-7), (5.25, 3.11e-7),
      (5.5, 9.60e-8), (5.75, 3.28e-8), (6.0, 1.61e-8), (6.25, 4.57e-9),
      (6.5, 2.08e-9)]),
    ("published 50-it weights", "#1baf7a",
     [(3.5, 2.78e-3), (4.0, 7.92e-5), (4.5, 2.21e-6), (5.0, 2.16e-7),
      (5.5, 2.24e-8), (6.0, 2.63e-9), (6.25, 8.62e-10)]),
]

W, H = 880, 540
ML, MR, MT, MB = 74, 190, 58, 56
X0, X1 = 3.4, 6.6
YE0, YE1 = -10, -2  # log10 FER range


def sx(x):
    return ML + (x - X0) / (X1 - X0) * (W - ML - MR)


def sy(fer):
    e = math.log10(fer)
    return MT + (YE1 - e) / (YE1 - YE0) * (H - MT - MB)


def main() -> str:
    p = []
    p.append(f'<svg xmlns="http://www.w3.org/2000/svg" width="{W}" '
             f'height="{H}" viewBox="0 0 {W} {H}" font-family="system-ui,'
             f'-apple-system,Segoe UI,Helvetica,Arial,sans-serif">')
    p.append(f'<rect width="{W}" height="{H}" fill="{SURFACE}"/>')
    p.append(f'<text x="{ML}" y="26" font-size="16" font-weight="600" '
             f'fill="{INK}">WiMAX (576,432) QMS frame-error rate — '
             f'measured on one TPU v5e chip</text>')
    p.append(f'<text x="{ML}" y="44" font-size="12" fill="{INK2}">boosted '
             f'post stage trained at the full NeurIPS\'23 recipe; '
             f'&#8805;40 frame errors per point (25+ at the deepest)</text>')

    # y grid: one line per decade
    for e in range(YE0, YE1 + 1):
        y = sy(10.0 ** e)
        p.append(f'<line x1="{ML}" y1="{y:.1f}" x2="{W - MR}" y2="{y:.1f}" '
                 f'stroke="{GRID}" stroke-width="1"/>')
        p.append(f'<text x="{ML - 8}" y="{y + 4:.1f}" font-size="11" '
                 f'fill="{INK2}" text-anchor="end">1e{e}</text>')
    # x ticks each 0.5 dB
    x = X0 + 0.1
    for i in range(7):
        xv = 3.5 + 0.5 * i
        xx = sx(xv)
        p.append(f'<line x1="{xx:.1f}" y1="{H - MB}" x2="{xx:.1f}" '
                 f'y2="{H - MB + 5}" stroke="{INK2}" stroke-width="1"/>')
        p.append(f'<text x="{xx:.1f}" y="{H - MB + 20}" font-size="11" '
                 f'fill="{INK2}" text-anchor="middle">{xv:g}</text>')
    p.append(f'<text x="{(ML + W - MR) / 2:.0f}" y="{H - 12}" '
             f'font-size="12" fill="{INK2}" text-anchor="middle">'
             f'E&#8339;/N&#8320; (dB)</text>')
    p.append(f'<text x="20" y="{(MT + H - MB) / 2:.0f}" font-size="12" '
             f'fill="{INK2}" text-anchor="middle" '
             f'transform="rotate(-90 20 {(MT + H - MB) / 2:.0f})">'
             f'FER (log scale)</text>')

    # series: 2px lines, 4px markers with a 2px surface ring, end labels
    for name, color, pts in SERIES:
        path = " ".join(f"{sx(x):.1f},{sy(f):.1f}" for x, f in pts)
        p.append(f'<polyline points="{path}" fill="none" stroke="{color}" '
                 f'stroke-width="2" stroke-linejoin="round"/>')
        for x, f in pts:
            p.append(f'<circle cx="{sx(x):.1f}" cy="{sy(f):.1f}" r="4" '
                     f'fill="{color}" stroke="{SURFACE}" stroke-width="2"/>')
        ex, ef = pts[-1]
        p.append(f'<text x="{sx(ex) + 10:.1f}" y="{sy(ef) + 4:.1f}" '
                 f'font-size="12" fill="{INK}">{name}</text>')

    # legend (top-right, inside the margin column)
    lx, ly = W - MR + 10, MT + 8
    for i, (name, color, _pts) in enumerate(SERIES):
        yy = ly + 20 * i
        p.append(f'<line x1="{lx}" y1="{yy}" x2="{lx + 18}" y2="{yy}" '
                 f'stroke="{color}" stroke-width="2"/>')
        p.append(f'<circle cx="{lx + 9}" cy="{yy}" r="4" fill="{color}" '
                 f'stroke="{SURFACE}" stroke-width="2"/>')
        p.append(f'<text x="{lx + 24}" y="{yy + 4}" font-size="11" '
                 f'fill="{INK}">{name}</text>')

    p.append("</svg>")
    return "\n".join(p)


if __name__ == "__main__":
    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "docs", "fer_curves.svg")
    svg = main()
    with open(out, "w") as f:
        f.write(svg)
    print(f"wrote {out} ({len(svg)} bytes)")
