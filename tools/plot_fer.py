"""Generate docs/fer_curves*.svg — the measured FER curves on log axes.

Pure-stdlib SVG writer (no matplotlib dependency).  Data points are the
measured values recorded in benchmarks/RESULTS.md (full provenance there:
benchmarks/runs/boosted_wman_full/DEEP_FLOOR.json,
benchmarks/runs/round3/{CAMPAIGNS,DEEP_BOOSTED_5G}.json etc.).  Colors are
the first slots of the validated reference categorical palette in fixed
order (all-pairs CVD-safe per its documentation); identity is also carried
by direct end-labels, and the adjacent RESULTS.md tables are the table
view.
"""

from __future__ import annotations

import math
import os

SURFACE = "#fcfcfb"
INK = "#0b0b0b"
INK2 = "#52514e"
GRID = "#e4e3df"
# validated categorical order, slots 1-4 (see dataviz reference palette)
C1, C2, C3, C4 = "#2a78d6", "#eb6834", "#1baf7a", "#eda100"

WMAN = dict(
    filename="fer_curves.svg",
    title="WiMAX (576,432) QMS frame-error rate — measured on one TPU v5e chip",
    subtitle=("boosted post stage trained at the full NeurIPS'23 recipe; "
              "&#8805;40 frame errors per point (25+ at the deepest)"),
    xlabel="SNR (dB)", x0=3.4, x1=6.6, ye0=-10, ye1=-2,
    xticks=[3.5 + 0.5 * i for i in range(7)],
    series=[
        ("NMS base (20 it)", C1,
         [(4.0, 2.37e-4), (4.5, 2.43e-5), (5.0, 6.38e-6), (5.25, 2.11e-6),
          (5.5, 1.45e-6), (5.75, 7.39e-7), (6.0, 4.22e-7), (6.25, 2.85e-7),
          (6.5, 1.79e-7)]),
        ("boosted (20+10 it, UCN)", C2,
         [(4.0, 1.40e-4), (4.5, 9.54e-6), (5.0, 8.33e-7), (5.25, 3.11e-7),
          (5.5, 9.60e-8), (5.75, 3.28e-8), (6.0, 1.61e-8), (6.25, 4.57e-9),
          (6.5, 2.08e-9)]),
        ("published 50-it weights", C3,
         [(3.5, 2.78e-3), (4.0, 7.92e-5), (4.5, 2.21e-6), (5.0, 2.16e-7),
          (5.5, 2.24e-8), (6.0, 2.63e-9), (6.25, 8.62e-10)]),
    ])

FIVEG = dict(
    filename="fer_curves_5g.svg",
    title="5G NR R=1/2 (512,256) boosted decoding — measured on one TPU v5e chip",
    subtitle=("base + post decoders trained from scratch at the full recipe; "
              "per-check (2,2,2) weights, systematic; &#8805;40 errors/point"),
    xlabel="SNR (dB)", x0=2.8, x1=5.2, ye0=-9, ye1=-3,
    xticks=[3.0, 3.5, 4.0, 4.5, 5.0],
    series=[
        ("base (20 it) — floors at ~2e-6", C1,
         [(3.0, 1.42e-4), (3.5, 3.31e-5), (4.0, 7.79e-6), (4.5, 3.26e-6),
          (5.0, 2.06e-6)]),
        ("boosted (20+10 it, UCN)", C2,
         [(3.0, 5.44e-5), (3.5, 4.54e-6), (4.0, 5.97e-7), (4.5, 7.13e-8),
          (5.0, 1.18e-8)]),
    ])

WIFI = dict(
    filename="fer_curves_wifi.svg",
    title="802.11n (648,540) R=5/6 frame-error rate — measured on one TPU v5e chip",
    subtitle=("temporal (dynamic) sharing trained from scratch at the full "
              "recipe vs the reference's shipped 50-it weights; "
              "&#8805;50 errors/point"),
    xlabel="SNR (dB)", x0=3.9, x1=5.65, ye0=-7, ye1=-1,
    xticks=[4.0, 4.25, 4.5, 4.75, 5.0, 5.25, 5.5],
    series=[
        ("shipped 50-it (3,3,3)", C1,
         [(4.0, 9.81e-3), (4.25, 1.91e-3), (4.5, 2.99e-4), (4.75, 5.63e-5),
          (5.0, 9.73e-6), (5.25, 1.11e-6), (5.5, 2.67e-7)]),
        ("temporal 50-it (5,0,5)", C2,
         [(4.0, 1.88e-2), (4.25, 4.51e-3), (4.5, 9.06e-4), (4.75, 1.74e-4),
          (5.0, 5.44e-5), (5.25, 1.20e-5), (5.5, 5.40e-6)]),
        ("temporal 20-it (5,0,5)", C3,
         [(4.0, 3.27e-2), (4.25, 8.42e-3), (4.5, 1.91e-3), (4.75, 3.75e-4),
          (5.0, 8.58e-5), (5.25, 1.65e-5), (5.5, 4.33e-6)]),
        ("plain MS 50-it", C4,
         [(4.0, 2.07e-2), (4.25, 4.61e-3), (4.5, 8.54e-4), (4.75, 1.41e-4),
          (5.0, 3.34e-5), (5.25, 7.22e-6), (5.5, 2.61e-6)]),
    ])

W, H = 880, 540
ML, MR, MT, MB = 74, 190, 58, 56


def render(fig: dict) -> str:
    x0, x1 = fig["x0"], fig["x1"]
    ye0, ye1 = fig["ye0"], fig["ye1"]

    def sx(x):
        return ML + (x - x0) / (x1 - x0) * (W - ML - MR)

    def sy(fer):
        e = math.log10(fer)
        return MT + (ye1 - e) / (ye1 - ye0) * (H - MT - MB)

    p = []
    p.append(f'<svg xmlns="http://www.w3.org/2000/svg" width="{W}" '
             f'height="{H}" viewBox="0 0 {W} {H}" font-family="system-ui,'
             f'-apple-system,Segoe UI,Helvetica,Arial,sans-serif">')
    p.append(f'<rect width="{W}" height="{H}" fill="{SURFACE}"/>')
    p.append(f'<text x="{ML}" y="26" font-size="16" font-weight="600" '
             f'fill="{INK}">{fig["title"]}</text>')
    p.append(f'<text x="{ML}" y="44" font-size="12" fill="{INK2}">'
             f'{fig["subtitle"]}</text>')

    for e in range(ye0, ye1 + 1):
        y = sy(10.0 ** e)
        p.append(f'<line x1="{ML}" y1="{y:.1f}" x2="{W - MR}" y2="{y:.1f}" '
                 f'stroke="{GRID}" stroke-width="1"/>')
        p.append(f'<text x="{ML - 8}" y="{y + 4:.1f}" font-size="11" '
                 f'fill="{INK2}" text-anchor="end">1e{e}</text>')
    for xv in fig["xticks"]:
        xx = sx(xv)
        p.append(f'<line x1="{xx:.1f}" y1="{H - MB}" x2="{xx:.1f}" '
                 f'y2="{H - MB + 5}" stroke="{INK2}" stroke-width="1"/>')
        p.append(f'<text x="{xx:.1f}" y="{H - MB + 20}" font-size="11" '
                 f'fill="{INK2}" text-anchor="middle">{xv:g}</text>')
    p.append(f'<text x="{(ML + W - MR) / 2:.0f}" y="{H - 12}" '
             f'font-size="12" fill="{INK2}" text-anchor="middle">'
             f'{fig["xlabel"]}</text>')
    p.append(f'<text x="20" y="{(MT + H - MB) / 2:.0f}" font-size="12" '
             f'fill="{INK2}" text-anchor="middle" '
             f'transform="rotate(-90 20 {(MT + H - MB) / 2:.0f})">'
             f'FER (genie)</text>')

    # series: 2px lines, >=8px markers (r=4), direct end-labels
    label_ys = []
    for name, color, pts in fig["series"]:
        d = " ".join(f'{"M" if i == 0 else "L"}{sx(x):.1f},{sy(f):.1f}'
                     for i, (x, f) in enumerate(pts))
        p.append(f'<path d="{d}" fill="none" stroke="{color}" '
                 f'stroke-width="2"/>')
        for x, f in pts:
            p.append(f'<circle cx="{sx(x):.1f}" cy="{sy(f):.1f}" r="4" '
                     f'fill="{color}" stroke="{SURFACE}" stroke-width="2"/>')
        lx, lf = pts[-1]
        ly = sy(lf) + 4
        while any(abs(ly - y) < 15 for y in label_ys):
            ly += 15
        label_ys.append(ly)
        p.append(f'<circle cx="{sx(lx) + 12:.1f}" cy="{ly - 4:.1f}" r="4" '
                 f'fill="{color}"/>')
        p.append(f'<text x="{sx(lx) + 20:.1f}" y="{ly:.1f}" font-size="12" '
                 f'fill="{INK}">{name}</text>')
    p.append("</svg>")
    return "\n".join(p)


if __name__ == "__main__":
    docs = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "docs")
    for fig in (WMAN, FIVEG, WIFI):
        out = os.path.join(docs, fig["filename"])
        svg = render(fig)
        with open(out, "w") as f:
            f.write(svg)
        print(f"wrote {out} ({len(svg)} bytes)")
