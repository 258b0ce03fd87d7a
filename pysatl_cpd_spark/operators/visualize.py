"""E5: CPD result visualization (reference icpd_solver.py:114-173).

The reference draws the scrubbed series with matplotlib, overlaying detected
change points (solid) and expected ones (dashed), and saves to
``<img_path>/<name>.png``. This container has no matplotlib, so the primary
renderer here is a dependency-free SVG writer (hand-assembled markup — the
output is real and testable in any environment); when matplotlib IS
importable a PNG is written alongside, mirroring the reference call.

Visualization is a driver-side, small-sample operation by nature: callers
plot ONE series (or a bounded sample) — at engine scale you filter/limit
first, the same way the reference plots one solver run. Nothing here touches
the distributed path.
"""

from __future__ import annotations

import os
from typing import Iterable, Sequence


def render_series_svg(
    values: Sequence[float],
    detected: Iterable[int] = (),
    expected: Iterable[int] = (),
    title: str = "",
    width: int = 900,
    height: int = 280,
) -> str:
    """SVG document: the series polyline, solid red verticals at detected
    change points, dashed gray verticals at expected ones."""
    vals = [float(v) for v in values]
    n = len(vals)
    pad = 28
    iw, ih = width - 2 * pad, height - 2 * pad
    if n == 0:
        body = ""
    else:
        lo, hi = min(vals), max(vals)
        span = (hi - lo) or 1.0
        xs = [pad + iw * (i / max(n - 1, 1)) for i in range(n)]
        ys = [pad + ih * (1.0 - (v - lo) / span) for v in vals]
        pts = " ".join(f"{x:.2f},{y:.2f}" for x, y in zip(xs, ys))
        body = (
            f'<polyline fill="none" stroke="#1f77b4" stroke-width="1" points="{pts}"/>'
        )
        for cp in expected:
            if 0 <= int(cp) < n:
                x = xs[int(cp)]
                body += (
                    f'<line x1="{x:.2f}" y1="{pad}" x2="{x:.2f}" y2="{height - pad}" '
                    f'stroke="#888888" stroke-dasharray="4 3" class="expected-cp"/>'
                )
        for cp in detected:
            if 0 <= int(cp) < n:
                x = xs[int(cp)]
                body += (
                    f'<line x1="{x:.2f}" y1="{pad}" x2="{x:.2f}" y2="{height - pad}" '
                    f'stroke="#d62728" class="detected-cp"/>'
                )
    label = (
        f'<text x="{pad}" y="{pad - 10}" font-family="monospace" font-size="12">'
        f"{title}</text>"
        if title
        else ""
    )
    return (
        f'<svg xmlns="http://www.w3.org/2000/svg" width="{width}" height="{height}">'
        f'<rect width="100%" height="100%" fill="white"/>{label}{body}</svg>'
    )


def visualize(
    values: Sequence[float],
    img_dir: str,
    name: str,
    detected: Iterable[int] = (),
    expected: Iterable[int] = (),
) -> str:
    """Write ``<img_dir>/<name>.svg`` (always) and ``<name>.png`` when
    matplotlib is importable (reference parity path). Returns the SVG path."""
    os.makedirs(img_dir, exist_ok=True)
    detected = list(detected)
    expected = list(expected)
    svg_path = os.path.join(img_dir, f"{name}.svg")
    with open(svg_path, "w") as fh:
        fh.write(render_series_svg(values, detected, expected, title=name))
    try:  # pragma: no cover - matplotlib not in this container
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        fig, ax = plt.subplots(figsize=(9, 2.8))
        ax.plot(list(values))
        for cp in expected:
            ax.axvline(cp, color="grey", linestyle="--")
        for cp in detected:
            ax.axvline(cp, color="red")
        ax.set_title(name)
        fig.savefig(os.path.join(img_dir, f"{name}.png"), bbox_inches="tight")
        plt.close(fig)
    except ImportError:
        pass
    return svg_path
