"""Shared test-font discovery (one place instead of per-file copies).

Finds matplotlib's bundled DejaVuSans like vgtpu.scenes.demo_ui does —
a glob, not a hardcoded cache hash, so it survives uv-cache relayouts.
FONT_PATH/FONT_DATA are None when no font exists; tests that need text
must skip (not silently drop their text arm).
"""

from __future__ import annotations

import glob
from pathlib import Path

_candidates = glob.glob(
    "/root/.cache/uv/**/mpl-data/fonts/ttf/DejaVuSans.ttf", recursive=True
) or glob.glob("/opt/venv/**/mpl-data/fonts/ttf/DejaVuSans.ttf", recursive=True)

FONT_PATH: Path | None = Path(_candidates[0]) if _candidates else None
FONT_DATA: bytes | None = FONT_PATH.read_bytes() if FONT_PATH else None
