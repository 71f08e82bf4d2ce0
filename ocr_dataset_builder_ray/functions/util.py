"""Small shared utilities (M17 graft)."""

from __future__ import annotations


def humanize_bytes(n: int) -> str:
    """Bytes → '1.2 GB' style string (M17: video/processing.py:258-273
    semantics — powers of 1024, one decimal)."""
    size = float(n)
    for unit in ("B", "KB", "MB", "GB", "TB", "PB"):
        if size < 1024.0 or unit == "PB":
            return f"{size:.1f} {unit}" if unit != "B" else f"{int(size)} B"
        size /= 1024.0
    return f"{size:.1f} PB"
