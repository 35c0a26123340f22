"""Shared CLI guards for the sweep tools.

Round 6's plan-sweep artifact was destroyed by invoking the sweep with
``--help`` as the sf_dir argument: the run recorded ``sf_dir='--help'``,
274 PATH_NOT_FOUND errors, and silently overwrote the committed round
artifact (ADVICE r11, high).  Two guards remove the failure class:

- :func:`validate_sf_dir` rejects option-looking arguments and paths
  that do not contain parquet tables, before any Spark work starts.
- :func:`guard_artifact_overwrite` refuses to replace an existing round
  artifact when the new result is mostly errors — a broken run must
  never destroy a good historical record.
"""
from __future__ import annotations

import glob
import os
import sys


def validate_sf_dir(path: str) -> str:
    """Exit loudly unless *path* looks like a real scale-factor dir."""
    if path.startswith("-"):
        sys.exit(
            f"refusing sf_dir {path!r}: looks like a CLI option, not a "
            "data directory (pass the scale-factor dir as the first "
            "positional argument)"
        )
    if not os.path.isdir(path):
        sys.exit(f"refusing sf_dir {path!r}: not a directory")
    if not glob.glob(os.path.join(path, "*.parquet")):
        sys.exit(f"refusing sf_dir {path!r}: contains no *.parquet tables")
    return path


def guard_artifact_overwrite(
    out_path: str, total: int, errors: int, max_error_fraction: float = 0.5
) -> None:
    """Refuse to overwrite an existing artifact with a mostly-broken run.

    Call immediately before writing *out_path*.  A run whose error count
    exceeds ``max_error_fraction`` of its total queries is presumed to be
    an operator mistake (bad sf_dir, missing env); it exits non-zero and
    leaves any existing artifact untouched.  Writing a first-time
    artifact is always allowed so genuine failures still get recorded
    somewhere.
    """
    if not os.path.exists(out_path):
        return
    if total > 0 and errors / total > max_error_fraction:
        sys.exit(
            f"refusing to overwrite {out_path}: new result has "
            f"{errors}/{total} errors (> {max_error_fraction:.0%}) — the "
            "run looks broken; existing artifact preserved"
        )
