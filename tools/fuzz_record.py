"""Shared pass-record writer for the parity fuzz tools.

Mirrors results/tpu_checklist.json: each fuzz tool's ``--record`` appends a
{commit, date, seed, n, families, cases, skips, ties, status} row to
results/fuzz_parity.json (keyed by tool name, newest last, capped), so the
repo carries evidence of WHEN each harness last passed and at which commit
instead of prose tallies alone.
"""

import datetime
import json
import os
import subprocess

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
RECORD_PATH = os.path.join(REPO, "results", "fuzz_parity.json")
_KEEP = 12  # rows retained per tool


def record(tool: str, *, seed: int, n: int, families: str, cases: int,
           skips: int, ties: int, failed: int) -> str:
    try:
        commit = subprocess.run(
            ["git", "rev-parse", "--short", "HEAD"], cwd=REPO,
            capture_output=True, text=True, timeout=10,
        ).stdout.strip() or "unknown"
        dirty = bool(subprocess.run(
            ["git", "status", "--porcelain"], cwd=REPO,
            capture_output=True, text=True, timeout=10,
        ).stdout.strip())
    except Exception:
        commit, dirty = "unknown", False
    row = {
        "commit": commit + ("-dirty" if dirty else ""),
        "date": datetime.datetime.now().isoformat(timespec="seconds"),
        "seed": seed,
        "n": n,
        "families": families,
        "cases": cases,
        "skips": skips,
        "ties": ties,
        "status": "pass" if failed == 0 else f"FAIL({failed})",
    }
    doc = {}
    if os.path.exists(RECORD_PATH):
        with open(RECORD_PATH) as f:
            doc = json.load(f)
    doc.setdefault(tool, []).append(row)
    doc[tool] = doc[tool][-_KEEP:]
    os.makedirs(os.path.dirname(RECORD_PATH), exist_ok=True)
    with open(RECORD_PATH, "w") as f:
        json.dump(doc, f, indent=2)
    return RECORD_PATH
