"""SHA-stamped measurement recorder for BENCH_LOCAL-format artifacts.

Every flagship number quoted in PARITY.md / bench.py / commit messages must
come from an entry written by this module, so the artifact trail (value,
git SHA, date, producing script) can never drift from the claim — the
process fix for the round-3 artifact-drift finding (VERDICT.md weak #2).

Usage (from a scale script):

    from record_measurement import record
    record("sparse_scsrev_2Dlap_n1048576_52pairs_f64_cheb", 29.3, "s_warm",
           note="...", script="scripts/scale_sparse.py 10 cheb")

Entries are keyed by ``metric``: re-recording replaces the old entry in
place (order preserved) and stamps fresh provenance.  CLI:

    python scripts/record_measurement.py METRIC VALUE UNIT [NOTE]
"""
import json
import os
import subprocess
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DEFAULT_PATH = os.path.join(_REPO, "BENCH_LOCAL.json")


def _git_sha():
    try:
        out = subprocess.run(
            ["git", "-C", _REPO, "rev-parse", "--short", "HEAD"],
            capture_output=True, text=True, timeout=10)
        sha = out.stdout.strip()
        dirty = subprocess.run(
            ["git", "-C", _REPO, "status", "--porcelain"],
            capture_output=True, text=True, timeout=10).stdout.strip()
        return sha + ("+dirty" if dirty else "") if sha else "unknown"
    except Exception:
        return "unknown"


def record(metric, value, unit, note=None, script=None, extra=None,
           path=DEFAULT_PATH):
    """Append-or-replace one measurement with provenance stamps."""
    entry = {"metric": metric, "value": value, "unit": unit}
    if note:
        entry["note"] = note
    if extra:
        entry.update(extra)
    entry["provenance"] = {
        "sha": _git_sha(),
        "date": time.strftime("%Y-%m-%d %H:%M:%S %Z"),
        "script": script or (sys.argv[0] + " " + " ".join(sys.argv[1:])),
    }
    entries = []
    if os.path.exists(path):
        with open(path) as f:
            entries = json.load(f)
    for i, e in enumerate(entries):
        if e.get("metric") == metric:
            entries[i] = entry
            break
    else:
        entries.append(entry)
    with open(path, "w") as f:
        json.dump(entries, f, indent=2)
        f.write("\n")
    print(f"[record] {metric} = {value} {unit}  "
          f"(sha {entry['provenance']['sha']}) -> {os.path.basename(path)}",
          flush=True)
    return entry


def lookup(metric, path=DEFAULT_PATH):
    """Return the recorded entry for ``metric`` or None."""
    if not os.path.exists(path):
        return None
    with open(path) as f:
        for e in json.load(f):
            if e.get("metric") == metric:
                return e
    return None


if __name__ == "__main__":
    if len(sys.argv) < 4:
        sys.exit(__doc__)
    record(sys.argv[1], float(sys.argv[2]), sys.argv[3],
           note=sys.argv[4] if len(sys.argv) > 4 else None)
