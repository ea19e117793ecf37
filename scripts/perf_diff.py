#!/usr/bin/env python3
"""Round-over-round diff of PerfAudit artifacts (PERF_r{N}.json).

Wall time on this box is noise (±15% measured r10); jobs and shuffle
bytes are deterministic, so THOSE are the regression signal. Flags any
query whose job count grew, or whose shuffle write grew by more than
10% AND more than 1 MB. New/removed queries are listed informationally.

A +1-job delta with no shuffle growth is NOT flagged as REGRESSED: it
matches the one adjudicated measurement-flicker class (r11's q218, an
AQE broadcast-exchange-reuse race that shifts one query-stage job even
warm) — those print as "FLICKER?" with an isolated-DbgJobs rerun
instruction and do not fail the diff. Anything beyond +-1 job, or +1
job WITH shuffle growth, stays a hard REGRESSED.

Usage: perf_diff.py OLD.json NEW.json
Exit 1 if any regression is flagged (walls and flickers never flag).
"""
import json
import sys


def main():
    if len(sys.argv) != 3:
        print(__doc__)
        return 2
    old = json.load(open(sys.argv[1]))["queries"]
    new = json.load(open(sys.argv[2]))["queries"]
    shared = sorted(set(old) & set(new))
    added = sorted(set(new) - set(old))
    removed = sorted(set(old) - set(new))
    flags = []
    flickers = []
    for q in shared:
        o, n = old[q], new[q]
        dw = n["shuffle_write_mb"] - o["shuffle_write_mb"]
        if n["jobs"] == o["jobs"] + 1 and dw <= 0.01:
            flickers.append(
                f"{q}: jobs {o['jobs']} -> {n['jobs']} (shuffle flat)")
        elif n["jobs"] > o["jobs"]:
            flags.append(f"{q}: jobs {o['jobs']} -> {n['jobs']}")
        if dw > 1.0 and o["shuffle_write_mb"] > 0 and \
                dw / o["shuffle_write_mb"] > 0.10:
            flags.append(
                f"{q}: shuffle_write {o['shuffle_write_mb']} -> "
                f"{n['shuffle_write_mb']} MB")
        elif dw > 1.0 and o["shuffle_write_mb"] == 0:
            flags.append(f"{q}: shuffle_write 0 -> {n['shuffle_write_mb']} MB")
    oj = sum(old[q]["jobs"] for q in shared)
    nj = sum(new[q]["jobs"] for q in shared)
    ow = sum(old[q]["shuffle_write_mb"] for q in shared)
    nw = sum(new[q]["shuffle_write_mb"] for q in shared)
    print(f"shared {len(shared)} queries: jobs {oj} -> {nj}, "
          f"shuffle_write {ow:.1f} -> {nw:.1f} MB")
    improved = [q for q in shared if new[q]["jobs"] < old[q]["jobs"]]
    if improved:
        print(f"improved (fewer jobs): {len(improved)}")
        for q in improved:
            print(f"  {q}: jobs {old[q]['jobs']} -> {new[q]['jobs']}")
    if added:
        print(f"new queries: {', '.join(added)}")
    if removed:
        print(f"removed queries: {', '.join(removed)}")
    if flickers:
        print(f"FLICKER? ({len(flickers)}) — +1 job, shuffle flat: the "
              "adjudicated AQE broadcast-reuse race class. Rerun "
              "'sbt \"runMain graft.tools.DbgJobs <query>\"' twice in "
              "isolation before treating any of these as a regression:")
        for f in flickers:
            print(f"  {f}")
    if flags:
        print(f"REGRESSED ({len(flags)}):")
        for f in flags:
            print(f"  {f}")
        return 1
    if flickers:
        print("OK: no hard regression (flicker candidates above need an "
              "isolated rerun)")
    else:
        print("OK: no query grew in jobs or shuffle bytes")
    return 0


if __name__ == "__main__":
    sys.exit(main())
