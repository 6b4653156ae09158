"""Round-start evidence bookkeeping (CLAUDE.md: the driver grades only
the FIRST 50 entries of queries(); DRIVER_EVIDENCE routes un-evidenced
queries to the front).

Run at the START of each round, before adding queries:

    python scripts/update_evidence.py CORRECTNESS_r03.json

Prints the names that became hash-green in that file and are NOT yet
in __spark_entry__.DRIVER_EVIDENCE — paste them into the set — plus
the resulting window headroom. Refuses names whose row was not a full
hash pass (rows-only / failed rows must NOT enter the evidence set).
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry


def greens(path: str) -> set[str]:
    rows = json.load(open(path))
    out = set()
    for name, row in rows.items():
        ok = (
            isinstance(row, dict)
            and row.get("rows_match")
            and row.get("schema_match")
            and row.get("hash_match")
        )
        if ok:
            out.add(name)
    return out


def main() -> int:
    if len(sys.argv) < 2:
        print(__doc__)
        return 2
    fresh: set[str] = set()
    for path in sys.argv[1:]:
        fresh |= greens(path)
    known = set(entry.DRIVER_EVIDENCE)
    new = sorted(fresh - known)
    total = len(entry.queries())
    print(f"# hash-green and not yet in DRIVER_EVIDENCE ({len(new)}):")
    for chunk_start in range(0, len(new), 3):
        row = ", ".join(f'"{n}"' for n in new[chunk_start : chunk_start + 3])
        print(f"    {row},")
    after = len(known | fresh)
    print(f"# after pasting: {after} evidenced / {total} total "
          f"-> window headroom for {50 - (total - after)} new queries")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
