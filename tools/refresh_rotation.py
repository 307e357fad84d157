"""Regenerate the driver-window rotation table from the committed
CORRECTNESS artifacts — the once-per-round maintenance step the window
rotation needs (CLAUDE.md invariant).

After the driver commits CORRECTNESS_r0N.json, run:

    python tools/refresh_rotation.py          # prints the new table
    python tools/refresh_rotation.py --write  # patches __spark_entry__.py

It recomputes each non-pinned query's last HASH-green round (rows-only
greens do not count), prints the LAST_HASH_GREEN dict literal grouped
by round, and with --write splices it (plus the bumped
WINDOW_AS_OF_ROUND) into __spark_entry__.py between the AUTOGEN
markers. `tests/test_driver_contract.py` then re-verifies the table
against the artifacts, so a bad refresh fails a test, not a round.
"""

from __future__ import annotations

import json
import re
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(ROOT))


def compute(max_round: int) -> dict[str, int]:
    last: dict[str, int] = {}
    for rnd in range(1, max_round + 1):
        path = ROOT / f"CORRECTNESS_r0{rnd}.json"
        if not path.exists():
            continue
        for q, v in json.loads(path.read_text()).items():
            if v.get("hash_match"):
                last[q] = rnd
    return last


def main() -> None:
    import __spark_entry__ as entrymod

    rounds = sorted(
        int(m.group(1))
        for p in ROOT.glob("CORRECTNESS_r0*.json")
        if (m := re.search(r"r0(\d+)", p.name))
    )
    max_round = rounds[-1]
    pinned = set(entrymod.WINDOW_PINNED)
    known = set(entrymod.queries())
    last = {
        q: r
        for q, r in compute(max_round).items()
        if q not in pinned and q in known
    }
    lines = [f"WINDOW_AS_OF_ROUND = {max_round}", "LAST_HASH_GREEN = {"]
    for rnd in sorted(set(last.values())):
        lines.append(f"    # last hash-green in round {rnd}")
        for q in sorted(k for k, v in last.items() if v == rnd):
            lines.append(f'    "{q}": {rnd},')
    lines.append("}")
    body = "\n".join(lines)
    print(body)
    never = sorted(known - pinned - set(last))
    if never:
        print(f"# never hash-green (enter the window automatically): {never}")
    if "--write" in sys.argv:
        src_path = ROOT / "__spark_entry__.py"
        src = src_path.read_text()
        pat = re.compile(
            r"WINDOW_AS_OF_ROUND = \d+\nLAST_HASH_GREEN = \{.*?\n\}",
            re.DOTALL,
        )
        if not pat.search(src):
            raise SystemExit("could not locate the rotation table to replace")
        src_path.write_text(pat.sub(body, src, count=1))
        print(f"\n# wrote {src_path} (as of round {max_round})")


if __name__ == "__main__":
    main()
