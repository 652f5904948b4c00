"""Shared BENCH/BASELINE.md section writer for the bench tools.

One copy of the splice logic (review finding: four diverging inline
copies, one of which crashed on a missing file).  Each tool owns
exactly one `## <header>` section and replaces it idempotently; every
other section — curated history tables included — is preserved
byte-for-byte.
"""

from __future__ import annotations

import os


def replace_section(path: str, header: str, md: str) -> None:
    """Replace the section starting at *header* (through the next
    `\\n## ` heading or EOF) with *md*, or append it; creates the file
    if absent.  *md* must itself start with *header*."""
    assert md.startswith(header), "section body must start with its header"
    os.makedirs(os.path.dirname(path), exist_ok=True)
    cur = ""
    if os.path.exists(path):
        with open(path) as f:
            cur = f.read()
    if header in cur:
        start = cur.index(header)
        nxt = cur.find("\n## ", start + len(header))
        if nxt == -1:
            cur = cur[:start] + md
        else:
            cur = cur[:start] + md.rstrip() + "\n\n" + cur[nxt + 1:]
    elif cur:
        cur = cur.rstrip() + "\n\n" + md
    else:
        cur = md
    with open(path, "w") as f:
        f.write(cur)
