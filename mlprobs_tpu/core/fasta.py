"""FASTA reading/writing.

Matches the reference I/O contract: multi-line records are concatenated
(script.py Preprocessing / MultiSequence::LoadMFA), output is wrapped at 60
columns (MultiSequence::WriteMFA default), and the MLProbs Python stages
write 2-line records sorted by header (do_realign.py / seperate_regions.py).
"""
from __future__ import annotations

import io
from pathlib import Path


def parse_fasta(text: str) -> list[tuple[str, str]]:
    """Parse FASTA text into (header, sequence) pairs in file order.

    Headers keep everything after '>' up to end of line; sequence lines are
    concatenated with whitespace/CR stripped.
    """
    records: list[tuple[str, list[str]]] = []
    for line in text.splitlines():
        line = line.strip()
        if not line:
            continue
        if line.startswith(">"):
            records.append((line[1:], []))
        elif records:
            records[-1][1].append(line)
    return [(h, "".join(parts)) for h, parts in records]


def read_fasta(path: str | Path) -> list[tuple[str, str]]:
    return parse_fasta(Path(path).read_text())


def format_fasta(
    records: list[tuple[str, str]], width: int = 60
) -> str:
    """Format records as FASTA; width<=0 disables wrapping."""
    buf = io.StringIO()
    for header, seq in records:
        buf.write(f">{header}\n")
        if width and width > 0:
            for i in range(0, len(seq), width):
                buf.write(seq[i : i + width])
                buf.write("\n")
            if not seq:
                buf.write("\n")
        else:
            buf.write(seq)
            buf.write("\n")
    return buf.getvalue()


def write_fasta(
    path: str | Path, records: list[tuple[str, str]], width: int = 60
) -> None:
    Path(path).write_text(format_fasta(records, width=width))
