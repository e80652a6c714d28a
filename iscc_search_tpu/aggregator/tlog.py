"""
C2SP tlog-tiles wire-format helpers (pure, Sans-IO).

Covers the trust-mode subset needed to follow a hub's transparency log
(behavioral parity with reference aggregator/tlog.py): checkpoint tree-size
extraction, uint16-framed entry-bundle decoding, and thousands-grouped tile
path encoding. No Merkle or signature verification — the aggregator trusts
the authoritative hub list plus TLS.
"""

from __future__ import annotations

import re

# Fixed by the tlog-tiles profile (tile height 8): 256 records per full bundle.
TILE_WIDTH = 256

# Canonical decimal: no sign, no leading zeros (except "0" itself).
_TREE_SIZE = re.compile(r"^(?:0|[1-9][0-9]*)$")


def parse_checkpoint(text):
    # type: (str) -> int
    """
    Committed tree size from a C2SP checkpoint body.

    The body is origin / tree-size / root-hash on the first three lines;
    anything after (blank separator, signatures) is irrelevant here.

    :raises ValueError: fewer than three lines, or a size line that is not a
        canonical non-negative decimal (leading zeros and signs rejected)
    """
    lines = text.splitlines()
    if len(lines) < 3:
        raise ValueError(f"checkpoint body needs 3 lines, got {len(lines)}")
    if not _TREE_SIZE.match(lines[1]):
        raise ValueError(f"checkpoint tree size {lines[1]!r} is not a canonical decimal")
    return int(lines[1])


def iter_records(data):
    # type: (bytes) -> ...
    """
    Yield records from entry-bundle bytes.

    Frame format: big-endian uint16 length, then that many body bytes,
    repeated to the end of the buffer with no trailer.

    :raises ValueError: buffer ends inside a length prefix or a body
    """
    view = memoryview(data)
    pos = 0
    while pos < len(view):
        body_start = pos + 2
        if body_start > len(view):
            raise ValueError(f"entry bundle cut short inside length prefix at byte {pos}")
        body_end = body_start + int.from_bytes(view[pos:body_start], "big")
        if body_end > len(view):
            raise ValueError(f"entry bundle cut short inside record body at byte {body_start}")
        yield bytes(view[body_start:body_end])
        pos = body_end


def parse_entry_bundle(data):
    # type: (bytes) -> list[bytes]
    """All records of an entry bundle as a list (see :func:`iter_records`)."""
    return list(iter_records(data))


def format_index(n):
    # type: (int) -> str
    """
    Thousands-grouped tile path form of a tile/bundle index.

    The decimal digits are zero-padded to a multiple of three, split in
    groups of three, all but the last group prefixed with "x", and the
    groups slash-joined: 1234067 -> "x001/x234/067".
    """
    digits = str(n)
    digits = "0" * (-len(digits) % 3) + digits
    groups = [digits[i : i + 3] for i in range(0, len(digits), 3)]
    return "/".join([f"x{g}" for g in groups[:-1]] + groups[-1:])


def entries_path(index, width=0):
    # type: (int, int) -> str
    """
    Entry-bundle path relative to ``/log/``.

    Full bundles are ``tile/entries/<grouped-index>``; the in-progress
    partial bundle carries a ``.p/<width>`` suffix.
    """
    path = f"tile/entries/{format_index(index)}"
    if width:
        path += f".p/{width}"
    return path
