"""
C2SP tlog-tiles wire-format helpers (pure, Sans-IO).

Implements the trust-mode subset needed to follow a hub's transparency log
(behavioral parity with reference aggregator/tlog.py): checkpoint tree-size
parsing, uint16-framed entry-bundle decoding, and thousands-grouped tile path
encoding. No Merkle or signature verification — the aggregator trusts the
authoritative hub list plus TLS.
"""

from __future__ import annotations

import struct

# Fixed by the tlog-tiles profile (tile height 8): 256 records per full bundle.
TILE_WIDTH = 256


def parse_checkpoint(text):
    # type: (str) -> int
    """
    Extract the committed tree size from a C2SP checkpoint body.

    Body = three newline-terminated lines (origin, decimal tree size, root
    hash); signature lines after the body are ignored.

    :raises ValueError: malformed body, non-integer or zero-padded size
    """
    lines = text.split("\n")
    if len(lines) < 3:
        raise ValueError("checkpoint body has too few lines")
    size_line = lines[1]
    try:
        tree_size = int(size_line)
    except ValueError:
        raise ValueError("checkpoint tree size is not an integer") from None
    if tree_size < 0 or (size_line != "0" and size_line.startswith("0")):
        raise ValueError("checkpoint tree size has leading zeros or is negative")
    return tree_size


def parse_entry_bundle(data):
    # type: (bytes) -> list[bytes]
    """
    Split entry-bundle bytes into records.

    Each record is framed as a big-endian uint16 length prefix + body,
    concatenated without a trailer.

    :raises ValueError: truncated frame
    """
    records = []
    offset = 0
    total = len(data)
    while offset < total:
        if offset + 2 > total:
            raise ValueError("entry bundle truncated in length prefix")
        (length,) = struct.unpack_from(">H", data, offset)
        offset += 2
        if offset + length > total:
            raise ValueError("entry bundle truncated in record body")
        records.append(data[offset : offset + length])
        offset += length
    return records


def format_index(n):
    # type: (int) -> str
    """
    Thousands-grouped tile path form: digits grouped in threes from the least
    significant end, each zero-padded to 3, non-terminal groups x-prefixed
    and slash-joined (1234067 -> "x001/x234/067").
    """
    segment = f"{n % 1000:03d}"
    n //= 1000
    while n > 0:
        segment = f"x{n % 1000:03d}/{segment}"
        n //= 1000
    return segment


def entries_path(index, width=0):
    # type: (int, int) -> str
    """Entry-bundle path relative to /log/: tile/entries/<N>[.p/<W>]."""
    suffix = f".p/{width}" if width else ""
    return f"tile/entries/{format_index(index)}{suffix}"
