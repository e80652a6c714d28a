"""
Log-record -> IsccEntry conversion (pure, Sans-IO).

Behavioral parity with reference aggregator/entry.py: records discriminate on
pinned ``note.$schema`` URIs; declarations become IsccEntry upserts carrying
the widest available unit per unit-type (note.units may hold expansions, and
INSTANCE always re-derives at 256 bits from note.datahash) plus an expanded
gateway URL as the only metadata. Conversion never raises: every failure maps
to a skip reason, and unknown note types are skipped for forward
compatibility.
"""

from __future__ import annotations

import json
import re

from iscc_search_tpu import codec as ic
from iscc_search_tpu.aggregator import NETWORKS
from iscc_search_tpu.indexes.common import parse_iscc_id
from iscc_search_tpu.models import IsccCode, IsccUnit
from iscc_search_tpu.schema import IsccEntry

# Pinned schema URIs — matched exactly, never semver-wildcarded.
DECLARATION_SCHEMA = "http://purl.org/iscc/schema/iscc-note-0.8.0.json"
DELETION_SCHEMA = "http://purl.org/iscc/schema/iscc-note-delete-0.8.0.json"

# Skip-reason vocabulary ("ok" = converted).
REASONS = ("ok", "deletion", "unknown_schema", "malformed", "realm_mismatch")


class _Skip(Exception):
    """Internal control flow: abandon conversion with a classified reason."""

    def __init__(self, reason):
        # type: (str) -> None
        self.reason = reason


# RFC 6570 level-3 subset used by IDP gateway templates: simple, "/" and "."
# operator forms of the three known variables.
_TEMPLATE_VAR = re.compile(r"\{([/.]?)(iscc_id|iscc_code|datahash)\}")


def expand_gateway(template, iscc_id, iscc_code, datahash):
    # type: (str, str, str, str) -> str
    """
    Expand an IDP gateway URI template to a concrete URL.

    ``{iscc_id}``/``{iscc_code}`` substitute the lowercase prefix-less base32
    body, ``{datahash}`` the lowercase hex multihash; ``{/var}`` and
    ``{.var}`` prepend the operator character. Plain URLs pass through.
    """
    values = {
        "iscc_id": iscc_id.removeprefix("ISCC:").lower(),
        "iscc_code": iscc_code.removeprefix("ISCC:").lower(),
        "datahash": datahash,
    }

    def substitute(match):
        operator, name = match.groups()
        return operator + values[name]

    return _TEMPLATE_VAR.sub(substitute, template)


def _instance_from_datahash(datahash):
    # type: (str) -> IsccUnit
    """Full-width INSTANCE unit from the note's multihash.

    Built directly from digest bytes — same result as the reference's
    ``ic.encode_component(..., 256, ...)`` text round-trip (entry.py:92)
    without encoding to base32 only to re-decode in :func:`_widest_per_type`.
    """
    digest = bytes.fromhex(datahash)[2:]  # strip the 2-byte multihash prefix
    if len(digest) < 32:
        raise ValueError(f"datahash digest too short: {len(digest)} bytes < 32")
    header = ic.encode_header(ic.MT.INSTANCE, ic.ST.NONE, ic.VS.V0, ic.encode_length(ic.MT.INSTANCE, 256))
    return IsccUnit(header + digest[:32])


def _widest_per_type(units):
    # type: (list[IsccUnit | str]) -> list[str]
    """One unit per unit-type, keeping the longest body (first wins ties).

    Accepts ready ``IsccUnit`` objects alongside canonical strings so callers
    that already hold decoded units (code decomposition, datahash INSTANCE)
    skip a base32 encode/decode round-trip per unit.
    """
    best = {}  # type: dict[str, IsccUnit]
    for item in units:
        unit = item if isinstance(item, IsccUnit) else IsccUnit(item)
        incumbent = best.get(unit.unit_type)
        if incumbent is None or len(unit.body) > len(incumbent.body):
            best[unit.unit_type] = unit
    return [str(unit) for unit in best.values()]


def _declaration_to_fields(doc, note, network):
    # type: (dict, dict, str) -> tuple
    iscc_id = doc["iscc_id"]
    # One parse covers format validation AND the realm check (the reference
    # validates then re-decodes; parse_iscc_id exists to fuse those).
    if parse_iscc_id(iscc_id).realm_id != NETWORKS[network]["realm"]:
        raise _Skip("realm_mismatch")
    iscc_code = note["iscc_code"]
    datahash = note["datahash"]
    candidates = (
        list(IsccCode(iscc_code).units)
        + list(note.get("units", []))
        + [_instance_from_datahash(datahash)]
    )
    gateway = note.get("gateway")
    metadata = {"gateway": expand_gateway(gateway, iscc_id, iscc_code, datahash)} if gateway else None
    return iscc_id, iscc_code, _widest_per_type(candidates), metadata


def record_to_fields(record, network):
    # type: (bytes, str) -> tuple[tuple | None, str]
    """
    Convert one log record to primitive IsccEntry fields, classifying skips.

    The primitive form ``(iscc_id, iscc_code, units, metadata)`` is cheap to
    pickle across a conversion-worker process boundary; :func:`record_to_entry`
    wraps it into the pydantic wire model.

    :return: (fields, "ok") or (None, reason) with reason from :data:`REASONS`
    """
    try:
        doc = json.loads(record)
        note = doc["note"]
        schema = note["$schema"]
    except (ValueError, KeyError, TypeError):
        return None, "malformed"
    try:
        if schema == DELETION_SCHEMA:
            raise _Skip("deletion")
        if schema != DECLARATION_SCHEMA:
            raise _Skip("unknown_schema")
        return _declaration_to_fields(doc, note, network), "ok"
    except _Skip as skip:
        return None, skip.reason
    except Exception:
        return None, "malformed"


def record_to_entry(record, network):
    # type: (bytes, str) -> tuple[IsccEntry | None, str]
    """
    Convert one log record to an IsccEntry, classifying skips.

    :return: (entry, "ok") or (None, reason) with reason from :data:`REASONS`
    """
    fields, reason = record_to_fields(record, network)
    if fields is None:
        return None, reason
    try:
        return entry_from_fields(fields), "ok"
    except Exception:
        # Wire-model validation rejects (e.g. a code decomposing to a single
        # unit, below IsccEntry's units min_length): a skip, never a raise.
        return None, "malformed"


def entry_from_fields(fields):
    # type: (tuple) -> IsccEntry
    """Wire model from the primitive fields of :func:`record_to_fields`."""
    iscc_id, iscc_code, units, metadata = fields
    return IsccEntry(iscc_id=iscc_id, iscc_code=iscc_code, units=units, metadata=metadata)


def convert_group(records, skip, network):
    # type: (list[bytes], int, str) -> tuple[list[tuple], dict]
    """
    Convert one bundle group's records (past the cursor) to primitive fields.

    Top-level and primitive-typed on both sides so it can run in a spawned
    conversion-worker process (poller pipeline) as well as inline.

    :return: (fields list, per-reason tally dict)
    """
    tally = dict.fromkeys(REASONS, 0)
    out = []
    for record in records[skip:]:
        fields, reason = record_to_fields(record, network)
        tally[reason] += 1
        if fields is not None:
            out.append(fields)
    return out, tally
