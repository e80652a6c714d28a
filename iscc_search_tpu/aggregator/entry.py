"""
Log-record -> IsccEntry conversion (pure, Sans-IO).

Parity with reference aggregator/entry.py: discriminate on pinned
``note.$schema`` URIs, convert declarations to IsccEntry upserts (longest unit
per unit-type, 256-bit INSTANCE derived from the datahash, gateway
URI-template expansion), classify skips with a fixed reason vocabulary, and
never raise (forward-compatibility rule: unknown note types are skipped).
"""

from __future__ import annotations

import json

from iscc_search_tpu import codec as ic
from iscc_search_tpu.aggregator import NETWORKS
from iscc_search_tpu.indexes.common import validate_iscc_id
from iscc_search_tpu.models import IsccCode, IsccID, IsccUnit
from iscc_search_tpu.schema import IsccEntry

# Pinned schema URIs — matched exactly, never semver-wildcarded.
DECLARATION_SCHEMA = "http://purl.org/iscc/schema/iscc-note-0.8.0.json"
DELETION_SCHEMA = "http://purl.org/iscc/schema/iscc-note-delete-0.8.0.json"

# Skip-reason vocabulary ("ok" = converted).
REASONS = ("ok", "deletion", "unknown_schema", "malformed", "realm_mismatch")


def expand_gateway(template, iscc_id, iscc_code, datahash):
    # type: (str, str, str, str) -> str
    """
    Expand IDP gateway URI-template variables to a concrete URL.

    {iscc_id}/{iscc_code} substitute the lowercase prefix-less base32 body,
    {datahash} the lowercase hex multihash; the {/var} and {.var} operator
    forms expand to "/value" and ".value". Plain URLs pass through.
    """
    values = {
        "iscc_id": iscc_id.removeprefix("ISCC:").lower(),
        "iscc_code": iscc_code.removeprefix("ISCC:").lower(),
        "datahash": datahash,
    }
    for var, value in values.items():
        template = template.replace("{" + var + "}", value)
        template = template.replace("{/" + var + "}", "/" + value)
        template = template.replace("{." + var + "}", "." + value)
    return template


def record_to_entry(record, network):
    # type: (bytes, str) -> tuple[IsccEntry | None, str]
    """
    Convert one log record to an IsccEntry, classifying skips.

    Declarations index one unit per unit-type keeping the longest form
    (note.units carry expansions; INSTANCE derives from note.datahash). The
    optional gateway becomes the only metadata field.

    :return: (entry, "ok") or (None, reason)
    """
    try:
        parsed = json.loads(record)
        note = parsed["note"]
        note_schema = note["$schema"]
    except (ValueError, KeyError, TypeError):
        return None, "malformed"
    if note_schema == DELETION_SCHEMA:
        return None, "deletion"
    if note_schema != DECLARATION_SCHEMA:
        return None, "unknown_schema"
    try:
        iscc_id = parsed["iscc_id"]
        validate_iscc_id(iscc_id)
        if IsccID(iscc_id).realm_id != NETWORKS[network]["realm"]:
            return None, "realm_mismatch"
        iscc_code = note["iscc_code"]
        instance = "ISCC:" + ic.encode_component(
            ic.MT.INSTANCE, ic.ST.NONE, ic.VS.V0, 256, bytes.fromhex(note["datahash"][4:])
        )
        candidates = [str(u) for u in IsccCode(iscc_code).units] + list(note.get("units", [])) + [instance]
        longest = {}  # type: dict[str, IsccUnit]
        for unit_str in candidates:
            unit = IsccUnit(unit_str)
            prev = longest.get(unit.unit_type)
            if prev is None or len(unit.body) > len(prev.body):
                longest[unit.unit_type] = unit
        units = [str(u) for u in longest.values()]
        metadata = None
        if note.get("gateway"):
            metadata = {"gateway": expand_gateway(note["gateway"], iscc_id, iscc_code, note["datahash"])}
        entry = IsccEntry(iscc_id=iscc_id, iscc_code=iscc_code, units=units, metadata=metadata)
    except Exception:
        return None, "malformed"
    return entry, "ok"
