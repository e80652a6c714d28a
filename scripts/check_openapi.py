"""
OpenAPI drift gate: the committed spec must match the code-generated one.

The server builds its OpenAPI 3.1 document from the wire models at runtime
(iscc_search_tpu/server/openapi.py); CI regenerates it and fails when the
committed snapshot (docs/reference/openapi.json) drifts — the same contract
as the reference's "OpenAPI build + validation" CI step
(/root/reference/.github/workflows/ci.yml:33-35).

Usage:
    python scripts/check_openapi.py          # verify (exit 1 on drift)
    python scripts/check_openapi.py --write  # refresh the snapshot
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
SNAPSHOT = REPO / "docs" / "reference" / "openapi.json"


def main(argv):
    # type: (list[str]) -> int
    sys.path.insert(0, str(REPO))
    from iscc_search_tpu.server.openapi import build_openapi

    spec = build_openapi()
    # Structural sanity before any comparison: these break clients outright.
    assert spec.get("openapi", "").startswith("3.1"), "spec must be OpenAPI 3.1"
    assert spec.get("paths"), "spec has no paths"
    for route in ("/indexes", "/indexes/{name}/assets", "/indexes/{name}/search"):
        assert route in spec["paths"], f"missing route: {route}"
    schemas = spec.get("components", {}).get("schemas", {})
    blob = json.dumps(spec)
    for name in schemas:
        ref = f"#/components/schemas/{name}"
        assert ref in blob or name in ("ErrorResponse",), f"unreferenced schema: {name}"

    rendered = json.dumps(spec, indent=2, sort_keys=True) + "\n"
    if "--write" in argv:
        SNAPSHOT.write_text(rendered)
        print(f"wrote {SNAPSHOT} ({len(spec['paths'])} paths, {len(schemas)} schemas)")
        return 0
    if not SNAPSHOT.exists():
        print(f"missing snapshot {SNAPSHOT}; run with --write", file=sys.stderr)
        return 1
    if SNAPSHOT.read_text() != rendered:
        print("OpenAPI drift: generated spec differs from docs/reference/openapi.json.", file=sys.stderr)
        print("Run: python scripts/check_openapi.py --write", file=sys.stderr)
        return 1
    print(f"openapi: in sync ({len(spec['paths'])} paths, {len(schemas)} schemas)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
