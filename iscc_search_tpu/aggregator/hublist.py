"""
Hub-list loading for the IDP aggregator (pure parse + thin I/O shell).

Parity with reference aggregator/hublist.py: parse the authoritative
{network}.yaml and return active hubs; load from http(s) URL or local path.
"""

from __future__ import annotations

from dataclasses import dataclass
from pathlib import Path

import yaml


@dataclass(frozen=True)
class Hub:
    """Active hub entry from the authoritative hub list."""

    hub_id: int
    url: str


def parse_hub_list(data, network):
    # type: (bytes | str, str) -> list[Hub]
    """
    Parse hub-list YAML ({version, network, hubs: [...]}) to active hubs.

    :raises ValueError: non-mapping YAML or network mismatch
    """
    parsed = yaml.safe_load(data)
    if not isinstance(parsed, dict):
        raise ValueError("hub list is not a mapping")
    if parsed.get("network") != network:
        raise ValueError(f"hub list network mismatch: expected {network}, got {parsed.get('network')}")
    hubs = parsed.get("hubs") or []
    return [Hub(hub_id=hub["hub_id"], url=hub["url"]) for hub in hubs if hub.get("active")]


async def fetch_hub_list(source, network, client):
    # type: (str, str, ...) -> list[Hub]
    """Fetch from http(s) or read a local file path, then parse."""
    if source.startswith(("http://", "https://")):
        response = await client.get(source)
        response.raise_for_status()
        data = response.text
    else:
        data = Path(source).read_text(encoding="utf-8")
    return parse_hub_list(data, network)
