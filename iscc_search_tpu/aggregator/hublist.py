"""
Authoritative hub-list loading for the IDP aggregator.

Behavioral parity with reference aggregator/hublist.py: the {network}.yaml
document names the hubs of one network; only entries flagged active are
polled. Parsing is pure; the async fetch shell accepts http(s) URLs or local
file paths (the latter mainly for tests and air-gapped deploys).
"""

from __future__ import annotations

from dataclasses import dataclass
from pathlib import Path

import yaml


@dataclass(frozen=True)
class Hub:
    """One pollable hub from the authoritative list."""

    hub_id: int
    url: str


def parse_hub_list(data, network):
    # type: (bytes | str, str) -> list[Hub]
    """
    Active hubs from hub-list YAML ({version, network, hubs: [...]}).

    :raises ValueError: document is not a mapping, or names another network
    """
    doc = yaml.safe_load(data)
    if not isinstance(doc, dict):
        raise ValueError("hub list document must be a YAML mapping")
    declared = doc.get("network")
    if declared != network:
        raise ValueError(f"hub list is for network {declared!r}, this deployment polls {network!r}")
    return [
        Hub(hub_id=item["hub_id"], url=item["url"])
        for item in (doc.get("hubs") or ())
        if item.get("active")
    ]


async def fetch_hub_list(source, network, client):
    # type: (str, str, ...) -> list[Hub]
    """Load and parse the hub list from an http(s) URL or a local path."""
    scheme = source.split("://", 1)[0] if "://" in source else ""
    if scheme in ("http", "https"):
        response = await client.get(source)
        response.raise_for_status()
        text = response.text
    else:
        text = Path(source).read_text(encoding="utf-8")
    return parse_hub_list(text, network)
