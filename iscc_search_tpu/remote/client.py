"""
Remote index client — IsccIndexProtocol over HTTP.

Parity with the reference remote client (remote/client.py:29-279): httpx
client with X-API-Key auth, HTTP status -> exception mapping (404 ->
FileNotFoundError, 409 -> FileExistsError, 400 -> ValueError), chunked batch
adds with exponential-backoff retry on transport errors.
"""

from __future__ import annotations

import time

import httpx

from iscc_search_tpu.schema import IsccAddResult, IsccEntry, IsccIndex, IsccSearchResult
from iscc_search_tpu.utils import get_logger

logger = get_logger(__name__)

__all__ = ["RemoteIndex"]

TRANSIENT_ERRORS = (httpx.TransportError, ConnectionError)
MAX_RETRIES = 3
RETRY_BASE_DELAY = 1.0


class RemoteIndex:
    """HTTP client implementing IsccIndexProtocol against a remote server."""

    def __init__(self, url, index_name, api_key=None, chunk_size=100, timeout=60.0):
        # type: (str, str, str | None, int, float) -> None
        self.url = url.rstrip("/")
        self.index_name = index_name
        self.api_key = api_key
        self.chunk_size = chunk_size
        self.timeout = timeout
        self._client = None  # type: httpx.Client | None

    @property
    def client(self):
        # type: () -> httpx.Client
        if self._client is None:
            headers = {"X-API-Key": self.api_key} if self.api_key else {}
            self._client = httpx.Client(base_url=self.url, headers=headers, timeout=self.timeout)
        return self._client

    def _json(self, response):
        # type: (httpx.Response) -> ...
        """Decode a success response; garbage from the server is a RuntimeError
        (a server fault), never a ValueError (reserved for invalid user input
        by the protocol's exception contract)."""
        try:
            return response.json()
        except Exception as exc:
            raise RuntimeError(f"Invalid JSON response from server: {exc}") from None

    def _raise_for_status(self, response):
        # type: (httpx.Response) -> None
        if response.is_success:
            return
        try:
            detail = response.json().get("detail", response.text)
        except Exception:
            detail = response.text
        if response.status_code == 404:
            raise FileNotFoundError(detail)
        if response.status_code == 409:
            raise FileExistsError(detail)
        if response.status_code in (400, 422):
            raise ValueError(detail)
        raise RuntimeError(f"HTTP {response.status_code}: {detail}")

    def list_indexes(self):
        # type: () -> list[IsccIndex]
        response = self.client.get("/indexes")
        self._raise_for_status(response)
        return [IsccIndex(**i) for i in self._json(response)]

    def create_index(self, index):
        # type: (IsccIndex) -> IsccIndex
        response = self.client.post("/indexes", json={"name": index.name})
        self._raise_for_status(response)
        return IsccIndex(**self._json(response))

    def get_index(self, name):
        # type: (str) -> IsccIndex
        response = self.client.get(f"/indexes/{name}")
        self._raise_for_status(response)
        return IsccIndex(**self._json(response))

    def delete_index(self, name):
        # type: (str) -> None
        response = self.client.delete(f"/indexes/{name}")
        self._raise_for_status(response)

    def add_assets(self, index_name, assets):
        # type: (str, list[IsccEntry]) -> list[IsccAddResult]
        """Chunked batch add (self.chunk_size per request) with retries."""
        if not assets:
            return []
        results = []  # type: list[IsccAddResult]
        for start in range(0, len(assets), self.chunk_size):
            results.extend(self._add_batch(index_name, assets[start : start + self.chunk_size]))
        return results

    def _add_batch(self, index_name, assets):
        # type: (str, list[IsccEntry]) -> list[IsccAddResult]
        payload = [a.model_dump(mode="json", exclude_unset=True) for a in assets]
        last_error = None  # type: Exception | None
        for attempt in range(1, MAX_RETRIES + 1):
            try:
                response = self.client.post(f"/indexes/{index_name}/assets", json=payload)
                self._raise_for_status(response)
                return [IsccAddResult(**r) for r in self._json(response)]
            except TRANSIENT_ERRORS as exc:
                last_error = exc
                if attempt < MAX_RETRIES:
                    delay = RETRY_BASE_DELAY * (2 ** (attempt - 1))
                    logger.warning(
                        f"Batch request failed (attempt {attempt}/{MAX_RETRIES}): {exc}. Retrying in {delay:.0f}s"
                    )
                    time.sleep(delay)
        raise last_error  # type: ignore[misc]

    def get_asset(self, index_name, iscc_id):
        # type: (str, str) -> IsccEntry
        response = self.client.get(f"/indexes/{index_name}/assets/{iscc_id}")
        self._raise_for_status(response)
        return IsccEntry(**self._json(response))

    def search_assets(self, index_name, query, limit=100):
        # type: (str, ..., int) -> IsccSearchResult
        payload = query.model_dump(mode="json", exclude_unset=True)
        response = self.client.post(f"/indexes/{index_name}/search", json=payload, params={"limit": limit})
        self._raise_for_status(response)
        return IsccSearchResult(**self._json(response))

    def close(self):
        # type: () -> None
        if self._client is not None:
            self._client.close()
            self._client = None
            logger.debug(f"Closed remote index client for {self.url}")
