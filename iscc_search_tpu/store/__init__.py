"""Host-side persistent storage (C++ tructstore + ctypes binding)."""

from iscc_search_tpu.store.kv import HostStore

__all__ = ["HostStore"]
