"""Device-resident search engine: packed code indexes + simprint engine."""

from iscc_search_tpu.engine.device_index import DeviceHammingIndex, DeviceNphdIndex

__all__ = ["DeviceNphdIndex", "DeviceHammingIndex"]
