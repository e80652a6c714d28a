from iscc_search_tpu.remote.client import RemoteIndex

__all__ = ["RemoteIndex"]
