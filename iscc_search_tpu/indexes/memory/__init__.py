from iscc_search_tpu.indexes.memory.index import MemoryIndex

__all__ = ["MemoryIndex"]
