from iscc_search_tpu.indexes.kv.index import KvIndex
from iscc_search_tpu.indexes.kv.manager import KvIndexManager

__all__ = ["KvIndex", "KvIndexManager"]
