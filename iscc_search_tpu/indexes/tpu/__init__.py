from iscc_search_tpu.indexes.tpu.index import TpuIndex
from iscc_search_tpu.indexes.tpu.manager import TpuIndexManager

__all__ = ["TpuIndex", "TpuIndexManager"]
