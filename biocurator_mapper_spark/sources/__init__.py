from .catalog import ParquetCatalog
from .obo_json import read_obo_graph

__all__ = ["ParquetCatalog", "read_obo_graph"]
