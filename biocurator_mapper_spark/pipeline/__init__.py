from .triples import build_triples, TriplesPipeline

__all__ = ["build_triples", "TriplesPipeline"]
