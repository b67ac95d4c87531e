"""biocurator_mapper_spark — a PySpark-native knowledge-graph construction engine.

A from-scratch re-expression of the query/data-processing capabilities of the
reference service ``alliance-genome/biocurator_mapper`` (free-text passage →
best-matching ontology CURIE) as a distributed triple factory over
Common-Crawl-style web-page tables:

    pages(url, warc_ts, html, text, lang)
      → html→text extraction            (vectorized Arrow UDF)
      → mention detection               (broadcast Aho-Corasick dictionary scan)
      → candidate scoring               (cached embeddings + broadcast top-k matmul)
      → rerank to a single best match   (deterministic stub / pluggable LLM adapter)
      → canonicalization                (connected components over the alias graph)
      → triples(subj, pred, obj, ...)   (partitioned writes + lineage/metrics rows)

Everything is declared with the DataFrame API so Catalyst handles predicate
pushdown, column pruning, broadcast-join selection and AQE; Python only runs
inside Arrow-batched pandas UDFs (never per-row).
"""

__version__ = "0.1.0"
