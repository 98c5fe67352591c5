"""umi_dedup_spark — a from-scratch PySpark-native near-duplicate detection
and clustering engine.

Re-expresses the query semantics of the reference engine
(``heoly32/umi-dedup``, a single-threaded streaming duplicate marker for
UMI-tagged sequencing reads) as web-scale text dedup over tables of
Common-Crawl-style pages:

* UMI string            -> MinHash signature + 64-bit SimHash fingerprint
* (strand,pos) group    -> LSH band bucket
* Hamming-1 directional
  adjacency + BFS CC    -> directed edge DataFrame + iterative
                           label-propagation connected components
* count-ordered seeding -> best-(count, doc_id)-priority reachable seed
* optical-dup pass      -> exact-hash pass (run *before* near-dup, same
                           ordering as reference lib/markdup_sam.py:165-193)
* count estimators      -> per-cluster histogram estimators (naive /
                           weighted_average / weighted_average2 / poisson)

Everything is DataFrame-first: built-in ``pyspark.sql.functions`` where
possible, Arrow-vectorized pandas UDFs for the fingerprint kernels, no
per-row Python UDFs anywhere.
"""

from umi_dedup_spark.config import DedupConfig

__all__ = ["DedupConfig"]
__version__ = "0.1.0"
