"""sparkgatha — a PySpark-native link-graph analytics engine.

A from-scratch rebuild of the query/data-processing capabilities of
JSybrandt/agatha's Dask-based semantic-graph pipeline (see SURVEY.md),
re-expressed as idiomatic Spark DataFrame plans: vectorized pandas/Arrow
UDFs for extraction, join+aggregate supersteps for the iterative graph
algorithms (PageRank, connected components, label propagation, triangle
counting, shortest paths), checkpoint-resumable with per-partition
lineage + convergence metrics, and explicit skew handling.
"""

__version__ = "0.1.0"
