"""Typed-node keys for the heterogeneous multigraph (SURVEY.md §1/§2.11
G2; VERDICT r3 "missing #5").

Reference analog: AGATHA's multigraph names every node with a
single-char type prefix — ``s:`` sentence, ``l:`` lemma, ``e:`` entity,
``m:`` MeSH, ``n:`` n-gram — via agatha/util/entity_types.py's
``*_TYPE`` constants and ``to_graph_key`` helpers [R?:agatha/util/
entity_types.py], so one edge table can mix node kinds and queries can
filter by kind with a prefix match.  The graft's corpus yields two
kinds: extracted TERMS and embedding-derived SIM nodes (the analog of
the reference's FAISS sentence-kNN side).

All helpers are pure JVM column expressions (prefix concat / split) —
typing a 10^12-edge table is a free projection, and kind filters are
``startswith`` predicates that stay in whole-stage codegen and push
into parquet scans.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

TERM_TYPE = "t"
SIM_TYPE = "v"

_SEP = ":"

#: kinds this graft emits (the reference's set is larger — sentence/
#: lemma/entity/mesh/ngram — but the helpers are kind-agnostic, so new
#: corpus extractors just mint a new single-char constant)
KNOWN_TYPES = (TERM_TYPE, SIM_TYPE)


def typed_key(kind: str, key: str) -> str:
    """Driver-side: ``('t', 'foo') -> 't:foo'``."""
    return f"{kind}{_SEP}{key}"


def typed_key_col(kind: str, col) -> Column:
    """Column-side prefixing: a free concat projection."""
    return F.concat(F.lit(kind + _SEP), F.col(col) if isinstance(col, str) else col)


def node_kind(col) -> Column:
    """Kind of a typed key (the prefix before the first separator);
    untyped legacy keys report the term kind — terms were the only
    unprefixed node kind ever emitted."""
    c = F.col(col) if isinstance(col, str) else col
    head = F.substring_index(c, _SEP, 1)
    return F.when(
        (head != c) & head.isin(*KNOWN_TYPES), head
    ).otherwise(F.lit(TERM_TYPE))


def strip_kind(col) -> Column:
    """Raw key without its type prefix (legacy untyped keys pass
    through unchanged).  Kinds are single-char by convention (as in the
    reference), so a typed key's payload starts at offset 3."""
    c = F.col(col) if isinstance(col, str) else col
    head = F.substring_index(c, _SEP, 1)
    return F.when(
        (head != c) & head.isin(*KNOWN_TYPES),
        F.substring(c, 3, 2_000_000),
    ).otherwise(c)


def is_kind(col, kind: str) -> Column:
    """Prefix predicate — pushes into scans as a startswith filter."""
    c = F.col(col) if isinstance(col, str) else col
    return c.startswith(kind + _SEP)
