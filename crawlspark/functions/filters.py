"""Importer-pipeline filter stages shared by engine and oracle.

From-scratch analogs of the reference's post-fetch filter stages
(core/.../importer/stages/MetadataFiltersStage.java:40-70 and
DocumentFiltersStage.java): filters applied to fetched METADATA
(response headers + reference) or to the DOCUMENT content, with the
include/exclude group semantics of the reference's OnMatch model —
any matching EXCLUDE filter rejects; if any INCLUDE filters exist, at
least one must match.

Filter spec (config-declarative, no closures):
  metadata_filters: ((field, pattern, on_match), ...)
      field in {"url", "last_modified", "etag"}
  document_filters: ((pattern, on_match), ...)  — over the body text
on_match: "include" | "exclude".

Both the python (oracle, and the fused parse UDF for document
filters) and the Column (engine metadata path) implementations live
here so parity is structural.
"""

from __future__ import annotations

import re

from pyspark.sql import functions as F


def filters_reject(values: dict, filters) -> bool:
    """True when the include/exclude group rejects this row."""
    include_seen = False
    include_hit = False
    for spec in filters:
        *key, pattern, on_match = spec
        v = values.get(key[0]) if key else values.get("__content__")
        v = v or ""
        hit = re.search(pattern, v) is not None
        if on_match == "exclude" and hit:
            return True
        if on_match == "include":
            include_seen = True
            include_hit = include_hit or hit
    return include_seen and not include_hit


def content_reject(content: str | None, filters) -> bool:
    """Document filters over the body (DocumentFiltersStage)."""
    return filters_reject(
        {"__content__": content or ""},
        [(p, m) for p, m in filters],
    )


def filters_reject_col(filters):
    """Column equivalent of ``filters_reject`` over named columns."""
    reject = F.lit(False)
    any_inc = None
    for field, pattern, on_match in filters:
        hit = F.coalesce(F.col(field), F.lit("")).rlike(pattern)
        if on_match == "exclude":
            reject = reject | hit
        else:
            any_inc = hit if any_inc is None else (any_inc | hit)
    if any_inc is not None:
        reject = reject | ~any_inc
    return reject
