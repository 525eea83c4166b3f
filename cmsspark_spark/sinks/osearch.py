"""OpenSearch index lifecycle + bulk payload shaping (K6).

The reference wraps these behaviors inside a live-cluster client
(osearch/osearch.py:116-217, used by rucio_datasets_monitoring.py:
536-566 and wma_agent_count_to_opensearch.py:103-147). Here every
cluster-independent rule is a pure function — date-suffixed index
naming, index-creation body, null-dropping, chunking, NDJSON bulk
body — so parity is unit-testable without a cluster, and the two
I/O touchpoints (create index, bulk post) are injected callables.

Scale note: ``OpenSearchSink.send_partition`` is designed to run
inside ``foreachPartition`` — per-executor transports, bounded
``batch_size`` chunks, no driver materialization. The reference's
``toLocalIterator`` push remains available through
``sinks.push_documents(executor_side=False)``.
"""

from __future__ import annotations

import json
from datetime import datetime, timezone
from typing import Callable, Iterable, Iterator, Sequence


def index_name(index_template: str, timestamp: float, index_mod: str = "") -> str:
    """Date-suffixed index name (osearch.py:119-139): '' → template,
    'Y' → template-YYYY, 'M' → template-YYYY-MM, 'D' →
    template-YYYY-MM-DD; suffix computed from the doc timestamp
    (epoch seconds) in UTC, truncated to int like the reference."""
    ts = datetime.fromtimestamp(int(timestamp), tz=timezone.utc)
    mod = index_mod.upper()
    if mod == "Y":
        return f"{index_template}-{ts:%Y}"
    if mod == "M":
        return f"{index_template}-{ts:%Y-%m}"
    if mod == "D":
        return f"{index_template}-{ts:%Y-%m-%d}"
    return index_template


def index_schema_body(
    properties: dict,
    shards: int = 1,
    replicas: int = 1,
) -> dict:
    """Index mapping+settings body in the reference's shape
    (osearch.py:21-32's get_index_schema convention): settings carry
    string-typed shard/replica counts, mappings carry the caller's
    field properties verbatim."""
    return {
        "settings": {
            "index": {
                "number_of_shards": str(shards),
                "number_of_replicas": str(replicas),
            }
        },
        "mappings": {"properties": dict(properties)},
    }


def drop_nulls_in_dict(d: dict) -> dict:
    """osearch.py:166-172: None-valued fields make OpenSearch drop the
    whole document; strip them client-side."""
    return {k: v for k, v in d.items() if v is not None}


def to_chunks(data: Sequence, samples: int = 10000) -> Iterator[list]:
    """Fixed-size slices (osearch.py:174-179)."""
    for i in range(0, len(data), samples):
        yield list(data[i : i + samples])


def make_bulk_body(bulk_list: Iterable[dict], metadata: dict | None = None) -> str:
    """NDJSON bulk payload (osearch.py:181-192): each doc preceded by
    an empty ``{"index": {}}`` action line; optional job metadata
    merged into the doc's ``metadata`` sub-dict (setdefault+update,
    so doc-local metadata keys survive unless overridden)."""
    metadata = metadata or {}
    lines = []
    for data in bulk_list:
        if metadata:
            data = dict(data)
            merged = dict(data.get("metadata") or {})
            merged.update(metadata)
            data["metadata"] = merged
        lines.append(json.dumps({"index": {}}))
        lines.append(json.dumps(data))
    return "".join(line + "\n" for line in lines)


class OpenSearchSink:
    """get_or_create + batched bulk send over injected transports.

    ``create_index(name, body_dict)`` is called once per distinct
    index name (the reference's idempotent ``indices.create`` with
    ignore=400 — osearch.py:104-114,141-152); ``bulk_post(name,
    ndjson_body)`` receives each shaped batch and returns the number
    of failed documents (0/None for success), mirroring
    ``send``'s failure accounting (osearch.py:194-217).
    """

    def __init__(
        self,
        index_template: str,
        schema_body: dict,
        create_index: Callable[[str, dict], None],
        bulk_post: Callable[[str, str], int | None],
        index_mod: str = "",
        batch_size: int = 10000,
        drop_nulls: bool = False,
        metadata: dict | None = None,
    ) -> None:
        self.index_template = index_template
        self.schema_body = schema_body
        self.create_index = create_index
        self.bulk_post = bulk_post
        self.index_mod = index_mod
        self.batch_size = batch_size
        self.drop_nulls = drop_nulls
        self.metadata = metadata
        self._known: set[str] = set()

    def get_or_create_index(self, timestamp: float) -> str:
        idx = index_name(self.index_template, timestamp, self.index_mod)
        if idx not in self._known:
            self.create_index(idx, self.schema_body)
            self._known.add(idx)
        return idx

    def send(self, docs: list[dict], timestamp_field: str = "timestamp") -> int:
        """Route docs to their per-date indexes and bulk-post in
        ``batch_size`` chunks; returns total failed-doc count."""
        n_failed = 0
        for chunk in to_chunks(docs, self.batch_size):
            if self.drop_nulls:
                chunk = [drop_nulls_in_dict(d) for d in chunk]
            idx = self.get_or_create_index(chunk[0][timestamp_field])
            body = make_bulk_body(chunk, self.metadata)
            n_failed += self.bulk_post(idx, body) or 0
        return n_failed

    def send_partition(self, rows, timestamp_field: str = "timestamp") -> int:
        """foreachPartition adapter: Spark Rows → dict docs → send."""
        docs = [r.asDict(recursive=True) for r in rows]
        if not docs:
            return 0
        return self.send(docs, timestamp_field)
