"""Pure-HTTP Elasticsearch bulk sink — the connector-free write path.

The `es` sink branch (pipeline.write_sink) builds the production
elasticsearch-hadoop writer, which cannot execute here (no connector
jar, no cluster). This module speaks the public ES REST bulk protocol
directly — NDJSON ``{"index": {...}}`` action lines POSTed to
``/_bulk`` — so the semantics the reference tool actually lives on
(document identity via the id column, full sync = delete + recreate
index vs incremental append, chunked bulk batches) are EXECUTABLE and
verified against a real HTTP round-trip in tests/test_es_sink.py.

Scale posture: the driver issues only O(1) index-lifecycle calls
(DELETE / PUT / _refresh); every document flows executor-side through
``foreachPartition``, one POST per ``batch_entries`` chunk, so sink
throughput scales with executors exactly like the connector's.
Transient back-pressure (HTTP 429 bulk-queue rejection, 503) retries
the same chunk in place with exponential backoff (the es-hadoop
``es.batch.write.retry.count``/``.wait`` analogue); a permanent
failure or exhausted retries raises, failing the Spark task. Task/job
retry then gives at-least-once delivery, which the ``_id`` mapping
upgrades to effectively-once (same ``_id`` re-index = replace — the
es-hadoop "upsert" analogue): re-delivered chunks overwrite their own
documents, proven by tests/test_es_sink.py's mid-stream-failure
replay. Rows never touch the driver.
"""

from __future__ import annotations

import base64
import datetime
import decimal
import json

from pyspark.sql import DataFrame

_NDJSON = "application/x-ndjson"
_JSON = "application/json"

# Fields ES (>=6.x) treats as document metadata: none may appear in a
# bulk source body ("Field [...] is a metadata field and cannot be
# added inside a document").
_ES_METADATA_FIELDS = frozenset(
    {"_id", "_index", "_type", "_routing", "_version", "_version_type", "_source"}
)


def _jsonable(v):
    """JSON encoder default for Spark row values: ISO dates, float
    decimals, base64 binary — the same surface the connector maps."""
    if isinstance(v, (datetime.datetime, datetime.date)):
        return v.isoformat()
    if isinstance(v, decimal.Decimal):
        return float(v)
    if isinstance(v, (bytes, bytearray)):
        return base64.b64encode(bytes(v)).decode("ascii")
    raise TypeError(f"not JSON-serializable: {type(v).__name__}")


def _http(
    method: str,
    url: str,
    body: bytes | None = None,
    *,
    content_type: str = _JSON,
    timeout: float = 30.0,
    ignore: tuple[int, ...] = (),
) -> tuple[int, bytes]:
    """One stdlib HTTP call. Raises on HTTP errors except `ignore`d
    status codes (DELETE of a missing index is a normal first run)."""
    import urllib.error
    import urllib.request

    req = urllib.request.Request(
        url, data=body, method=method, headers={"Content-Type": content_type}
    )
    try:
        with urllib.request.urlopen(req, timeout=timeout) as r:
            return r.status, r.read()
    except urllib.error.HTTPError as e:
        if e.code in ignore:
            return e.code, e.read()
        raise


# HTTP statuses ES sends for TRANSIENT pressure: 429 = bulk queue
# rejection (the back-pressure signal), 503 = shard/cluster not ready.
# Both mean "same request, later" — the es-hadoop writer retries them
# (es.batch.write.retry.count / .wait); anything else is permanent.
_RETRYABLE_STATUSES = (429, 503)


def _post_bulk(
    es_url: str,
    lines: list[str],
    timeout: float,
    max_retries: int = 4,
    retry_backoff_s: float = 0.5,
) -> None:
    """POST one chunk (a flat [action, doc, action, doc, ...] line
    list) to /_bulk and fail LOUDLY on per-item errors: ES returns 200
    with {"errors": true} when individual actions fail, and a sink
    that swallows that ships silent data loss.

    Back-pressure comes in TWO shapes, and both back off exponentially
    (retry_backoff_s * 2^k) up to max_retries times:

    - whole-request HTTP 429/503 (coordinating node refused the bulk
      before indexing anything) — re-POST the SAME chunk;
    - HTTP 200 with ``errors: true`` where EVERY failed item carries
      status 429 — the per-item ``es_rejected_execution_exception``
      form real ES uses when the bulk queue overflows MID-request:
      some actions were indexed, the rejected ones were not. Here the
      retry body is rebuilt from the REJECTED positions only (the
      response ``items`` array is one entry per action, in request
      order — the public bulk-API contract). Re-sending accepted items
      would duplicate them whenever no ``_id`` mapping exists (ES
      auto-generates a fresh _id per index action), so partial retry
      is the only shape that is safe for keyless sinks; with _ids it
      is also strictly less write amplification.

    Any non-retryable item error raises immediately; retries exhausted
    -> raise -> the Spark task fails, same as any permanent error."""
    import time

    def _sleep_or_raise(attempt: int, what: str) -> None:
        if attempt >= max_retries:
            raise RuntimeError(
                f"bulk rejected with {what} after {attempt + 1} attempts "
                "(back-pressure did not clear)"
            )
        time.sleep(retry_backoff_s * (2**attempt))

    attempt = 0
    while True:
        status, resp = _http(
            "POST",
            f"{es_url}/_bulk",
            ("\n".join(lines) + "\n").encode(),
            content_type=_NDJSON,
            timeout=timeout,
            ignore=_RETRYABLE_STATUSES,
        )
        if status in _RETRYABLE_STATUSES:
            _sleep_or_raise(attempt, f"HTTP {status}")
            attempt += 1
            continue
        parsed = json.loads(resp) if resp else {}
        if not parsed.get("errors"):
            return
        items = parsed.get("items", [])
        failed = [
            (i, item[op])
            for i, item in enumerate(items)
            for op in item
            if item[op].get("error")
        ]
        if failed and all(item.get("status") == 429 for _, item in failed):
            # Partial retry needs the positional alignment to be
            # trustworthy; a response with a different action count is
            # a protocol violation we must not guess around.
            if len(items) != len(lines) // 2:
                raise RuntimeError(
                    f"bulk response has {len(items)} items for "
                    f"{len(lines) // 2} actions; cannot align 429 retry"
                )
            _sleep_or_raise(attempt, "per-item HTTP 429 (bulk queue rejection)")
            lines = [ln for i, _ in failed for ln in lines[2 * i : 2 * i + 2]]
            attempt += 1
            continue
        first = failed[0][1] if failed else None
        raise RuntimeError(f"bulk indexing reported errors: first={first}")


def bulk_index(
    df: DataFrame,
    es_url: str,
    index: str,
    *,
    id_column: str | None = None,
    batch_entries: int = 1000,
    mode: str = "overwrite",
    timeout: float = 30.0,
    max_retries: int = 4,
    retry_backoff_s: float = 0.5,
) -> None:
    """Bulk-index `df` into `index` at `es_url` (scheme-qualified,
    e.g. ``http://localhost:9200``).

    mode="overwrite" is the reference's FULL sync: delete the index
    (404 on first run is fine) and recreate it, then load; "append"
    is the incremental sync — existing documents survive, and rows
    whose `id_column` collides with a stored document REPLACE it
    (the index action is create-or-replace), which is what makes
    incremental replays idempotent.
    """
    if mode not in ("overwrite", "append"):
        raise ValueError(f"unknown es_http mode {mode!r}")
    # Real ES rejects ANY metadata field inside a source document, not
    # just _id. _id has designed handling (popped below, value travels
    # in the action line); every other collision is a config error the
    # DRIVER should refuse up front — failing here beats a per-item
    # bulk error storm on the first chunk.
    meta_clash = sorted(set(df.columns) & _ES_METADATA_FIELDS - {"_id"})
    if meta_clash:
        raise ValueError(
            f"column(s) {meta_clash} collide with Elasticsearch metadata "
            "fields; rename them before sinking"
        )
    if mode == "overwrite":
        _http("DELETE", f"{es_url}/{index}", ignore=(404,), timeout=timeout)
        _http("PUT", f"{es_url}/{index}", body=b"{}", timeout=timeout)

    url, idx, idc = es_url, index, id_column
    n, to = int(batch_entries), float(timeout)
    retries, backoff = int(max_retries), float(retry_backoff_s)

    def send_partition(rows) -> None:
        # Executor-side: chunk rows into NDJSON bulk bodies. Only
        # stdlib + this module's helpers are touched (pickled by
        # reference; workers import the repo package).
        buf: list[str] = []
        pending = 0

        def flush() -> None:
            nonlocal buf, pending
            if not buf:
                return
            _post_bulk(url, buf, to, retries, backoff)
            buf, pending = [], 0

        for row in rows:
            doc = row.asDict(recursive=True)
            action: dict = {"index": {"_index": idx}}
            if idc is not None and doc.get(idc) is not None:
                action["index"]["_id"] = str(doc[idc])
            # `_id` is an ES METADATA field: real ES (>=6.x) rejects a
            # source document containing it ("Field [_id] is a metadata
            # field..."). The id travels in the action line only; a
            # NORMALLY-named id column stays in the source, matching
            # es-hadoop's es.mapping.id behavior.
            doc.pop("_id", None)
            buf.append(json.dumps(action, separators=(",", ":")))
            buf.append(
                json.dumps(
                    doc, default=_jsonable, sort_keys=True, separators=(",", ":")
                )
            )
            pending += 1
            if pending >= n:
                flush()
        flush()

    df.foreachPartition(send_partition)
    # Make the write visible to immediate readers (the connector does
    # the same when es.batch.write.refresh is on, its default). 404 is
    # normal for a first-run append that delivered zero rows: no bulk
    # request ever auto-created the index, and an empty incremental
    # batch must be a no-op, not a crash.
    _http(
        "POST", f"{es_url}/{index}/_refresh", body=b"", timeout=timeout, ignore=(404,)
    )
