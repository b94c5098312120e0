"""Structured-Streaming surface (SURVEY.md §2.C, e1-e7).

Policy: every streaming operator is a plain DataFrame -> DataFrame
transformation, applied identically to a batch read (registered here,
oracle-checked by the driver) and to a `readStream` source
(smoke-tested via Trigger.AvailableNow in tests/test_streaming.py).
That guarantee — batch plan == stream plan — is what makes the
incremental mode trustworthy: the stream is just the batch query with
state.

Scale posture: all stateful ops are keyed by (window, event_type) or
user_id — state partitions by key across executors; watermarks bound
state size (no watermark -> unbounded state at 100 TB is an outage,
not a slowdown).
"""

from hive_to_es_spark.streaming import ops  # noqa: F401
