"""Structured Streaming surface (SURVEY.md §2.C). Batch-equivalent
forms register as oracle-checked queries; stream-mode execution is
exercised in tests via readStream + Trigger.AvailableNow."""
