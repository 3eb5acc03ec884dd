"""Structured Streaming surfaces. The reference is pure event-driven batch
(SURVEY.md §1.3 / §2.11 — no streaming operators exist there); these
pipelines cover the continuous-ingest shape a web-scale deployment needs:
pages arriving as a stream → incremental extraction, and event-stream
windowed aggregation with watermarks."""
