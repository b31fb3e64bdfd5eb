"""Structured Streaming rebuild of the reference's Kafka loop
(SURVEY.md §2.H, §3.1): topic-routed jobs, idempotent keyed state,
completion events, plus event-time window/session extensions."""
