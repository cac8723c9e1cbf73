"""Streaming operators (SURVEY.md §2.5 W1-W6): windowed aggregation
builders shared between batch and streaming frames, and pipeline wiring
(file/Kafka source -> enrich -> multi-sink fan-out)."""
