"""Structured Streaming layer: kv snapshot sinks, job wiring, stateful
operators, watermark placement rules."""
