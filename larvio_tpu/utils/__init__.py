"""Cross-cutting utilities: checkpointing, native bindings, profiling."""
