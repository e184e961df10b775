"""Engine operators: the MapReduce spine, tera pipeline, and
multimodal column plumbing."""
