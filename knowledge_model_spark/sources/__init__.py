"""Sources & sinks: corpus readers, rate-limited fetch connector,
multimodal binary plumbing."""
