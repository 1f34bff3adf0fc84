"""Ray Data stages: decode, apply, dedup, text, similarity, multimodal."""
