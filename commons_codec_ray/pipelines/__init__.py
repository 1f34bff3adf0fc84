"""End-to-end pipelines: CDC epoch loop, replay queries, oracle replay."""
