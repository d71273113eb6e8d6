"""Multi-chip scale-out: device mesh construction, sharded rendering, and
gradient all-reduce over ICI (SURVEY.md section 2.4)."""
