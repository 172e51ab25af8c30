"""Pipeline stages: detect, track, select, evaluate, annotate."""
