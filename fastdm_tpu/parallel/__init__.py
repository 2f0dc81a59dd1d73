"""Device-mesh parallelism (new surface: the reference is single-GPU, SURVEY.md §2.7)."""
