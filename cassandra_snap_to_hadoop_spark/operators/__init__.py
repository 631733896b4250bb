"""Engine operators: Cassandra snapshot semantics, dedup, similarity, text."""
