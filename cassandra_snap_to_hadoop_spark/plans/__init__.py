"""Physical-plan inspection helpers (SURVEY §4): the engine's optimizer work
is plan-shape discipline, verified — not hand-scheduling."""
