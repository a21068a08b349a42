"""ML surface: the reference's heart (SURVEY §2.I) — BPMF/Macau Gibbs
samplers, distributed CG, tensor/collective factorization, eval."""
