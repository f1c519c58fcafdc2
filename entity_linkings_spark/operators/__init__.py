"""Dataflow operators (SURVEY.md section 2): mention extraction, normalization,
blocking, pair scoring, prior cascade, top-k, clustering, dedup, similarity
search, text stats, and evaluation."""
