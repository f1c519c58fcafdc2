"""Logical plans composing the operators into the reference's query
lifecycles (SURVEY.md section 3): predict, evaluate, and the precompute
(build-index analogue) flow, plus the snapshot/lineage lifecycle runner."""
