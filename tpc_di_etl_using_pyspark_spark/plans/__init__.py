"""Query-plan registry: one (queries, oracles) pair per SURVEY §2 group."""
