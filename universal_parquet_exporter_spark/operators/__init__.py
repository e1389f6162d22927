"""Operators: the reference's relational query surface (SURVEY.md §2B)
re-expressed as Catalyst-native DataFrame programs, plus the web-scale
training-data operators (dedup, similarity search, text analysis,
multimodal plumbing) that a 100 TB pipeline needs."""
