"""Large-scale training-data operators (beyond the reference's own surface):
text analysis, deduplication, similarity search, window aggregates."""
