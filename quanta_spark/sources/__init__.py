"""Source readers: batch + streaming, with lineage columns attached."""
