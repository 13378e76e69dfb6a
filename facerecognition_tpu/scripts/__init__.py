"""Operational scripts (reference scripts/ parity): label-map creation,
checkpoint inspection, training-log visualization/overfit analysis."""
