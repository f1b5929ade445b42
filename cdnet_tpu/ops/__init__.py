"""Device-side ops: geometry, morphology, EDT, CC labeling, watershed, DDM, TTA."""
