"""Device compute ops: dispersion thresholding, masking, connected components."""
