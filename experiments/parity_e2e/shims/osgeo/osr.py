"""osr stub — imported but unused by the reference USSS path."""
