"""transforms stub — the reference imports it but the USSS path never uses it."""
