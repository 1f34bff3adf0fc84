"""Envelope / payload decoders (stateless batch kernels)."""
