"""TPU compute kernels (JAX + Pallas)."""
